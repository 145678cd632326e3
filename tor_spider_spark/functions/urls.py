"""URL column functions: canonicalization (vectorized pandas UDF) and the
native-Catalyst URL predicates/derivations.

Reference parity:
- ``canonicalize_urls`` ≙ colly ``Request.AbsoluteURL`` (reference
  spider/spider.go:299, 349): resolve href against the page URL, return
  null for fragment-only/empty, strip fragments.  This is the ONE string
  function that genuinely needs Python (RFC 3986 reference resolution);
  it is an Arrow-batched scalar pandas UDF — no per-row Python rows cross
  the JVM boundary (BASELINE.json input_hint).
- ``onion_url_col`` ≙ the four URLFilters regexes (spider/spider.go:116-121),
  one combined `rlike` evaluated by whole-stage codegen.
- ``host_col`` ≙ tld.Parse host extraction (spider/spider.go:411-414),
  native `parse_url`.
- ``with_url_identity`` ≙ the 64-bit URL hashing behind the visited set
  (spider/spider.go:153) via native `xxhash64` (bit-matched by the
  simulator's pure-Python XXH64, functions/hashing.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..config import ONION_URL_PATTERN
from ..simulator import canonicalize as _canon_py


# Fast-path shape: an already-absolute lowercase-scheme http(s) href with
# no fragment. For these, RFC 3986 resolution is the identity (urljoin
# returns an absolute href unchanged), so canonicalization reduces to
# vectorizable string surgery: lowercase netloc, default path to "/",
# carry the query. Everything else falls back to the simulator's pure
# function per element (tests/test_urls.py proves the two paths agree by
# construction AND by hypothesis).
# One anchored regex decides the fast path AND splits it: absolute
# lowercase-scheme http(s), NON-EMPTY netloc (an empty one inherits the
# base netloc under RFC resolution — slow path), no '#' anywhere (the
# groups exclude it and the anchors leave it nowhere to hide). A separate
# strip-equality pass routes leading/trailing-whitespace hrefs to the slow
# path (which strips before resolving), and a control-char pass routes
# hrefs containing interior \t\r\n there too: CPython's urlsplit/urljoin
# REMOVE those three bytes anywhere in the URL (WHATWG behavior,
# urllib.parse._UNSAFE_URL_BYTES_TO_REMOVE), which the regex groups would
# otherwise admit verbatim — the fast path must never disagree with the
# pure function on them (ADVICE r2 #1).
_FAST_RE = r"^(https?)://([^/?#\s]+)([^?#]*)(?:\?([^#]*))?$"
_CTRL_RE = r"[\t\r\n]"


@pandas_udf(StringType())
def canonicalize_urls(base: pd.Series, href: pd.Series) -> pd.Series:
    """Vectorized (base, href) -> canonical absolute URL or null.

    Absolute fragment-free http(s) hrefs (the majority of crawl links)
    take a pure-pandas vectorized path — ONE regex extract over the batch
    — because RFC 3986 resolution is the identity for them (urljoin does
    not even normalize dot segments; verified against CPython). The rest
    delegate per element to the same pure function the simulator uses
    (tor_spider_spark.simulator.canonicalize) so engine and oracle cannot
    disagree. Batches arrive via Arrow.
    """
    h = href.astype("object")
    parts = h.str.extract(_FAST_RE)
    fast = (
        base.notna()
        & parts[0].notna()
        & (h.str.strip() == h)
        & ~h.str.contains(_CTRL_RE, regex=True, na=True)
    )
    out = pd.Series([None] * len(h), dtype="object")
    if fast.any():
        p = parts[fast]
        path = p[2].where(p[2] != "", "/")
        rebuilt = p[0] + "://" + p[1].str.lower() + path
        # an empty query ("...?") is dropped, matching urlsplit falsiness
        has_q = p[3].notna() & (p[3] != "")
        rebuilt = rebuilt.where(~has_q, rebuilt + "?" + p[3].fillna(""))
        out[fast] = rebuilt
    slow = ~fast
    if slow.any():
        out[slow] = [
            _canon_py(b, v) if b is not None else None
            for b, v in zip(base[slow], h[slow])
        ]
    return out


def onion_url_col(url: Column) -> Column:
    """True iff the URL passes the reference's onion URL filters."""
    return url.rlike(ONION_URL_PATTERN)


def host_col(url: Column) -> Column:
    return F.lower(F.parse_url(url, F.lit("HOST")))


def path_col(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/"))


def with_url_identity(df: DataFrame, url: str = "url") -> DataFrame:
    """Add url_hash / host / host_hash columns (all native expressions)."""
    return (
        df.withColumn("url_hash", F.xxhash64(F.col(url)))
        .withColumn("host", host_col(F.col(url)))
        .withColumn("host_hash", F.xxhash64(F.col("host")))
    )


def blacklist_pred(url: Column, patterns: list[str]) -> Column:
    """True iff the URL matches ANY blacklist regex (unanchored search, as
    Go regexp.MatchString / colly DisallowedURLFilters — spider.go:103-115).
    rlike is already a substring search; patterns come anchored or not."""
    if not patterns:
        return F.lit(False)
    pred = url.rlike(patterns[0])
    for p in patterns[1:]:
        pred = pred | url.rlike(p)
    return pred
