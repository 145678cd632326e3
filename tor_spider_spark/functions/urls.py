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


@pandas_udf(StringType())
def canonicalize_urls(base: pd.Series, href: pd.Series) -> pd.Series:
    """Vectorized (base, href) -> canonical absolute URL or null.

    Delegates per element to the same pure function the simulator uses
    (tor_spider_spark.simulator.canonicalize) so engine and oracle cannot
    disagree; batches arrive via Arrow.
    """
    return pd.Series(
        [_canon_py(b, h) if b is not None else None for b, h in zip(base, href)],
        dtype="object",
    )


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
