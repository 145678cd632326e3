"""C8: per-request header assignment (SURVEY §2.7 C8).

The reference attaches colly's ``extensions.RandomUserAgent(c)`` and
``extensions.Referer(c)`` to both collectors (reference
spider/spider.go:126-127, 172-173): every outgoing request gets a
User-Agent drawn from a pool and a Referer naming the linking page.
Headers affect wire bytes only — the reference stores no headers
(reference TODO.md:20 "Store responses headers" unchecked), so this
engine computes them at fetch time and, like the reference, persists
nothing.

DETERMINISM DEVIATION (documented): colly draws the UA with math/rand —
irreproducible across runs. The north rule requires killed-job resume to
reproduce the round bit-for-bit, so the pick is seeded by
``md5(url ':' round)`` instead: stable across resume, uniform across the
pool, different per round (a re-crawled URL rotates its UA like the
reference's random draw would). md5 (not xxhash64) keeps the pick
DuckDB-replayable — the ``request_headers`` driver-contract oracle
replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# compact stand-in for colly's extensions/user_agent.go pool (hundreds of
# real browser strings; content is irrelevant to semantics — only the
# deterministic pick is)
UA_POOL: tuple[str, ...] = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/119.0",
    "Mozilla/5.0 (Windows NT 10.0; rv:109.0) Gecko/20100101 Firefox/115.0",
    "Mozilla/5.0 (X11; Ubuntu; Linux i686; rv:24.0) Gecko/20100101 Firefox/24.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 13_1) Version/16.1 Safari/605.1.15",
    "Mozilla/5.0 (Windows NT 6.1; Win64; x64) AppleWebKit/537.36 Chrome/109.0",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 Chrome/119.0",
)


def ua_index_col(url, round_no: int, pool_size: int = len(UA_POOL)):
    """Deterministic pool index in [0, pool_size): first 15 hex digits of
    md5(url ':' round) mod pool_size — native Catalyst (md5/conv/pmod),
    byte-replayable in DuckDB (see __spark_entry__.oracle_sql)."""
    digest = F.md5(F.concat(url, F.lit(f":{round_no}")))
    return F.pmod(
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("long"), F.lit(pool_size)
    ).cast("int")


def with_request_headers(
    requests: DataFrame,
    round_no: int,
    url_col: str = "url",
    referer_col: str | None = None,
) -> DataFrame:
    """Attach the C8 header columns to a batch of outgoing requests:

    - ``user_agent``: deterministic-seeded pool pick (see module note);
    - ``referer``: the linking page when the caller carries one
      (*referer_col*), else NULL — seeds and frontier-collapsed rows have
      no single linking page, matching colly's Referer extension which
      only fires for link-followed requests.

    Pure Catalyst (md5/conv/pmod/element_at — whole-stage codegen); adds
    no shuffle and, like the reference, nothing here is persisted."""
    pool = F.array(*[F.lit(u) for u in UA_POOL])
    out = requests.withColumn(
        "user_agent", F.element_at(pool, ua_index_col(F.col(url_col), round_no) + 1)
    )
    ref = F.col(referer_col) if referer_col else F.lit(None).cast("string")
    return out.withColumn("referer", ref)
