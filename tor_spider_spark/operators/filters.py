"""Admission filters (SURVEY §2.2 F1-F9), applied in the reference's
request-pipeline order: blacklist → onion URL filter → robots → seen.

colly checks DisallowedURLFilters before URLFilters before the visited
set (reference spider/spider.go:103-153); robots is the north-rule
inversion of ``IgnoreRobotsTxt()`` (spider/spider.go:112, 166). Seeds are
exempt from the URL filter and the visited check (the seed collector has
no filters and ``AllowURLRevisit``, spider/spider.go:162-167).

All predicates are native Catalyst expressions (whole-stage codegen); the
seen check is a left_anti join on url_hash, optionally short-circuited by
the persistent bloom shards (operators/bloom.py) — bloom positives still
go through the exact anti-join, so false positives never drop a URL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import blacklist_pred, onion_url_col, path_col


def admit(
    scheduled: DataFrame,
    robots: DataFrame,
    seen: DataFrame,
    blacklist_patterns: list[str],
    bloom_probe=None,
) -> DataFrame:
    """Frozen step 4: scheduled → admitted. Seed-lineage rows skip the
    blacklist and the onion URL filter (the reference's seed collector has
    neither DisallowedURLFilters nor URLFilters, spider/spider.go:161-167);
    robots (north-rule addition) applies to every row."""
    s = scheduled.where(F.col("is_seed") | ~blacklist_pred(F.col("url"), blacklist_patterns))
    s = s.where(F.col("is_seed") | onion_url_col(F.col("url")))
    s = (
        s.join(F.broadcast(robots.select("host", "disallow_prefixes")), "host", "left")
        .where(
            F.col("disallow_prefixes").isNull()
            | ~F.exists(
                "disallow_prefixes",
                lambda p: path_col(F.col("url")).startswith(p),
            )
        )
        .drop("disallow_prefixes")
    )
    seeds = s.where(F.col("is_seed"))
    nonseeds = s.where(~F.col("is_seed"))
    # anti-join on (url_hash, host_hash): url determines host, so adding
    # host_hash is semantics-preserving and lets bucket(host_hash)-aligned
    # sides join without an exchange (storage-partitioned join at scale)
    seen_keys = seen.select("url_hash", "host_hash")
    if bloom_probe is not None:
        # bloom short-circuit: definite-negatives skip the exact check
        # entirely, and the residual verification of the maybe-set runs
        # SHUFFLE-FREE: the maybe keys (bounded by round_limit — a round's
        # scheduled batch, thousands not millions) broadcast into ONE
        # streaming semi-scan of `seen`, and the surviving dup keys
        # broadcast back into an anti-join. Neither `seen` nor the
        # candidates are ever exchanged — the exact path shuffles both.
        probed = bloom_probe(nonseeds)
        maybe_keys = probed.where(F.col("_bloom_maybe")).select("url_hash", "host_hash")
        dup_keys = seen_keys.join(
            F.broadcast(maybe_keys), ["url_hash", "host_hash"], "left_semi"
        )
        # anti-join the WHOLE probed set (not a maybe/fresh union — that
        # would evaluate the probe once per branch): fresh rows are
        # bloom-negative ⇒ not in seen ⇒ never in dup_keys, so one
        # broadcast anti-join handles both cases
        deduped = probed.drop("_bloom_maybe").join(
            F.broadcast(dup_keys), ["url_hash", "host_hash"], "left_anti"
        )
    else:
        deduped = nonseeds.join(seen_keys, ["url_hash", "host_hash"], "left_anti")
    return seeds.unionByName(deduped)
