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

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import blacklist_pred, onion_url_col, path_col

# J5 scale path (SURVEY §2.3): every reference blacklist entry is a
# host-block written as an unanchored regex (".*<host>.*", reference
# blacklist.txt:1-4). Above this pattern count the rlike-OR expression
# tree stops being sensible; host-block patterns are extracted into a
# broadcast DataFrame and applied as one left_anti-shaped join instead.
_HOST_BLOCK_RE = re.compile(r"^\.\*([A-Za-z0-9.\-]+)\.\*$")
_MAX_RLIKE_PATTERNS = 64


def split_blacklist(patterns: list[str]) -> tuple[list[str], list[str]]:
    """(blocked_hosts, residual_regexes): patterns of the reference's
    host-block form become broadcast-join keys; anything else stays a
    regex. Host-block extraction narrows semantics from 'substring
    anywhere in the URL' to 'host equality' — identical for real host
    blocks, which is the reference's only usage."""
    hosts, regexes = [], []
    for p in patterns:
        m = _HOST_BLOCK_RE.match(p)
        if m:
            hosts.append(m.group(1))  # verbatim — regex match is case-sensitive
        else:
            regexes.append(p)
    return hosts, regexes


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
    if len(blacklist_patterns) > _MAX_RLIKE_PATTERNS:
        # J5 scale path: broadcast anti-join on host for host-block
        # patterns; residual true-regex patterns (rare) stay on rlike
        hosts, regexes = split_blacklist(blacklist_patterns)
        blocked = F.broadcast(
            scheduled.sparkSession.createDataFrame(
                [(h,) for h in hosts], "bl_host string"
            ).distinct()
        )
        s = (
            scheduled.join(blocked, scheduled["host"] == blocked["bl_host"], "left")
            .where(F.col("is_seed") | F.col("bl_host").isNull())
            .drop("bl_host")
        )
        s = s.where(F.col("is_seed") | ~blacklist_pred(F.col("url"), regexes))
    else:
        s = scheduled.where(
            F.col("is_seed") | ~blacklist_pred(F.col("url"), blacklist_patterns)
        )
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
