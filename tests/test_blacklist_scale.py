"""J5 blacklist scale path: above _MAX_RLIKE_PATTERNS the patterns apply
via chunked trie-shared alternation regexes instead of a flat rlike-OR
expression tree — admitted sets must be identical to the reference's
re.search semantics AT EVERY PATTERN COUNT (checked against a pure-Python
re.search oracle), including subdomain hosts and blocked-host substrings
appearing in the path/query (ADVICE r2 #3: the former broadcast host join
narrowed these to host equality)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tor_spider_spark import schemas
from tor_spider_spark.operators.filters import (
    _MAX_RLIKE_PATTERNS,
    admit,
    scale_blacklist_pred,
    split_blacklist,
)


def test_split_blacklist_classifies_reference_forms():
    hosts, regexes = split_blacklist(
        [
            ".*facebookcorewwwi.onion.*",
            ".*zqktlwiuavvvqqt4ybvgvi7tyo4hjl5xgfuvpdf6otjiycgwqbym2qad.onion.*",
            "^https?://evil",  # true regex → residual
            ".*bad[0-9]+.onion.*",  # char class → residual
        ]
    )
    assert hosts == [
        "facebookcorewwwi.onion",
        "zqktlwiuavvvqqt4ybvgvi7tyo4hjl5xgfuvpdf6otjiycgwqbym2qad.onion",
    ]
    assert regexes == ["^https?://evil", ".*bad[0-9]+.onion.*"]


def _candidates(spark, n=2000):
    base = (
        spark.range(n)
        .withColumn(
            "host",
            F.concat(
                # translate 0/1/8/9 out of the conv digits: every host must
                # pass the onion URL filter ([a-z2-7]) or the oracle would
                # need to model F1 too
                F.translate(
                    F.lower(
                        F.lpad(F.conv(F.pmod("id", F.lit(500)).cast("string"), 10, 32), 16, "a")
                    ),
                    "0189",
                    "qrst",
                ),
                F.lit(".onion"),
            ),
        )
        .withColumn("url", F.concat(F.lit("http://"), F.col("host"), F.lit("/p"), F.col("id")))
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("host_hash", F.xxhash64("host"))
        .withColumn("depth", F.lit(1))
        .withColumn("priority", F.lit(0.5))
        .withColumn("discovered_round", F.lit(0))
        .withColumn("is_seed", F.pmod("id", F.lit(97)) == 0)  # a few seed rows
        .withColumn("rank", F.col("id").cast("int"))
        .withColumn("round", F.lit(0))
    )
    return base.select("round", "rank", *[f.name for f in schemas.FRONTIER.fields])


def test_large_blacklist_anti_join_matches_regex_semantics(spark):
    cand = _candidates(spark).localCheckpoint()
    hosts_in_play = sorted({r["host"] for r in cand.select("host").distinct().collect()})
    # 10k-row blacklist: every other in-play host + thousands of absent ones
    blocked_real = hosts_in_play[::2]
    patterns = [f".*{h}.*" for h in blocked_real]
    patterns += [f".*{('b'*10)}{i:06d}.onion.*" for i in range(10_000 - len(patterns))]
    assert len(patterns) == 10_000 > _MAX_RLIKE_PATTERNS

    # host-in-path rows: the URL's own host is clean (passes F1), but a
    # BLOCKED host string appears in the query — re.search semantics block
    # these; host-equality semantics would admit them
    clean = [h for h in hosts_in_play if h not in set(blocked_real)][:4]
    extra = spark.createDataFrame(
        [
            (f"http://{clean[0]}/x?ref={blocked_real[0]}", clean[0]),
            (f"http://{clean[1]}/see/{blocked_real[1]}/deep", clean[1]),
            (f"http://{clean[2]}/clean", clean[2]),
        ],
        "url string, host string",
    ).select(
        F.lit(0).alias("round"),
        F.lit(99999).alias("rank"),
        "url",
        F.xxhash64("url").alias("url_hash"),
        "host",
        F.xxhash64("host").alias("host_hash"),
        F.lit(1).alias("depth"),
        F.lit(0.5).alias("priority"),
        F.lit(0).alias("discovered_round"),
        F.lit(False).alias("is_seed"),
    )
    cand = cand.unionByName(extra.select(*cand.columns)).localCheckpoint()

    robots = spark.createDataFrame([], schemas.ROBOTS)
    seen = spark.createDataFrame([], schemas.SEEN)
    got = sorted(
        r["url"] for r in admit(cand, robots, seen, patterns, None).select("url").collect()
    )

    # oracle: reference regex semantics in pure Python (seeds exempt)
    pats = [re.compile(p) for p in patterns]
    rows = cand.select("url", "is_seed").collect()
    expect = sorted(
        r["url"] for r in rows if r["is_seed"] or not any(p.search(r["url"]) for p in pats)
    )
    assert got == expect
    assert 0 < len(got) < cand.count()  # the predicate actually dropped rows
    # the host-in-path rows observably split: substring-blocked vs clean
    assert f"http://{clean[2]}/clean" in got
    assert not any(blocked_real[0] in u or blocked_real[1] in u for u in got)


def test_scale_pred_blocks_subdomains_like_regex(spark):
    """Subdomain URLs (host = www.<blocked>) match the reference's
    unanchored regex; the scale predicate must agree (the r2 host-equality
    join did not). Tested at the predicate level because F1 (the onion URL
    filter) would mask the divergence inside admit()."""
    blocked = ["a" * 16 + ".onion", "b" * 16 + ".onion"]
    patterns = [f".*{h}.*" for h in blocked]
    patterns += [f".*{('z'*10)}{i:05d}.onion.*" for i in range(200)]
    urls = [
        ("http://www." + blocked[0] + "/x", True),
        ("http://" + blocked[1] + ".evil.tld/y", True),  # blocked host as a label prefix
        ("http://" + "c" * 16 + ".onion/ok", False),
    ]
    df = spark.createDataFrame([(u,) for u, _ in urls], "url string")
    got = {
        r["url"]: r["m"]
        for r in df.select(
            "url", scale_blacklist_pred(F.col("url"), patterns).alias("m")
        ).collect()
    }
    pats = [re.compile(p) for p in patterns]
    for u, want in urls:
        assert got[u] == want == any(bool(p.search(u)) for p in pats), u


def test_scale_pred_preserves_backreference_semantics(spark):
    """Patterns with backreferences must NOT be folded into the chunked
    alternation (ADVICE r3 #2): `(?:(aa)\\1)|(?:(zz)\\1)` renumbers the
    groups so the second `\\1` points at the FIRST pattern's (unmatched)
    group and that branch silently matches NOTHING. Group-sensitive
    patterns get their own rlike; the whole predicate must equal the
    per-pattern re.search oracle."""
    patterns = [f".*{('z'*10)}{i:05d}.onion.*" for i in range(200)]  # force scale path
    patterns += [r"/(aa)\1", r"(zz)\1"]  # backrefs: /aaaa and zzzz
    urls = [
        "http://" + "a" * 16 + ".onion/zzzz",  # matches (zz)\1 ONLY with correct numbering
        "http://" + "b" * 16 + ".onion/aaaa",  # matches /(aa)\1
        "http://" + "c" * 16 + ".onion/zzaa",  # matches neither (blocked-looking decoy)
        "http://" + "d" * 16 + ".onion/ok",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["m"]
        for r in df.select(
            "url", scale_blacklist_pred(F.col("url"), patterns).alias("m")
        ).collect()
    }
    pats = [re.compile(p) for p in patterns]
    for u in urls:
        assert got[u] == any(bool(p.search(u)) for p in pats), u
    assert got[urls[0]] and got[urls[1]] and not got[urls[2]] and not got[urls[3]]


def test_small_blacklist_still_uses_rlike_path(spark, smoke_fixture):
    # the reference's own 4-pattern shape stays on the codegen rlike path
    # and matches the same Python oracle
    cand = _candidates(spark, 500).localCheckpoint()
    hosts_in_play = sorted({r["host"] for r in cand.select("host").distinct().collect()})
    patterns = [f".*{h}.*" for h in hosts_in_play[:3]]
    robots = spark.createDataFrame([], schemas.ROBOTS)
    seen = spark.createDataFrame([], schemas.SEEN)
    got = sorted(
        r["url"] for r in admit(cand, robots, seen, patterns, None).select("url").collect()
    )
    pats = [re.compile(p) for p in patterns]
    rows = cand.select("url", "is_seed").collect()
    expect = sorted(
        r["url"] for r in rows if r["is_seed"] or not any(p.search(r["url"]) for p in pats)
    )
    assert got == expect
