"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship crawl (3 rounds over a deterministic synthetic
onion web whose captions are drawn from sf0.001 documents — no external
data) and returns the pages table.  ``queries``/``oracle_sql`` expose the
engine's operator surface (SURVEY.md §2 + the training-data pipeline ops)
over the driver's parquet fixtures, each with a DuckDB-runnable ANSI-SQL
oracle where SQL can express it.

Float discipline: every float aggregate is rounded identically on both
sides (sums→2dp, avgs/ratios→4-6dp) so value-hashes cannot diverge on
summation order.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _td(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read + spread to core parallelism (r6, guide §2.5): the documents/
    embeddings fixtures are ONE small parquet file (1-2 scan partitions,
    unsplittable below the row group), so every regex/UDF/explode-heavy
    query over them otherwise runs its whole map side on 1-2 cores —
    measured 5.1 s for text_quality at sf1.0 on local[32].  No-op when
    the input already has enough partitions (the 100 TB case)."""
    from tor_spider_spark.partitioning import spread_input

    return spread_input(_t(spark, sf_dir, name))


def _materialize_and_clean(spark: SparkSession, df: DataFrame, tmp_root: str) -> DataFrame:
    """Collect a temp-table-backed result and delete its backing files —
    the claim/upsert contract queries snapshot a table copy into a temp
    dir, and returning a lazy reader over it would leak one orders-sized
    copy per harness invocation (code-review r4)."""
    import shutil

    rows = df.collect()  # small at oracle scale; the driver collects anyway
    schema = df.schema
    shutil.rmtree(tmp_root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# flagship: the crawl itself
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """3 crawl rounds on the smoke-scale synthetic onion web; captions are
    sourced from /root/testdata/sf0.001 documents (driver contract: load
    sf0.001 parquet). Returns the committed pages table (payload bytes
    dropped for a compact, stable schema)."""
    from tor_spider_spark.config import CrawlConfig
    from tor_spider_spark.fixtures.corpus import SMOKE, generate_fixture
    from tor_spider_spark.plans.driver import CrawlDriver, fixture_to_dfs

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    words = [
        r[0]
        for r in docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
        .where(F.length("w") > 0)
        .distinct()
        .orderBy("w")
        .limit(64)
        .collect()
    ]
    fx = generate_fixture(SMOKE, caption_words=words)
    dfs = fixture_to_dfs(spark, fx)
    run_dir = tempfile.mkdtemp(prefix="tor-spider-entry-")
    drv = CrawlDriver(
        spark,
        run_dir,
        dfs["corpus"],
        dfs["seeds"],
        dfs["robots"],
        fx.blacklist,
        CrawlConfig(max_rounds=3),
    )
    drv.run()
    return drv.read("pages").select(
        "url", "url_hash", "host", "status", "round", "image_id", "w", "h", "fmt", "caption", "phash"
    )


# ---------------------------------------------------------------------------
# operator queries (SURVEY §2 ids in comments) + training-data pipeline ops
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tor_spider_spark.functions.text import (
        lang_id_col,
        n_tokens_col,
        punct_ratio_col,
        quality_ok_col,
        stopword_ratio_col,
        top_bigram_stats,
        type_token_ratio_col,
        winnow_fingerprints,
    )
    from tor_spider_spark.operators.dedup import (
        exact_dedup_groups,
        incremental_dedup,
        minhash_lsh_dedup_pairs,
        ngram_jaccard_pairs,
        simhash_dup_pairs,
    )
    from tor_spider_spark.operators.similarity import (
        cosine_topk,
        embedding_dup_pairs,
        ivf_ann_topk,
        lsh_ann_topk,
    )

    def crawl_pages_3rounds(spark, sf):
        """FLAGSHIP oracle row: 3 full engine crawl rounds on the
        deterministic SMOKE fixture (ignores sf — the fixture is the
        input), compared against the pure-Python simulator's pages
        exported to a committed golden parquet
        (scripts/make_golden.py)."""
        from tor_spider_spark.config import CrawlConfig
        from tor_spider_spark.fixtures.corpus import SMOKE, generate_fixture
        from tor_spider_spark.plans.driver import CrawlDriver, fixture_to_dfs

        fx = generate_fixture(SMOKE)
        dfs = fixture_to_dfs(spark, fx)
        run_dir = tempfile.mkdtemp(prefix="tor-spider-flagship-")
        drv = CrawlDriver(
            spark,
            run_dir,
            dfs["corpus"],
            dfs["seeds"],
            dfs["robots"],
            fx.blacklist,
            CrawlConfig(max_rounds=3),
        )
        drv.run()
        return drv.read("pages").select(
            "url",
            F.col("round").cast("int").alias("round"),
            "image_id",
            "caption",
            "phash",
            F.col("status").cast("int").alias("status"),
        )

    def q1_pricing_summary(spark, sf):  # A5/W-agg flagship relational
        return (
            _t(spark, sf, "lineitem")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                    "sum_disc_price"
                ),
                F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                F.count("*").alias("count_order"),
            )
        )

    def topk_global(spark, sf):  # W2: global top-k without total sort
        return (
            _t(spark, sf, "orders")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
            .limit(100)
            .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        )

    def window_rank_topk(spark, sf):  # W1: per-key politeness-rank shape
        from pyspark.sql import Window

        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
        )
        return (
            _t(spark, sf, "orders")
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 3)
            .select("o_custkey", "o_orderkey", F.col("rnk").cast("long").alias("rnk"))
        )

    def anti_join(spark, sf):  # J1/J2: seen/claim anti-join shape
        o = _t(spark, sf, "orders")
        return (
            _t(spark, sf, "customer")
            .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .select("c_custkey", "c_name")
        )

    def semi_join(spark, sf):  # bloom-verified membership shape
        o = _t(spark, sf, "orders")
        return (
            _t(spark, sf, "customer")
            .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
            .select("c_custkey")
        )

    def broadcast_join(spark, sf):  # J4: robots-style broadcast dim join
        c = _t(spark, sf, "customer")
        n = _t(spark, sf, "nation")
        r = _t(spark, sf, "region")
        return (
            c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .agg(F.count("*").alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
        )

    def skew_join(spark, sf):  # J3: fetch equi-join shape (AQE skew handled)
        li = _t(spark, sf, "lineitem")
        o = _t(spark, sf, "orders")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_items"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                    "revenue"
                ),
            )
        )

    def union_distinct(spark, sf):  # U1+U2: enqueue union + intra-round dedup
        a = _t(spark, sf, "lineitem").select(F.col("l_partkey").alias("key"))
        b = _t(spark, sf, "part").select(F.col("p_partkey").alias("key"))
        return a.unionByName(b).distinct()

    def groupby_count(spark, sf):  # A5: per-host group count shape
        return (
            _t(spark, sf, "lineitem")
            .groupBy("l_suppkey")
            .agg(
                F.count("*").alias("n_items"),
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.min("l_orderkey").alias("min_orderkey"),
            )
        )

    def distinct_count(spark, sf):  # A1/A6 exact cardinality
        return (
            _t(spark, sf, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("n_parts"))
        )

    def filter_rlike(spark, sf):  # F1/F2: regex admission filters
        return (
            _td(spark, sf, "documents")
            .where(F.col("text").rlike("spark.*join|join.*spark"))
            .select("doc_id", "lang")
        )

    def explode_array(spark, sf):  # C2: out_links explode shape
        return (
            _td(spark, sf, "embeddings")
            .select("label", F.explode("embedding").alias("v"))
            .groupBy("label")
            .agg(F.count("*").alias("n_values"), F.round(F.avg("v"), 4).alias("avg_v"))
        )

    def json_extract(spark, sf):  # scalar parse (C9 analog)
        return (
            _t(spark, sf, "events")
            .withColumn("k", F.get_json_object("props", "$.k").cast("int"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"), F.round(F.avg("k"), 4).alias("avg_k"))
        )

    def tumbling_window(spark, sf):  # event-time windowed agg (streaming analog)
        e = _t(spark, sf, "events")
        return (
            e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
                "event_type",
                "n",
                "sum_value",
            )
        )

    def stream_windowed_counts(spark, sf):
        # REAL Structured Streaming (file source → watermark → windowed
        # agg → availableNow drain); exact batch oracle by construction
        from tor_spider_spark.streaming.windows import stream_tumbling_counts

        return stream_tumbling_counts(spark, os.path.join(sf, "events.parquet"))

    def stream_update_counts(spark, sf):
        # the PRODUCTION streaming sink (VERDICT r2 #8): update mode +
        # foreachBatch upsert into a keyed snapshot table; single-drop
        # drain here ≡ the batch aggregation (multi-trigger incremental
        # equivalence proven in tests/test_streaming_update.py)
        from tor_spider_spark.streaming.windows import stream_update_counts as _suc

        return _suc(spark, os.path.join(sf, "events.parquet"))

    def stream_update_counts_2drop(spark, sf):
        # MULTI-TRIGGER incremental convergence (VERDICT r4 next #7): the
        # events table split at the midpoint event-time into two source
        # files, drained in TWO update-mode triggers through one
        # checkpoint (maxFilesPerTrigger=1 under availableNow); trigger 2
        # upserts only the windows it touches, and the sink must still
        # equal the batch aggregation — the oracle pins the incremental
        # path, not just the one-shot drain
        from tor_spider_spark.streaming.windows import (
            stream_update_counts_two_trigger,
        )

        return stream_update_counts_two_trigger(
            spark, os.path.join(sf, "events.parquet")
        )

    def sessionize(spark, sf):  # session windows (gap > 30 min) — the
        # event-time stateful-streaming analog, batch-expressed
        from pyspark.sql import Window

        e = _t(spark, sf, "events")
        w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
        flag = F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > 1800),
            1,
        ).otherwise(0)
        sess = e.withColumn("session_id", F.sum(flag).over(w).cast("long"))
        return sess.groupBy("user_id", "session_id").agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )

    def rollup_agg(spark, sf):  # hierarchical agg (region -> nation) —
        # grouping-set shape over the broadcast-dim join
        c = _t(spark, sf, "customer")
        n = _t(spark, sf, "nation")
        r = _t(spark, sf, "region")
        return (
            c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .rollup("r_name", "n_name")
            .agg(F.count("*").alias("n_customers"), F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
            .select(
                F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
                F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
                "n_customers",
                "sum_bal",
            )
        )

    def hash64(spark, sf):  # C5: url_hash (no SQL oracle — Spark-specific hash)
        return _td(spark, sf, "documents").select("doc_id", F.xxhash64("text").alias("h"))

    def hash64_md5(spark, sf):  # C5 oracle-able variant (VERDICT r2 #7):
        # the md5-derived 60-bit hash is reproducible in DuckDB, like the
        # dedup_simhash token hash; production stays xxhash64 (hash64)
        from tor_spider_spark.operators.dedup import md5_60bit_hash

        return _td(spark, sf, "documents").select(
            "doc_id", md5_60bit_hash(F.col("text")).alias("h")
        )

    def request_headers(spark, sf):  # C8 (r4): colly RandomUserAgent/Referer
        # re-imagined as a deterministic-seeded header pick (md5(url:round)
        # mod pool — resume-stable; deviation documented in
        # functions/headers.py); referer NULL for non-link-followed rows
        from tor_spider_spark.functions.headers import with_request_headers

        reqs = _t(spark, sf, "documents").select(
            "doc_id",
            F.concat(
                F.lit("http://"), F.col("doc_id").cast("string"), F.lit(".onion/p")
            ).alias("url"),
        )
        return with_request_headers(reqs, 3)

    def extract_links(spark, sf):  # C2 raw-HTML variant (SURVEY §2.9 #3):
        # real html.parser tokenization over a deterministic HTML column
        # built from documents (entity &amp; included — the oracle must
        # unescape, proving this is a parse, not a regex scrape)
        from tor_spider_spark.functions.html import extract_links as _xl

        d = _td(spark, sf, "documents")
        html = F.concat(
            F.lit('<html><body><a href="/doc/'),
            F.col("doc_id").cast("string"),
            F.lit('">self</a><p>no links here</p><a target="_blank" href="http://ex.com/'),
            F.col("lang"),
            F.lit('?a=1&amp;b=2">out</a><a name="anchor-only"></a></body></html>'),
        )
        return d.select("doc_id", F.explode(_xl(html)).alias("href"))

    def approx_distinct(spark, sf):  # A6 (no oracle: approximate by design)
        return (
            _t(spark, sf, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"))
        )

    # ---- training-data pipeline ops --------------------------------------
    def dedup_exact(spark, sf):
        return exact_dedup_groups(_t(spark, sf, "documents").select("doc_id", "text"))

    def dedup_incremental(spark, sf):
        # cross-snapshot dedup: the per-ingest increment case (batch =
        # doc_id%5==0 as the deterministic "new arrivals", corpus = the
        # rest); only the batch is hashed+grouped, corpus side anti-joined
        d = _t(spark, sf, "documents").select("doc_id", "text")
        return incremental_dedup(
            d.where(F.col("doc_id") % 5 == 0), d.where(F.col("doc_id") % 5 != 0)
        )

    def dedup_ngram_jaccard(spark, sf):
        return ngram_jaccard_pairs(_t(spark, sf, "documents").select("doc_id", "text"), 0.8)

    def dedup_minhash_lsh(spark, sf):
        return minhash_lsh_dedup_pairs(_t(spark, sf, "documents").select("doc_id", "text"), 0.8)

    def dedup_clusters(spark, sf):
        # near-dup pairs → connected components → (doc_id, cluster-keeper):
        # the "keep one document per near-dup cluster" pipeline step,
        # distributed min-label propagation (operators/dedup.py)
        from tor_spider_spark.operators.dedup import minhash_lsh_dedup_clusters

        return minhash_lsh_dedup_clusters(
            _t(spark, sf, "documents").select("doc_id", "text"), 0.8
        )

    def dedup_simhash(spark, sf):
        # oracle-able variant: the md5-derived 60-bit token hash is
        # reproducible in DuckDB SQL (production default stays xxhash64;
        # same operator, different token_hash knob)
        from tor_spider_spark.operators.dedup import md5_60bit_hash

        return simhash_dup_pairs(
            _t(spark, sf, "documents").select("doc_id", "text"), 3, token_hash=md5_60bit_hash
        ).select("i", "j", F.col("hamming").cast("int").alias("hamming"))

    def dedup_phash_hamming(spark, sf):
        """IMAGE near-dup pairs: perceptual-hash hamming distance ≤ 6 via
        multi-index pigeonhole banding (7 bands over the int64 phash —
        operators/dedup.py:hamming_near_dup_pairs), verified with native
        bit_count(xor). Input is the committed deterministic phash corpus
        (scripts/make_golden.py — ignores sf); the DuckDB oracle computes
        the same pair set independently via an exact cross join."""
        from tor_spider_spark.operators.dedup import phash_near_dup_pairs

        imgs = spark.read.parquet(_GOLDEN_PHASH)
        return phash_near_dup_pairs(imgs, 6).select(
            "i", "j", F.col("hamming").cast("int").alias("hamming")
        )

    def dedup_phash_clusters(spark, sf):
        """Image near-dup clusters: banded phash pairs → pointer-jumping
        connected components (string node ids — exercises the r5
        type-generic convergence check). Oracle: recursive-CTE closure
        over the exact cross-join pair set."""
        from tor_spider_spark.operators.dedup import phash_near_dup_clusters

        return phash_near_dup_clusters(spark.read.parquet(_GOLDEN_PHASH), 6)

    def dedup_embedding_cosine(spark, sf):
        # blocked BLAS matmul via mapInPandas (operators/similarity.py) —
        # the Catalyst per-pair dot product is ~50x slower at sf0.1
        return embedding_dup_pairs(_t(spark, sf, "embeddings"), 0.4)

    def dedup_embedding_clusters(spark, sf):
        # vector near-dup pairs → connected components: "keep one item per
        # embedding-duplicate cluster" — composes the blocked-BLAS pair
        # stage with the pointer-jumping component pass
        from tor_spider_spark.operators.dedup import connected_components

        pairs = embedding_dup_pairs(_t(spark, sf, "embeddings"), 0.4)
        return connected_components(pairs).select(
            F.col("doc_id").alias("vec_id"), "cluster"
        )

    def decontaminate_bench(spark, sf):
        # benchmark decontamination (operators/dedup.decontaminate): the
        # "benchmark" split is derived deterministically from the corpus
        # (doc_id % 97 == 0 plays the eval suite), the rest is the corpus
        # to flag — no external data, exact DuckDB replay below
        from tor_spider_spark.operators.dedup import decontaminate

        d = _t(spark, sf, "documents").select("doc_id", "text")
        bench = d.where(F.col("doc_id") % 97 == 0)
        corpus = d.where(F.col("doc_id") % 97 != 0)
        return decontaminate(corpus, bench, threshold=0.2)

    def split_assign_holdout(spark, sf):
        # deterministic train/val/test holdout (operators/sampling.py):
        # weights are exact binary fractions so the cumulative thresholds
        # are bit-identical literals on both engines
        from tor_spider_spark.operators.sampling import split_assign

        d = _t(spark, sf, "documents").select("doc_id")
        return split_assign(
            d, "doc_id", {"train": 0.875, "val": 0.0625, "test": 0.0625}
        ).select("doc_id", "split")

    def sample_frac_125(spark, sf):
        from tor_spider_spark.operators.sampling import sample_frac

        return sample_frac(
            _t(spark, sf, "documents").select("doc_id"), "doc_id", 0.125
        )

    def stratified_cap_lang(spark, sf):
        # quota sampling: at most 50 docs per language, picked in
        # deterministic hash order (the "max N per domain" mixing rule)
        from tor_spider_spark.operators.sampling import stratified_cap

        d = _t(spark, sf, "documents").select("doc_id", "lang")
        return stratified_cap(d, ["lang"], "doc_id", 50)

    def ann_cosine_topk(spark, sf):
        e = _t(spark, sf, "embeddings")
        return cosine_topk(e, e.where(F.col("vec_id") < 10), k=5)

    def ann_lsh(spark, sf):  # approximate by design — no oracle; recall tested
        e = _t(spark, sf, "embeddings")
        return lsh_ann_topk(e, e.where(F.col("vec_id") < 10), k=5, dim=64)

    def ann_ivf(spark, sf):  # IVF scale path (KMeans coarse quantizer) —
        # approximate by design, no oracle; recall vs brute force tested
        e = _t(spark, sf, "embeddings")
        return ivf_ann_topk(e, e.where(F.col("vec_id") < 10), k=5)

    def ann_ivf_full(spark, sf):
        # n_probe == n_cells probes every inverted list ⇒ the IVF machinery
        # (normalize → quantize → probe → exact re-rank) must equal brute
        # force EXACTLY — which gives the IVF path a real SQL oracle (the
        # approximate default stays recall-tested)
        e = _t(spark, sf, "embeddings")
        return ivf_ann_topk(e, e.where(F.col("vec_id") < 10), k=5, n_cells=16, n_probe=16)

    def text_quality(spark, sf):
        d = _td(spark, sf, "documents")
        return d.select(
            "doc_id",
            n_tokens_col(F.col("text")).cast("long").alias("n_tokens"),
            F.round(punct_ratio_col(F.col("text")), 6).alias("punct_ratio"),
            F.round(stopword_ratio_col(F.col("text")), 6).alias("stopword_ratio"),
            quality_ok_col(F.col("text")).alias("quality_ok"),
        )

    def token_count(spark, sf):
        d = _td(spark, sf, "documents")
        return (
            d.select("lang", n_tokens_col(F.col("text")).alias("nt"))
            .groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("nt").cast("long").alias("total_tokens"),
                F.round(F.avg("nt"), 4).alias("avg_tokens"),
            )
        )

    def repetition_top_bigram(spark, sf):
        # Gopher-style repetition signal: chars covered by the most
        # frequent word 2-gram; one (doc_id, bigram) shuffle, no UDF
        d = _t(spark, sf, "documents")
        return top_bigram_stats(d.select("doc_id", "text"))

    def type_token_ratio(spark, sf):
        # lexical diversity (distinct/total tokens) — pure Catalyst
        d = _td(spark, sf, "documents")
        return d.select(
            "doc_id",
            F.round(type_token_ratio_col(F.col("text")), 6).alias("type_token_ratio"),
        )

    def token_quantiles(spark, sf):
        # exact per-language token-count quantiles (linear interpolation —
        # Spark `percentile` ≡ DuckDB `quantile_cont`); the 100 TB path is
        # `percentile_approx` (sketch-mergeable, no full sort) — this exact
        # variant is its oracle-able twin, same pattern as approx_distinct/
        # distinct_count
        d = _td(spark, sf, "documents")
        nt = d.select("lang", n_tokens_col(F.col("text")).alias("nt"))
        return nt.groupBy("lang").agg(
            F.round(F.percentile("nt", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("nt", F.lit(0.9)), 6).alias("p90"),
            F.round(F.percentile("nt", F.lit(0.99)), 6).alias("p99"),
        )

    def bpe_token_count(spark, sf):
        # BPE-style pre-tokenization count (GPT-2 pattern family, rewritten
        # without lookahead so Java regex and DuckDB RE2 agree) — the
        # "token counting" a training-data pipeline budgets by; native
        # regexp_extract_all, no UDF
        d = _td(spark, sf, "documents")
        return d.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0)))
            .cast("long")
            .alias("n_bpe_tokens"),
        )

    def training_keeplist(spark, sf):
        # the end-to-end pipeline step a training run consumes: exact-dedup
        # keepers ∘ quality gate → the doc ids that survive — proves the
        # ops COMPOSE (semi-join on the dedup keeper set, then the pure-
        # Catalyst quality predicate)
        d = _t(spark, sf, "documents")
        keepers = exact_dedup_groups(d.select("doc_id", "text")).select(
            F.col("keeper_doc_id").alias("doc_id")
        )
        return (
            d.join(keepers, "doc_id", "left_semi")
            .where(quality_ok_col(F.col("text")))
            .select("doc_id", "lang")
        )

    def lang_id(spark, sf):  # marker-count heuristic; oracle below replays it in SQL
        d = _td(spark, sf, "documents")
        return d.select("doc_id", lang_id_col(F.col("text")).alias("lang_guess"))

    def doc_fingerprint(spark, sf):  # winnowing — no SQL oracle; pytest-checked
        d = _td(spark, sf, "documents")
        return d.select(
            "doc_id",
            F.size(winnow_fingerprints(F.col("text"))).alias("n_fingerprints"),
            F.array_min(winnow_fingerprints(F.col("text"))).alias("min_fp"),
        )

    def doc_fingerprint_md5(spark, sf):
        # oracle-able winnowing (md5-60bit gram hash — exact DuckDB window
        # replay); production fingerprinting stays on the polynomial hash
        from tor_spider_spark.functions.text import winnow_fingerprints_md5

        d = _td(spark, sf, "documents")
        return d.select(
            "doc_id", F.explode(winnow_fingerprints_md5(F.col("text"))).alias("fp")
        )

    def claim_merge_delta(spark, sf):
        """S6 through the REAL storage machinery (r4 delta claim): orders
        snapshotted into a SnapshotTable (host-range layout, chunked
        files), then one claim_merge deletes the keys ≡0 mod 97 and
        appends customer-derived rows — the oracle replays it as
        anti-filter ∪ union. Exercises footer pruning, carried-file
        manifests, and the delete anti-join end to end."""
        from tor_spider_spark.sources.tables import SnapshotTable

        base = _t(spark, sf, "orders").select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
        )
        root = tempfile.mkdtemp(prefix="claim-oracle-")
        t = SnapshotTable(
            root, "orders_claim", base.schema, sort_col="o_orderkey",
            max_records_per_file=2000, range_partition=True,
        )
        v1 = t.overwrite(base, n_buckets=8)
        claimed = base.where(F.col("o_orderkey") % 97 == 0).select("o_orderkey")
        adds = (
            _t(spark, sf, "customer")
            .where(F.col("c_custkey") % 50 == 0)
            .select(
                (-F.col("c_custkey")).alias("o_orderkey"),
                F.col("c_custkey").alias("o_custkey"),
                F.round("c_acctbal", 2).alias("o_totalprice"),
            )
        )
        v2 = t.claim_merge(
            spark, claimed, adds, key_col="o_orderkey", parent=v1, n_buckets=8
        )
        return _materialize_and_clean(spark, t.read(spark, v2), root)

    def upsert_keys_delta(spark, sf):
        """Keyed delta upsert through the REAL storage machinery (r4,
        host_state / streaming-sink shape): keys ≡0 mod 101 get their
        price zeroed, five new negative keys insert, everything else is
        carried by file path — oracle replays it as CASE + union."""
        from tor_spider_spark.sources.tables import SnapshotTable

        base = _t(spark, sf, "orders").select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
        )
        root = tempfile.mkdtemp(prefix="upsert-oracle-")
        t = SnapshotTable(
            root, "orders_upsert", base.schema, sort_col="o_orderkey",
            max_records_per_file=2000, range_partition=True,
        )
        v1 = t.overwrite(base, n_buckets=8)
        delta = base.where(F.col("o_orderkey") % 101 == 0).withColumn(
            "o_totalprice", F.lit(0.0)
        ).unionByName(
            spark.range(1, 6).select(
                (-F.col("id")).alias("o_orderkey"),
                F.lit(0).cast("long").alias("o_custkey"),
                F.lit(1.5).alias("o_totalprice"),
            )
        )
        v2 = t.upsert_keys(
            spark, delta, key_cols=("o_orderkey",), parent=v1, n_buckets=8
        )
        return _materialize_and_clean(spark, t.read(spark, v2), root)

    def host_pagerank(spark, sf):
        """Crawl-priority PageRank (operators/graph.py) over a
        deterministic ~100-node graph derived from orders: edge
        (o_custkey mod 100) -> (o_orderkey mod 100).  Integer fixed-point
        arithmetic makes the 3-iteration recurrence bit-exact against the
        unrolled-CTE DuckDB replay at any parallelism."""
        from tor_spider_spark.operators.graph import pagerank_fixed_point

        edges = (
            _t(spark, sf, "orders")
            .select(
                (F.col("o_custkey") % 100).alias("src"),
                (F.col("o_orderkey") % 100).alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        return pagerank_fixed_point(edges, iterations=3)

    return {
        "crawl_pages_3rounds": crawl_pages_3rounds,
        "claim_merge_delta": claim_merge_delta,
        "upsert_keys_delta": upsert_keys_delta,
        "q1_pricing_summary": q1_pricing_summary,
        "topk_global": topk_global,
        "window_rank_topk": window_rank_topk,
        "anti_join": anti_join,
        "semi_join": semi_join,
        "broadcast_join": broadcast_join,
        "skew_join": skew_join,
        "union_distinct": union_distinct,
        "groupby_count": groupby_count,
        "distinct_count": distinct_count,
        "filter_rlike": filter_rlike,
        "explode_array": explode_array,
        "json_extract": json_extract,
        "tumbling_window": tumbling_window,
        "stream_windowed_counts": stream_windowed_counts,
        "stream_update_counts": stream_update_counts,
        "stream_update_counts_2drop": stream_update_counts_2drop,
        "sessionize": sessionize,
        "rollup_agg": rollup_agg,
        "hash64": hash64,
        "hash64_md5": hash64_md5,
        "request_headers": request_headers,
        "extract_links": extract_links,
        "approx_distinct": approx_distinct,
        "dedup_exact": dedup_exact,
        "dedup_incremental": dedup_incremental,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_clusters": dedup_clusters,
        "dedup_simhash": dedup_simhash,
        "dedup_phash_hamming": dedup_phash_hamming,
        "dedup_phash_clusters": dedup_phash_clusters,
        "dedup_embedding_cosine": dedup_embedding_cosine,
        "dedup_embedding_clusters": dedup_embedding_clusters,
        "decontaminate_bench": decontaminate_bench,
        "split_assign_holdout": split_assign_holdout,
        "sample_frac_125": sample_frac_125,
        "stratified_cap_lang": stratified_cap_lang,
        "repetition_top_bigram": repetition_top_bigram,
        "type_token_ratio": type_token_ratio,
        "token_quantiles": token_quantiles,
        "bpe_token_count": bpe_token_count,
        "ann_cosine_topk": ann_cosine_topk,
        "ann_lsh": ann_lsh,
        "ann_ivf": ann_ivf,
        "ann_ivf_full": ann_ivf_full,
        "text_quality": text_quality,
        "token_count": token_count,
        "training_keeplist": training_keeplist,
        "lang_id": lang_id,
        "doc_fingerprint": doc_fingerprint,
        "doc_fingerprint_md5": doc_fingerprint_md5,
        "host_pagerank": host_pagerank,
    }


# C8 oracle: replay the deterministic UA pick byte-for-byte in DuckDB —
# the pool VALUES are generated from the SAME tuple the engine uses, so
# the two can never drift
def _request_headers_sql() -> str:
    from tor_spider_spark.functions.headers import UA_POOL

    values = ", ".join(f"({i}, '{ua}')" for i, ua in enumerate(UA_POOL))
    return f"""
        with pool(i, ua) as (values {values}),
        reqs as (select doc_id, 'http://' || doc_id || '.onion/p' as url
                 from documents)
        select r.doc_id, r.url, p.ua as user_agent,
               cast(null as varchar) as referer
        from reqs r
        join pool p
          on p.i = ('0x' || substr(md5(r.url || ':3'), 1, 15))::bigint % {len(UA_POOL)}"""


_REQUEST_HEADERS_SQL = _request_headers_sql()


# GPT-2-family pre-tokenizer pattern, lookahead-free (RE2-compatible):
# contractions | space?letters | space?digits | space?punct-run | whitespace
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"

_SHINGLE_CTE = """
with toks as (select doc_id, regexp_split_to_array(text,'\\s+') l from documents),
sh as (select doc_id,
              unnest(list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                                    for i in generate_series(1, len(l)-2)])) as sh
       from toks where len(l) >= 3),
cnt as (select doc_id, count(*) n from sh group by 1),
inter as (select a.doc_id i, b.doc_id j, count(*) c
          from sh a join sh b on a.sh = b.sh and a.doc_id < b.doc_id
          group by 1, 2)
select i, j, round(c*1.0/(ca.n + cb.n - c), 6) as jac
from inter
join cnt ca on inter.i = ca.doc_id
join cnt cb on inter.j = cb.doc_id
where round(c*1.0/(ca.n + cb.n - c), 6) >= 0.8
"""


def _simhash_sql() -> str:
    """DuckDB replay of operators/dedup.simhash_dup_pairs with the
    md5-60bit token hash (bits 60-63 are provably 0 for a 60-bit hash —
    their ±1 sums are strictly negative — so only bits 0..59 are built)."""
    sums = ",\n             ".join(
        f"sum((((h >> {j}) & 1)*2 - 1)) as s{j}" for j in range(60)
    )
    bits = " | ".join(
        f"(case when s{j} > 0 then (1::bigint << {j}) else 0::bigint end)" for j in range(60)
    )
    return f"""
        with toks as (select doc_id, unnest(regexp_split_to_array(text, '\\s+')) as t
                      from documents),
        h as (select doc_id, ('0x' || substr(md5(t), 1, 15))::bigint as h from toks),
        sums as (select doc_id,
             {sums}
             from h group by doc_id),
        sig as (select doc_id, ({bits}) as simhash from sums),
        chunks as (select doc_id, simhash, unnest([0, 1, 2, 3]) as chunk,
                          unnest([(simhash >> 0) & 65535, (simhash >> 16) & 65535,
                                  (simhash >> 32) & 65535, (simhash >> 48) & 65535]) as cv
                   from sig),
        cand as (select distinct a.doc_id as i, b.doc_id as j,
                        cast(bit_count(xor(a.simhash, b.simhash)) as integer) as hamming
                 from chunks a
                 join chunks b on a.chunk = b.chunk and a.cv = b.cv and a.doc_id < b.doc_id)
        select i, j, hamming from cand where hamming <= 3"""


_LANG_ID_SQL = """
    with t as (select doc_id, text,
                      regexp_split_to_array(lower(text), '\\s+') as toks,
                      length(regexp_replace(text, '[^一-鿿]', '', 'g')) as cjk
               from documents),
    s as (select doc_id, text, cjk,
          len(list_filter(toks, t -> t in ('the','and','of','to','is','that','with'))) as s_en,
          len(list_filter(toks, t -> t in ('der','die','und','das','ist','nicht','mit'))) as s_de,
          len(list_filter(toks, t -> t in ('le','la','et','les','des','est','dans'))) as s_fr,
          len(list_filter(toks, t -> t in ('el','los','las','es','una','por','para'))) as s_es
          from t)
    select doc_id,
           case when cjk * 3 >= length(text) then 'zh'
                when s_es > 0 and s_es >= greatest(s_fr, s_de, s_en) then 'es'
                when s_fr > 0 and s_fr >= greatest(s_de, s_en) then 'fr'
                when s_de > 0 and s_de >= s_en then 'de'
                when s_en > 0 then 'en'
                else 'unknown' end as lang_guess
    from s"""


def _host_pagerank_sql(iterations: int = 3) -> str:
    """DuckDB replay of operators/graph.pagerank_fixed_point: the
    3-iteration integer recurrence unrolled as chained CTEs.  `//` is
    DuckDB integral division; all values are non-negative so it agrees
    with Spark's `div` bit for bit (see graph.py module docstring)."""
    from tor_spider_spark.operators.graph import (
        BASE_RANK,
        DAMPING_DEN,
        DAMPING_NUM,
        INIT_RANK,
    )

    steps = []
    for t in range(1, iterations + 1):
        steps.append(
            f"""r{t} as (
              select n.node,
                     cast({BASE_RANK} + ({DAMPING_NUM} *
                          coalesce(sum(r.rank // d.od), 0)) // {DAMPING_DEN}
                          as bigint) as rank
              from nodes n
              left join edges e on e.dst = n.node
              left join r{t - 1} r on r.node = e.src
              left join outdeg d on d.src = e.src
              group by n.node)"""
        )
    chain = ",\n            ".join(steps)
    return f"""
        with edges as (
          select distinct o_custkey % 100 as src, o_orderkey % 100 as dst
          from orders
          where o_custkey % 100 <> o_orderkey % 100),
        nodes as (select src as node from edges
                  union
                  select dst from edges),
        outdeg as (select src, count(*) as od from edges group by 1),
        r0 as (select node, {INIT_RANK}::bigint as rank from nodes),
        {chain}
        select node, rank from r{iterations}"""


_HOST_PAGERANK_SQL = _host_pagerank_sql()


_GOLDEN_CRAWL = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "tor_spider_spark",
    "fixtures",
    "golden",
    "crawl_pages_smoke_r3.parquet",
)

_GOLDEN_PHASH = os.path.join(
    os.path.dirname(_GOLDEN_CRAWL), "phash_corpus_smoke.parquet"
)


def oracle_sql() -> dict[str, str]:
    return {
        "crawl_pages_3rounds": f"""
            select url, round, image_id, caption, phash, status
            from read_parquet('{_GOLDEN_CRAWL}')""",
        "claim_merge_delta": """
            select o_orderkey, o_custkey, round(o_totalprice, 2) as o_totalprice
            from orders where o_orderkey % 97 <> 0
            union all
            select -c_custkey as o_orderkey, c_custkey as o_custkey,
                   round(c_acctbal, 2) as o_totalprice
            from customer where c_custkey % 50 = 0""",
        "upsert_keys_delta": """
            select o_orderkey, o_custkey,
                   case when o_orderkey % 101 = 0 then 0.0
                        else round(o_totalprice, 2) end as o_totalprice
            from orders
            union all
            select -x as o_orderkey, cast(0 as bigint) as o_custkey,
                   1.5 as o_totalprice
            from generate_series(1, 5) as t(x)""",
        "q1_pricing_summary": """
            select l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) as sum_qty,
                   round(sum(l_extendedprice), 2) as sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
                   round(avg(l_quantity), 4) as avg_qty,
                   round(avg(l_discount), 4) as avg_disc,
                   count(*) as count_order
            from lineitem group by 1, 2""",
        "topk_global": """
            select o_orderkey, o_custkey, round(o_totalprice, 2) as o_totalprice
            from orders order by o_totalprice desc, o_orderkey asc limit 100""",
        "window_rank_topk": """
            select o_custkey, o_orderkey, rnk from (
              select o_custkey, o_orderkey,
                     row_number() over (partition by o_custkey
                                        order by o_totalprice desc, o_orderkey asc) as rnk
              from orders) where rnk <= 3""",
        "anti_join": """
            select c_custkey, c_name from customer
            where not exists (select 1 from orders where o_custkey = c_custkey)""",
        "semi_join": """
            select c_custkey from customer
            where exists (select 1 from orders where o_custkey = c_custkey)""",
        "broadcast_join": """
            select r_name, count(*) as n_customers, round(sum(c_acctbal), 2) as sum_bal
            from customer
            join nation on c_nationkey = n_nationkey
            join region on n_regionkey = r_regionkey
            group by 1""",
        "skew_join": """
            select o_orderpriority, count(*) as n_items,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
            from lineitem join orders on l_orderkey = o_orderkey
            group by 1""",
        "union_distinct": """
            select distinct key from (
              select l_partkey as key from lineitem
              union all
              select p_partkey as key from part)""",
        "groupby_count": """
            select l_suppkey, count(*) as n_items,
                   round(sum(l_quantity), 2) as sum_qty,
                   min(l_orderkey) as min_orderkey
            from lineitem group by 1""",
        "distinct_count": """
            select l_returnflag, count(distinct l_partkey) as n_parts
            from lineitem group by 1""",
        "filter_rlike": """
            select doc_id, lang from documents
            where regexp_matches(text, 'spark.*join|join.*spark')""",
        "explode_array": """
            select label, count(*) as n_values, round(avg(v), 4) as avg_v
            from (select label, unnest(embedding) as v from embeddings)
            group by 1""",
        "json_extract": """
            select event_type, count(*) as n,
                   round(avg(json_extract_string(props, '$.k')::int), 4) as avg_k
            from events group by 1""",
        "tumbling_window": """
            select strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') as hour,
                   event_type, count(*) as n, round(sum(value), 2) as sum_value
            from events group by 1, 2""",
        "stream_windowed_counts": """
            select strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') as hour,
                   event_type, count(*) as n, round(sum(value), 2) as sum_value
            from events group by 1, 2""",
        "stream_update_counts": """
            select strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') as hour,
                   event_type, count(*) as n, round(sum(value), 2) as sum_value
            from events group by 1, 2""",
        "stream_update_counts_2drop": """
            select strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') as hour,
                   event_type, count(*) as n, round(sum(value), 2) as sum_value
            from events group by 1, 2""",
        "hash64_md5": """
            select doc_id, ('0x' || substr(md5(text), 1, 15))::bigint as h
            from documents""",
        "split_assign_holdout": """
            with u as (select doc_id,
                   ('0x' || substr(md5(doc_id::varchar || ':split'), 1, 15))::bigint
                   / 1152921504606846976.0 as u
                   from documents)
            select doc_id,
                   case when u < 0.875 then 'train'
                        when u < 0.9375 then 'val'
                        else 'test' end as split
            from u""",
        "sample_frac_125": """
            select doc_id from documents
            where ('0x' || substr(md5(doc_id::varchar || ':sample'), 1, 15))::bigint
                  / 1152921504606846976.0 < 0.125""",
        "stratified_cap_lang": """
            with u as (select doc_id, lang,
                   ('0x' || substr(md5(doc_id::varchar || ':cap'), 1, 15))::bigint
                   / 1152921504606846976.0 as u
                   from documents),
            rk as (select doc_id, lang,
                   row_number() over (partition by lang order by u, doc_id) as rk
                   from u)
            select doc_id, lang from rk where rk <= 50""",
        "request_headers": _REQUEST_HEADERS_SQL,
        "extract_links": """
            with h as (select doc_id,
                   '<html><body><a href="/doc/' || doc_id ||
                   '">self</a><p>no links here</p><a target="_blank" href="http://ex.com/' ||
                   lang || '?a=1&amp;b=2">out</a><a name="anchor-only"></a></body></html>'
                   as html from documents)
            select doc_id,
                   unnest(list_transform(regexp_extract_all(html, 'href="([^"]*)"', 1),
                                         s -> replace(s, '&amp;', '&'))) as href
            from h""",
        "rollup_agg": """
            select coalesce(r_name, 'ALL') as r_name,
                   coalesce(n_name, 'ALL') as n_name,
                   count(*) as n_customers,
                   round(sum(c_acctbal), 2) as sum_bal
            from customer
            join nation on c_nationkey = n_nationkey
            join region on n_regionkey = r_regionkey
            group by rollup (r_name, n_name)""",
        "sessionize": """
            with flagged as (
              select user_id, event_id, ts, value,
                     case when lag(ts) over w is null
                            or epoch(ts) - epoch(lag(ts) over w) > 1800
                          then 1 else 0 end as flag
              from events
              window w as (partition by user_id order by ts asc, event_id asc)),
            sess as (
              select user_id, event_id, ts, value,
                     sum(flag) over (partition by user_id order by ts asc, event_id asc
                                     rows unbounded preceding)::bigint as session_id
              from flagged)
            select user_id, session_id, count(*) as n_events,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') as session_start,
                   round(sum(value), 2) as sum_value
            from sess group by 1, 2""",
        "dedup_exact": """
            select md5(text) as content_hash, count(*) as n_dups,
                   min(doc_id) as keeper_doc_id
            from documents group by 1""",
        "dedup_incremental": """
            with corpus_h as (select distinct md5(text) as content_hash
                              from documents where doc_id % 5 <> 0),
                 batch as (select doc_id, md5(text) as content_hash
                           from documents where doc_id % 5 = 0)
            select min(doc_id) as doc_id
            from batch b
            where not exists (select 1 from corpus_h c
                              where c.content_hash = b.content_hash)
            group by b.content_hash""",
        "dedup_ngram_jaccard": _SHINGLE_CTE,
        "dedup_minhash_lsh": _SHINGLE_CTE,
        "decontaminate_bench": """
with bench as (select doc_id, text from documents where doc_id % 97 = 0),
corpus as (select doc_id, text from documents where doc_id % 97 <> 0),
btoks as (select regexp_split_to_array(text,'\\s+') l from bench),
bsh as (select distinct unnest(list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                                              for i in generate_series(1, len(l)-2)])) as sh
        from btoks where len(l) >= 3),
ctoks as (select doc_id, regexp_split_to_array(text,'\\s+') l from corpus),
csh as (select doc_id,
               unnest(list_distinct([l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                                     for i in generate_series(1, len(l)-2)])) as sh
        from ctoks where len(l) >= 3),
cnt as (select doc_id, count(*) n from csh group by 1),
hits as (select doc_id, count(*) h from csh join bsh using (sh) group by 1)
select c.doc_id,
       coalesce(n, 0) as doc_shingles,
       coalesce(h, 0) as overlap_shingles,
       round(coalesce(h*1.0/n, 0), 6) as overlap_frac,
       (round(coalesce(h*1.0/n, 0), 6) >= 0.2)::int as contaminated
from corpus c
left join cnt using (doc_id)
left join hits using (doc_id)
""",
        "dedup_simhash": _simhash_sql(),
        "dedup_phash_hamming": f"""
            select a.image_id as i, b.image_id as j,
                   cast(bit_count(xor(a.phash, b.phash)) as int) as hamming
            from read_parquet('{_GOLDEN_PHASH}') a
            join read_parquet('{_GOLDEN_PHASH}') b on a.image_id < b.image_id
            where bit_count(xor(a.phash, b.phash)) <= 6""",
        "dedup_phash_clusters": f"""
            with recursive
            pairs as (
              select a.image_id as i, b.image_id as j
              from read_parquet('{_GOLDEN_PHASH}') a
              join read_parquet('{_GOLDEN_PHASH}') b on a.image_id < b.image_id
              where bit_count(xor(a.phash, b.phash)) <= 6),
            edges as (select i as a, j as b from pairs
                      union all
                      select j as a, i as b from pairs),
            nodes as (select distinct a as node from edges),
            reach(node, label) as (
              select node, node from nodes
              union
              select e.a, r.label from edges e join reach r on e.b = r.node
            )
            select node as image_id, min(label) as cluster
            from reach group by node""",
        "dedup_clusters": f"""
            with recursive
            pairs as (select i, j from ({_SHINGLE_CTE})),
            edges as (select i as a, j as b from pairs
                      union all
                      select j as a, i as b from pairs),
            nodes as (select distinct a as node from edges),
            reach(node, label) as (
              select node, node from nodes
              union
              select e.a, r.label from edges e join reach r on e.b = r.node
            )
            select node as doc_id, min(label) as cluster from reach group by node""",
        "lang_id": _LANG_ID_SQL,
        "doc_fingerprint_md5": """
            with pos as (
              select doc_id, text,
                     unnest(generate_series(1, greatest(length(text) - 4, 0))) as i
              from documents),
            h as (select doc_id, i,
                         ('0x' || substr(md5(substr(text, i::int, 5)), 1, 15))::bigint as h,
                         count(*) over (partition by doc_id) as n
                  from pos),
            w as (select doc_id, n, i,
                         min(h) over (partition by doc_id order by i
                                      rows between current row and 7 following) as m,
                         count(*) over (partition by doc_id order by i
                                        rows between current row and 7 following) as c,
                         min(h) over (partition by doc_id) as gmin
                  from h)
            select distinct doc_id, case when n <= 8 then gmin else m end as fp
            from w
            where n <= 8 or c = 8""",
        "dedup_embedding_cosine": """
            with e as (select vec_id, embedding::double[] as v from embeddings)
            select a.vec_id as i, b.vec_id as j,
                   round(list_sum([a.v[k] * b.v[k] for k in generate_series(1, 64)])
                         / (sqrt(list_sum([a.v[k] * a.v[k] for k in generate_series(1, 64)]))
                          * sqrt(list_sum([b.v[k] * b.v[k] for k in generate_series(1, 64)]))), 4) as cos
            from e a join e b on a.vec_id < b.vec_id
            where round(list_sum([a.v[k] * b.v[k] for k in generate_series(1, 64)])
                         / (sqrt(list_sum([a.v[k] * a.v[k] for k in generate_series(1, 64)]))
                          * sqrt(list_sum([b.v[k] * b.v[k] for k in generate_series(1, 64)]))), 4) >= 0.4""",
        "dedup_embedding_clusters": """
            with recursive
            e as (select vec_id, embedding::double[] as v from embeddings),
            pairs as (
              select a.vec_id as i, b.vec_id as j
              from e a join e b on a.vec_id < b.vec_id
              where round(list_sum([a.v[k] * b.v[k] for k in generate_series(1, 64)])
                         / (sqrt(list_sum([a.v[k] * a.v[k] for k in generate_series(1, 64)]))
                          * sqrt(list_sum([b.v[k] * b.v[k] for k in generate_series(1, 64)]))), 4) >= 0.4),
            edges as (select i as a, j as b from pairs
                      union all
                      select j as a, i as b from pairs),
            nodes as (select distinct a as node from edges),
            reach(node, label) as (
              select node, node from nodes
              union
              select e2.a, r.label from edges e2 join reach r on e2.b = r.node
            )
            select node as vec_id, min(label) as cluster from reach group by node""",
        "bpe_token_count": f"""
            select doc_id,
                   len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}'))::bigint
                   as n_bpe_tokens
            from documents""",
        "ann_ivf_full": """
            with e as (select vec_id, embedding::double[] as v from embeddings),
            scored as (
              select q.vec_id as query_id, c.vec_id as neighbor_id,
                     list_sum([q.v[k] * c.v[k] for k in generate_series(1, 64)])
                     / (sqrt(list_sum([q.v[k] * q.v[k] for k in generate_series(1, 64)]))
                      * sqrt(list_sum([c.v[k] * c.v[k] for k in generate_series(1, 64)]))) as cos
              from e q join e c on q.vec_id < 10 and q.vec_id != c.vec_id)
            select query_id, neighbor_id, rank from (
              select query_id, neighbor_id,
                     row_number() over (partition by query_id
                                        order by cos desc, neighbor_id asc) as rank
              from scored) where rank <= 5""",
        "ann_cosine_topk": """
            with e as (select vec_id, embedding::double[] as v from embeddings),
            scored as (
              select q.vec_id as query_id, c.vec_id as neighbor_id,
                     list_sum([q.v[k] * c.v[k] for k in generate_series(1, 64)])
                     / (sqrt(list_sum([q.v[k] * q.v[k] for k in generate_series(1, 64)]))
                      * sqrt(list_sum([c.v[k] * c.v[k] for k in generate_series(1, 64)]))) as cos
              from e q join e c on q.vec_id < 10 and q.vec_id != c.vec_id)
            select query_id, neighbor_id, rank from (
              select query_id, neighbor_id,
                     row_number() over (partition by query_id
                                        order by cos desc, neighbor_id asc) as rank
              from scored) where rank <= 5""",
        "text_quality": """
            select doc_id,
                   len(regexp_split_to_array(text, '\\s+')) as n_tokens,
                   round(case when length(text) > 0
                         then length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) * 1.0 / length(text)
                         else 0 end, 6) as punct_ratio,
                   round(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             t -> t in ('the','a','of','and','to','in','is','that'))) * 1.0
                         / greatest(len(regexp_split_to_array(text, '\\s+')), 1), 6) as stopword_ratio,
                   (len(regexp_split_to_array(text, '\\s+')) between 5 and 100000)
                   and (length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) * 1.0
                        / greatest(length(text), 1) <= 0.3)
                   and (length(text) * 1.0 / greatest(len(regexp_split_to_array(text, '\\s+')), 1) <= 40)
                   as quality_ok
            from documents""",
        "training_keeplist": """
            with keepers as (select min(doc_id) as doc_id from documents group by md5(text))
            select d.doc_id, d.lang
            from documents d
            join keepers using (doc_id)
            where (len(regexp_split_to_array(d.text, '\\s+')) between 5 and 100000)
              and (length(regexp_replace(d.text, '[^!-/:-@\\[-`{-~]', '', 'g')) * 1.0
                   / greatest(length(d.text), 1) <= 0.3)
              and (length(d.text) * 1.0
                   / greatest(len(regexp_split_to_array(d.text, '\\s+')), 1) <= 40)""",
        "repetition_top_bigram": r"""
            with toks as (
              select doc_id, length(text) as n_chars_total,
                     regexp_split_to_array(lower(text), '\s+') as toks
              from documents
              where len(regexp_split_to_array(text, '\s+')) >= 2
            ), bg as (
              select doc_id, n_chars_total,
                     toks[g.i] || ' ' || toks[g.i + 1] as bigram
              from toks, unnest(generate_series(1, len(toks) - 1)) as g(i)
            ), counts as (
              select doc_id, n_chars_total, bigram, count(*)::bigint as cnt
              from bg group by 1, 2, 3
            ), ranked as (
              select *, row_number() over (partition by doc_id
                                           order by cnt desc, bigram desc) as rn
              from counts
            )
            select doc_id, bigram as top_bigram, cnt as top_bigram_count,
                   round(cnt * length(bigram) * 1.0 / greatest(n_chars_total, 1), 6)
                     as top_bigram_char_frac
            from ranked where rn = 1""",
        "type_token_ratio": r"""
            select doc_id,
                   round(len(list_distinct(regexp_split_to_array(lower(text), '\s+'))) * 1.0
                         / greatest(len(regexp_split_to_array(text, '\s+')), 1), 6)
                     as type_token_ratio
            from documents""",
        "token_quantiles": r"""
            select lang,
                   round(quantile_cont(nt, 0.5), 6) as p50,
                   round(quantile_cont(nt, 0.9), 6) as p90,
                   round(quantile_cont(nt, 0.99), 6) as p99
            from (select lang, len(regexp_split_to_array(text, '\s+')) as nt
                  from documents)
            group by 1""",
        "token_count": """
            select lang, count(*) as n_docs,
                   sum(len(regexp_split_to_array(text, '\\s+')))::bigint as total_tokens,
                   round(avg(len(regexp_split_to_array(text, '\\s+'))), 4) as avg_tokens
            from documents group by 1""",
        "host_pagerank": _HOST_PAGERANK_SQL,
    }
