"""Per-row payload invariants (BASELINE.json input_hint): decoded-pixel
allclose (exact for lossless), PSNR ≥ 40 dB for lossy, exact caption
equality, phash equality — verified over the engine's `pages` output via
Arrow-batched UDFs (no per-row Python in the plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tor_spider_spark.functions.images import decode_image_stats, psnr_vs_source
from tor_spider_spark.plans.driver import CrawlDriver


def test_pages_payload_invariants(spark, tmp_path, smoke_dfs, smoke_fixture, smoke_cfg):
    drv = CrawlDriver(
        spark,
        str(tmp_path / "payload"),
        smoke_dfs["corpus"],
        smoke_dfs["seeds"],
        smoke_dfs["robots"],
        smoke_fixture.blacklist,
        smoke_cfg,
    )
    drv.run()
    pages = drv.read("pages")
    n = pages.count()
    assert n > 0

    checked = (
        pages.withColumn("stats", decode_image_stats(F.col("bytes")))
        .withColumn("psnr", psnr_vs_source(F.col("bytes"), F.col("image_id"), F.col("w"), F.col("h")))
        .select(
            "url",
            "fmt",
            "caption",
            "phash",
            "w",
            "h",
            F.col("stats.w").alias("dec_w"),
            F.col("stats.h").alias("dec_h"),
            F.col("stats.phash").alias("dec_phash"),
            "psnr",
        )
    ).collect()

    corpus_caption = {r["url"]: r["caption"] for r in smoke_fixture.corpus}
    corpus_phash = {r["url"]: r["phash"] for r in smoke_fixture.corpus}
    for row in checked:
        assert row["dec_w"] == row["w"] and row["dec_h"] == row["h"], row["url"]
        # caption exact equality vs the corpus (reference Title, re-typed)
        assert row["caption"] == corpus_caption[row["url"]], row["url"]
        # stored phash column matches corpus-computed phash
        assert row["phash"] == corpus_phash[row["url"]], row["url"]
        if row["fmt"] == "png":
            # lossless: decoded pixels identical to source → infinite PSNR
            assert row["psnr"] == float("inf"), (row["url"], row["psnr"])
            assert row["dec_phash"] == row["phash"], row["url"]
        else:
            assert row["psnr"] >= 40.0, (row["url"], row["psnr"])
