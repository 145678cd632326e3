"""Streaming seed ingestion (S1/S2): files dropped into the seed dropbox
appear in the frontier table and get crawled with seed semantics."""

from __future__ import annotations

import json
import os

from tor_spider_spark import schemas
from tor_spider_spark.sources.tables import SnapshotTable
from tor_spider_spark.streaming.seed_stream import ingest_seed_dropbox


def test_dropbox_seeds_reach_frontier(spark, tmp_path):
    dropbox = tmp_path / "dropbox"
    dropbox.mkdir()
    frontier = SnapshotTable(str(tmp_path / "tables"), "frontier", schemas.FRONTIER)

    host = "a" * 16 + ".onion"
    with open(dropbox / "seeds1.json", "w") as fh:
        fh.write(json.dumps({"url": f"http://{host}/p0", "recrawl_every": 0}) + "\n")
        fh.write(json.dumps({"url": f"http://{host}/p1", "recrawl_every": 2}) + "\n")

    q = ingest_seed_dropbox(
        spark, str(dropbox), frontier, next_round=3, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(60)

    rows = {r["url"]: r for r in frontier.read(spark).collect()}
    assert set(rows) == {f"http://{host}/p0", f"http://{host}/p1"}
    for r in rows.values():
        assert r["is_seed"] is True and r["depth"] == 0 and r["discovered_round"] == 3
        assert r["url_hash"] is not None and r["host"] == host

    # second drop is picked up by a fresh availableNow pass (same checkpoint
    # → first file not reprocessed: append, not duplicate)
    with open(dropbox / "seeds2.json", "w") as fh:
        fh.write(json.dumps({"url": f"http://{host}/p2", "recrawl_every": 0}) + "\n")
    q2 = ingest_seed_dropbox(
        spark, str(dropbox), frontier, next_round=4, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q2.awaitTermination(60)
    urls = sorted(r["url"] for r in frontier.read(spark).collect())
    assert urls == [f"http://{host}/p0", f"http://{host}/p1", f"http://{host}/p2"]
