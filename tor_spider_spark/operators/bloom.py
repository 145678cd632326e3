"""Persistent partitioned bloom-filter URL-seen shards (SURVEY §4.3.1).

The reference's visited set is a Redis-backed 64-bit-hash membership store
(colly redisstorage, attached at reference spider/spider.go:153; main.go:74-79)
— probabilistic by hash width, checked before every fetch.  The north rule
re-imagines it as a *partitioned bloom filter salted by host-hash with
exact (cuckoo-style) verification*:

- one bitset shard per ``pmod(host_hash, n_shards)`` — the SAME key the
  Iceberg tables bucket on, so shard maintenance and probing co-locate
  with the frontier partitions (no extra shuffle at scale);
- shards persist in the ``bloom_shards`` snapshot table and are updated
  incrementally each round from that round's newly-seen hashes via
  ``cogroup().applyInPandas`` (Arrow batches, numpy bit ops — no per-row
  Python);
- a probe marks candidates ``_bloom_maybe``; definite-negatives skip the
  exact ``seen`` anti-join entirely, bloom-positives are verified by it —
  so false positives cost only work, never correctness, and false
  negatives cannot occur (every admitted URL was inserted).

Sizing: bits are double-hashed from the 64-bit url_hash
(h_i = h1 + i·h2 mod m). Default 2^20 bits/shard ≈ 1% fpp at ~10^5
URLs/shard with k=7; at 10^10-URL scale use n_shards=4096 and 2^25
bits/shard (~4 MB, SURVEY §4.4) — knobs only, same code.
"""

from __future__ import annotations



import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from ..schemas import BLOOM_SHARDS

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _positions(hashes: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing on uint64."""
    with np.errstate(over="ignore"):
        h1 = hashes.astype(np.uint64)
        h2 = (h1 * _MIX) ^ (h1 >> np.uint64(29))
        h2 |= np.uint64(1)
        i = np.arange(k, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bits, pos.ravel() >> 3, (1 << (pos.ravel() & 7)).astype(np.uint8))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    got = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return got.all(axis=1)


def shard_col(host_hash_col, n_shards: int):
    return F.pmod(host_hash_col, F.lit(n_shards)).cast("int")


class BloomShards:
    def __init__(self, n_shards: int, m_bits: int = 1 << 20, k: int = 7):
        self.n_shards = n_shards
        self.m_bits = m_bits
        self.k = k

    def update(self, shards: DataFrame, new_items: DataFrame, round_no: int) -> DataFrame:
        """Merge this round's new (url_hash, host_hash) rows into the
        persistent shards. Distributed per shard via cogroup — each task
        touches exactly one bitset."""
        m_bits, k = self.m_bits, self.k
        items = new_items.select(
            shard_col(F.col("host_hash"), self.n_shards).alias("shard_id"), "url_hash"
        )

        def merge(key, items_pd: pd.DataFrame, old: pd.DataFrame):
            if len(old) and old["bits"].iloc[0] is not None:
                bits = np.frombuffer(old["bits"].iloc[0], dtype=np.uint8).copy()
                n_items = int(old["n_items"].iloc[0])
            else:
                bits = np.zeros(m_bits // 8, dtype=np.uint8)
                n_items = 0
            if len(items_pd):
                _set_bits(bits, _positions(items_pd["url_hash"].to_numpy(np.int64), k, m_bits))
                n_items += len(items_pd)
            return pd.DataFrame(
                {
                    "shard_id": [int(key[0])],
                    "round": [round_no],
                    "bits": [bits.tobytes()],
                    "n_items": [n_items],
                }
            )

        return (
            items.groupBy("shard_id")
            .cogroup(shards.groupBy("shard_id"))
            .applyInPandas(merge, schema=BLOOM_SHARDS)
        )

    def probe(self, shards: DataFrame):
        """Returns fn(candidates) -> candidates + boolean `_bloom_maybe`.

        SHUFFLE-FREE design (replaces the round-1 cogroup probe, which
        repartitioned every candidate row by shard and round-tripped full
        rows through Python — measured 1.5-3.8× slower than the exact
        anti-join it was meant to short-circuit): the shard bitsets are
        collected once (bounded: n_shards rows = the bloom's total byte
        size, metadata-scale like the politeness offsets pass) and
        broadcast to executors; candidates are tested in place by a
        SCALAR Arrow-batched pandas UDF over only the (url_hash,
        host_hash) long columns. No exchange, no full-row Arrow transfer
        — the row stays JVM-side and only two int64 columns + one bool
        cross the boundary.

        Size envelope: at 10 bits/key the broadcast is ~125 MB per 10^8
        seen URLs — fine to ~10^9. At the full 10^10 target the bloom is
        ~12 GB no matter how it is structured; there the deployment path
        is partition-aligned probing (shards and candidates share the
        pmod(host_hash) bucketing, so an Iceberg storage-partitioned
        join holds each task's single shard local — same probe math,
        broadcast replaced by co-location)."""
        m_bits, k, n_shards = self.m_bits, self.k, self.n_shards
        rows = shards.select("shard_id", "bits").collect()
        table = {
            int(r["shard_id"]): np.frombuffer(r["bits"], dtype=np.uint8)
            for r in rows
            if r["bits"] is not None
        }
        b_table = shards.sparkSession.sparkContext.broadcast(table)

        @pandas_udf(BooleanType())
        def _maybe(url_hash: pd.Series, host_hash: pd.Series) -> pd.Series:
            tbl = b_table.value
            uh = url_hash.to_numpy(np.int64)
            sh = np.mod(host_hash.to_numpy(np.int64), n_shards)  # == Spark pmod
            out = np.zeros(len(uh), dtype=bool)
            for s in np.unique(sh):
                bits = tbl.get(int(s))
                if bits is None:
                    continue
                m = sh == s
                out[m] = _test_bits(bits, _positions(uh[m], k, m_bits))
            return pd.Series(out)

        def apply(candidates: DataFrame) -> DataFrame:
            return candidates.withColumn(
                "_bloom_maybe", _maybe(F.col("url_hash"), F.col("host_hash"))
            )

        return apply
