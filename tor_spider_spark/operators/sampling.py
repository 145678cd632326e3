"""Deterministic sampling & splitting for training-data pipelines.

Three operators every large-corpus pipeline needs between dedup and
training, all driven by a KEYED HASH instead of RNG state so the result
is a pure function of (key, salt) — reproducible across runs, engines,
partitionings, and cluster sizes, and stable under re-partitioning
(`df.sample()` is none of those: it draws from per-partition RNG
streams, so adding one executor reshuffles the sample):

- split_assign   — train/val/test holdout assignment by cumulative
                   weight thresholds on a per-key uniform
- sample_frac    — keep a deterministic fraction of rows
- stratified_cap — cap each group (language, host, source) at n rows,
                   picked in hash order (quota sampling; the "no more
                   than N docs per domain" mixing rule)

Scale shape: split_assign and sample_frac are pure narrow projections /
filters — zero shuffles, fully pushdown-friendly, whole-stage codegen.
stratified_cap is one hash-partition exchange on the group key +
window rank (the same shape as the politeness scheduler's per-host
top-k, operators/politeness.py) — no global sort, no driver collect.

The per-key uniform defaults to the md5-derived 60-bit hash
(dedup.md5_60bit_hash) so every operator here has an exact DuckDB
oracle; pass hash_col=F.xxhash64 behind a wrapper for the faster
native path in production (same knob pattern as simhash_signatures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tor_spider_spark.operators.dedup import md5_60bit_hash

# md5_60bit_hash values are uniform on [0, 2^60): dividing by 2^60 gives
# a unit uniform with 60 significant bits — plenty below any practical
# split-weight resolution
_UNIT = float(1 << 60)


def unit_uniform(col: Column, salt: str = "") -> Column:
    """Deterministic per-key uniform in [0, 1): hash(key ∥ salt) / 2^60.
    Different salts give INDEPENDENT uniforms for the same key — so a
    holdout split and a downsample of the same table don't correlate."""
    keyed = F.concat(col.cast("string"), F.lit(":"), F.lit(salt))
    return md5_60bit_hash(keyed) / F.lit(_UNIT)


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Assign every row a split label ("train"/"val"/"test"/...) by
    cumulative weight thresholds over the per-key uniform. Weights must
    sum to 1 (validated). Label order follows the dict's insertion
    order, so the mapping is part of the caller's contract and a row's
    split never changes when other splits' weights are re-balanced
    around it only if its own interval is unchanged — document the
    weights next to the salt."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = unit_uniform(F.col(key_col), salt)
    expr = None
    acc = 0.0
    labels = list(weights.items())
    for name, w in labels[:-1]:
        acc += w
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def sample_frac(
    df: DataFrame, key_col: str, frac: float, salt: str = "sample"
) -> DataFrame:
    """Keep rows whose per-key uniform falls below *frac* — a
    deterministic, engine-reproducible downsample. Nested fractions are
    monotone for a fixed salt: sample_frac(0.1) ⊂ sample_frac(0.2), the
    property that lets a pipeline publish '10% preview' and '20% dev'
    cuts where the smaller is a strict subset of the larger."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    return df.where(unit_uniform(F.col(key_col), salt) < F.lit(frac))


def stratified_cap(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    n: int,
    salt: str = "cap",
) -> DataFrame:
    """At most *n* rows per group, chosen deterministically in hash
    order (ties broken by the key itself, so the pick is total even
    under hash collisions). One exchange on the group key + window
    rank — the politeness top-k shape; per-group state never leaves
    the executors."""
    if n < 1:
        raise ValueError(f"cap must be >= 1, got {n}")
    from pyspark.sql.window import Window

    u = unit_uniform(F.col(key_col), salt)
    w = Window.partitionBy(*group_cols).orderBy(u.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n)
        .drop("_rk")
    )
