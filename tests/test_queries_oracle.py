"""Driver-contract gate, run locally: every queries()[k] with an
oracle_sql()[k] must match DuckDB on the sf0.01 parquet fixtures —
row count, column names, and order-insensitive values (floats rounded
inside the queries themselves)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{os.path.join(SF_DIR, t)}.parquet'"
        )
    return con


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, bool):
                v = bool(v)
            elif isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, duck, name):
    qdf = _QUERIES[name](spark, SF_DIR)
    spark_cols = qdf.columns
    spark_rows = [tuple(r) for r in qdf.collect()]

    res = duck.execute(_ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), f"{name}: {len(spark_rows)} vs {len(duck_rows)}"
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: first mismatches {mism}"


def test_all_query_keys_have_coverage():
    # every oracle key must have a query; non-oracle keys are the documented
    # non-SQL-expressible ops
    assert set(_ORACLES) <= set(_QUERIES)
    no_oracle = set(_QUERIES) - set(_ORACLES)
    # the genuinely non-SQL-reproducible four: Spark-specific hash (hash64),
    # approximate-by-design (approx_distinct, ann_lsh), rolling-hash UDF
    # (doc_fingerprint)
    assert no_oracle == {
        "hash64",
        "approx_distinct",
        "ann_lsh",
        "ann_ivf",
        "doc_fingerprint",
    }


def test_golden_crawl_parquet_is_fresh():
    """The committed golden parquet must equal what the simulator produces
    TODAY — catches a semantics change without a scripts/make_golden.py
    re-run."""
    import pyarrow.parquet as pq

    from scripts.make_golden import GOLDEN, golden_table

    assert pq.read_table(GOLDEN).equals(golden_table()), (
        "golden parquet stale — re-run scripts/make_golden.py"
    )


def test_rows_only_queries_run(spark):
    for name in ("hash64", "approx_distinct", "ann_lsh", "ann_ivf", "doc_fingerprint"):
        df = _QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0


def test_golden_phash_corpus_is_fresh():
    """The committed phash corpus must equal what scripts/make_golden.py
    generates TODAY (both the Spark query and its oracle read it as
    input — a stale file silently weakens the dedup_phash_hamming row)."""
    import pyarrow.parquet as pq

    from scripts.make_golden import GOLDEN_PHASH, phash_corpus_table

    assert pq.read_table(GOLDEN_PHASH).equals(phash_corpus_table()), (
        "phash corpus stale — re-run scripts/make_golden.py"
    )
