"""Config-file sources (SURVEY §2.1 S3): blacklist + seed lists.

Parity with the reference's ``readLines`` (main.go:27-40, wired at
main.go:152-158 to ``blacklist.txt``) and ``seed.sh``-style seed lists —
newline-delimited text, comments and blanks skipped. Small files are read
driver-side (they broadcast into filters); a path can also be read
distributed via ``spark.read.text`` when a blacklist grows to millions of
patterns (then filters F2/J5 switch to the broadcast anti-join form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import SEEDS


def read_lines(path: str) -> list[str]:
    out = []
    with open(path) as fh:
        for raw in fh:
            line = raw.strip()
            if line and not line.startswith("#"):
                out.append(line)
    return out


def load_blacklist(path: str) -> list[str]:
    """Regex patterns, one per line (reference blacklist.txt:1-4)."""
    return read_lines(path)


def load_seeds(spark: SparkSession, path: str) -> DataFrame:
    """Seed URL list → seeds table. Lines are either a bare URL or
    ``url<TAB>recrawl_every`` (periodic re-crawl analog, spider.go:472-490)."""
    rows = []
    for line in read_lines(path):
        parts = line.split("\t")
        url = parts[0]
        k = int(parts[1]) if len(parts) > 1 else 0
        rows.append((url, True, k))
    return spark.createDataFrame(rows, SEEDS)


def blacklist_df(spark: SparkSession, path: str) -> DataFrame:
    """Distributed variant for huge lists: spark.read.text → patterns."""
    return (
        spark.read.text(path)
        .select(F.trim("value").alias("pattern"))
        .where((F.length("pattern") > 0) & ~F.col("pattern").startswith("#"))
    )
