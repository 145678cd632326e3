"""Text-analysis column functions for training-data pipelines: token
counting, quality scoring, language ID, document fingerprinting.

All hot-path expressions are native Catalyst (split/regexp/aggregate —
whole-stage codegen); only the winnowing fingerprint uses an Arrow-batched
pandas UDF (rolling hash over char shingles is not expressible natively).

These operate on a generic (doc_id, text) shape — the `documents` driver
table or the crawl engine's `caption` column alike.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

TOKEN_SPLIT = r"\s+"

# small frozen stopword sets for the quality ratio and the langid heuristic
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "that")
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "that", "with"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit"),
    "fr": ("le", "la", "et", "les", "des", "est", "dans"),
    "es": ("el", "los", "las", "es", "una", "por", "para"),
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization — matches regexp_split_to_array(text,'\\s+')
    in the DuckDB oracles."""
    return F.split(text, TOKEN_SPLIT)


def n_tokens_col(text: Column) -> Column:
    return F.size(tokens_col(text))


# the frozen oracle punct class [!-/:-@\[-`{-~] enumerated: ASCII 0x21-0x2F,
# 0x3A-0x40, 0x5B-0x60, 0x7B-0x7E — all 32 ASCII punctuation characters
_PUNCT_CHARS = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"


def punct_ratio_col(text: Column) -> Column:
    """len(punct chars)/len(text); punct class frozen to match the oracle.

    r6: counted as length(text) − length(translate(text, punct, '')) —
    a single char-map scan.  The r5 form length(regexp_replace(text,
    '[^punct]', '')) pays one regex match + StringBuffer append PER
    NON-PUNCT CHARACTER (measured 2.7 s alone over sf1.0 on local[32],
    ~86 CPU-s for 15 MB of text); the char counts, and therefore every
    downstream ratio, are identical."""
    n_punct = F.length(text) - F.length(F.translate(text, _PUNCT_CHARS, ""))
    return F.when(F.length(text) > 0, n_punct / F.length(text)).otherwise(0.0)


def stopword_ratio_col(text: Column) -> Column:
    toks = tokens_col(F.lower(text))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS_EN)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(0.0)


def quality_ok_col(text: Column) -> Column:
    """Length / punctuation / token-length heuristics, Gopher-rule style."""
    n = n_tokens_col(text)
    return (
        (n >= 5)
        & (n <= 100000)
        & (punct_ratio_col(text) <= 0.3)
        & (F.length(text) / F.greatest(n, F.lit(1)) <= 40)  # mean token length sane
    )


def type_token_ratio_col(text: Column) -> Column:
    """distinct tokens / total tokens (case-folded) — the classic lexical-
    diversity repetition signal (low TTR = boilerplate / generated spam).
    Pure Catalyst: array_distinct over the whitespace split, no shuffle."""
    toks = tokens_col(F.lower(text))
    return F.when(
        F.size(toks) > 0, F.size(F.array_distinct(toks)) / F.size(toks)
    ).otherwise(0.0)


def top_bigram_stats(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher-style repetition signal: per document, the most frequent word
    2-gram and the fraction of the document's characters it accounts for
    (count × len(bigram) / len(text); overlapping occurrences counted —
    frozen spec, mirrored by the DuckDB oracle).  Docs with <2 tokens are
    dropped (no bigram exists).

    Scale shape (r6 rewrite): the whole signal is DOC-LOCAL, so it needs
    no shuffle at all — the r5 shape exploded one row per token and paid
    two exchanges plus two SortAggregates (max over a struct is not
    hash-aggregable).  Now the bigram array (one Catalyst zip_with over
    the split) is array_sort'ed and scanned once with a single
    ``aggregate`` higher-order function: runs of equal bigrams in the
    sorted array are counted in-line, keeping the best (count,
    bigram) as it goes.  In ascending order a later run's bigram is
    strictly greater than every earlier one, so updating on
    ``run_count >= best_count`` implements exactly the frozen tie-break
    (highest count, then lexicographically greatest bigram).  Zero
    exchanges, zero row explosion; input spread to core parallelism
    since the scan side is one small file (guide §2.5)."""
    from tor_spider_spark.partitioning import spread_input

    toks = F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)
    d = (
        spread_input(docs)
        .select(
            id_col,
            F.length(text_col).alias("_n_chars"),
            toks.alias("_toks"),
        )
        .where(F.size("_toks") >= 2)
    )
    bigrams = F.array_sort(
        F.zip_with(
            F.slice("_toks", F.lit(1), F.size("_toks") - 1),
            F.slice("_toks", F.lit(2), F.size("_toks") - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("bc"),   # best count
        F.lit("").alias("bb"),               # best bigram
        F.lit(0).cast("long").alias("cc"),   # current run count
        F.lit("").alias("cb"),               # current run bigram
    )

    def step(acc, x):
        run = F.when(acc["cb"] == x, acc["cc"] + 1).otherwise(F.lit(1).cast("long"))
        take = run >= acc["bc"]
        return F.struct(
            F.when(take, run).otherwise(acc["bc"]).alias("bc"),
            F.when(take, x).otherwise(acc["bb"]).alias("bb"),
            run.alias("cc"),
            x.alias("cb"),
        )

    return d.withColumn("_top", F.aggregate(bigrams, zero, step)).select(
        id_col,
        F.col("_top.bb").alias("top_bigram"),
        F.col("_top.bc").alias("top_bigram_count"),
        F.round(
            F.col("_top.bc")
            * F.length("_top.bb")
            / F.greatest(F.col("_n_chars"), F.lit(1)),
            6,
        ).alias("top_bigram_char_frac"),
    )


def lang_id_col(text: Column) -> Column:
    """Heuristic language ID: CJK codepoint share → zh; else the marker-word
    set with the highest hit count; ties broken by a fixed language order
    (deterministic). Pure Catalyst expressions — no UDF."""
    # regexp_count scans once and only matches the (rare) CJK chars; the
    # r5 regexp_replace('[^一-鿿]','') rebuilt the whole string to count
    # them (same per-non-match cost as the punct_ratio_col pathology)
    cjk = F.regexp_count(text, F.lit(r"[一-鿿]"))
    toks = tokens_col(F.lower(text))
    def _marker_count(markers: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = {lang: _marker_count(markers) for lang, markers in _LANG_MARKERS.items()}
    best = F.lit("unknown")
    best_score = F.lit(0)
    for lang in ("es", "fr", "de", "en"):  # reversed priority; later wins ties -> en first overall
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return F.when(cjk * 3 >= F.length(text), F.lit("zh")).otherwise(best)


_FP_WINDOW = 8
_FP_SHINGLE = 5
_FP_MOD = np.uint64((1 << 61) - 1)
_FP_BASE = np.uint64(1000003)


@pandas_udf(ArrayType(LongType()))
def winnow_fingerprints_md5(text: pd.Series) -> pd.Series:
    """Oracle-able winnowing variant (the dedup_simhash/hash64_md5 trick):
    the 5-CHAR-gram hash is the md5-derived 60-bit value DuckDB can
    reproduce (('0x'||substr(md5(g),1,15))::bigint), so the whole
    winnow — window-8 minima over character positions, distinct —
    replays as pure SQL (window min + frame-count filter; the
    doc_fingerprint_md5 CORRECTNESS row). Production fingerprinting
    stays on the fast polynomial hash (winnow_fingerprints below);
    same selection logic, different gram hash."""
    import hashlib

    out = []
    for t in text:
        if t is None or len(t) < _FP_SHINGLE:
            out.append([])
            continue
        h = np.array(
            [
                int(hashlib.md5(t[i : i + _FP_SHINGLE].encode("utf-8")).hexdigest()[:15], 16)
                for i in range(len(t) - _FP_SHINGLE + 1)
            ],
            dtype=np.int64,
        )
        if len(h) <= _FP_WINDOW:
            mins = np.array([h.min()])
        else:
            mins = np.lib.stride_tricks.sliding_window_view(h, _FP_WINDOW).min(axis=1)
        out.append(np.unique(mins).tolist())
    return pd.Series(out)


@pandas_udf(ArrayType(LongType()))
def winnow_fingerprints(text: pd.Series) -> pd.Series:
    """Winnowing document fingerprints (Schleimer et al. 2003, public
    algorithm): rolling polynomial hash over char 5-grams, per-window
    minimum (window=8), distinct minima returned. Arrow-batched; numpy
    rolling window inside."""
    out = []
    for t in text:
        if t is None or len(t) < _FP_SHINGLE:
            out.append([])
            continue
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) < _FP_SHINGLE:
            out.append([])
            continue
        with np.errstate(over="ignore"):
            h = np.zeros(len(b) - _FP_SHINGLE + 1, dtype=np.uint64)
            for i in range(_FP_SHINGLE):
                h = h * _FP_BASE + b[i : len(b) - _FP_SHINGLE + 1 + i]
        if len(h) <= _FP_WINDOW:
            mins = np.array([h.min()])
        else:
            sw = np.lib.stride_tricks.sliding_window_view(h, _FP_WINDOW)
            mins = sw.min(axis=1)
        fps = np.unique(mins).astype(np.int64)
        out.append(fps.tolist())
    return pd.Series(out)
