"""Raw-HTML link extraction (SURVEY §2.9 #3): real tokenizer semantics —
entity unescaping, attribute order/quoting, malformed-markup resilience —
that a regex scrape gets wrong; engine UDF ≡ pure function."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tor_spider_spark.functions.html import extract_links, extract_links_py

CASES = [
    ('<a href="/x">t</a>', ["/x"]),
    ("<a href='/single'>q</a>", ["/single"]),  # single quotes
    ('<A HREF="/UP">c</A>', ["/UP"]),  # case-insensitive tag/attr
    ('<a target="_b" href="/late">o</a>', ["/late"]),  # attr order
    ('<a href="/a&amp;b?x=1&amp;y=2">e</a>', ["/a&b?x=1&y=2"]),  # entities
    ('<a href=/unquoted>u</a>', ["/unquoted"]),  # unquoted attr value
    ('<a name="no-href">n</a>', []),
    ('<p href="/not-anchor">p</p>', []),
    ('<a href="/1">x</a><div><a href="/2">y</a></div>', ["/1", "/2"]),  # order
    ('<a href="">empty</a>', []),  # empty href dropped
    ("<a href='/broken", []),  # truncated markup: no crash
    (None, None),
]


def test_pure_function_cases():
    for html, want in CASES:
        assert extract_links_py(html) == want, html


def test_udf_matches_pure_function(spark):
    got = list(extract_links.func(pd.Series([h for h, _ in CASES], dtype="object")))
    for (html, want), g in zip(CASES, got):
        assert g == want, html


def test_udf_on_spark(spark):
    df = spark.createDataFrame(
        [(1, '<a href="/a&amp;b">x</a><a href="/c">y</a>')], "id long, html string"
    )
    rows = df.select(F.explode(extract_links("html")).alias("href")).collect()
    assert [r["href"] for r in rows] == ["/a&b", "/c"]
