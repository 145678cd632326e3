"""URL canonicalization + onion filter parity between the engine UDF and
the simulator's pure function (SURVEY §2.7 C1, §2.2 F1)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tor_spider_spark.config import ONION_URL_PATTERN
from tor_spider_spark.functions.urls import canonicalize_urls, onion_url_col
from tor_spider_spark.simulator import canonicalize

V2 = "http://" + "a" * 16 + ".onion"
V3 = "https://" + "b2" * 28 + ".onion"

CASES = [
    (V2 + "/p1", "p7", V2 + "/p7"),
    (V2 + "/p1", "../x", V2 + "/x"),
    (V2 + "/a/b", "../c", V2 + "/c"),
    (V2 + "/p1", "#top", None),  # fragment-only → dropped (AbsoluteURL → "")
    (V2 + "/p1", "", None),
    (V2 + "/p1", V3 + "/q", V3 + "/q"),
    (V2 + "/p1", "https://example0.com/p0", "https://example0.com/p0"),
    (V2 + "/p1", "mailto:x@y.z", None),
    (V2 + "/p1", "HTTP://UPPER.onion/P", "http://upper.onion/P"),
    (V2 + "/p1", "/abs/path?q=1#frag", V2 + "/abs/path?q=1"),
]


def test_canonicalize_python_cases():
    for base, href, want in CASES:
        assert canonicalize(base, href) == want, (base, href)


def test_canonicalize_udf_matches_python(spark):
    df = spark.createDataFrame([(b, h) for b, h, _ in CASES], "base string, href string")
    got = df.select(canonicalize_urls("base", "href").alias("c")).collect()
    for (base, href, want), row in zip(CASES, got):
        assert row.c == want, (base, href)


@given(st.text(alphabet="abcp./#?123:", max_size=30))
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(href):
    c = canonicalize(V2 + "/p1", href)
    if c is not None:
        assert canonicalize(c, "") is None  # empty href drops
        assert canonicalize(V2 + "/p1", c) == c  # absolute input is a fixpoint


@given(
    st.lists(
        st.one_of(
            # free text that CAN spell http(s) URLs, including interior
            # \t\r\n (which urlsplit strips anywhere — ADVICE r2 #1)
            st.text(alphabet="htps.:/?#&= %2ab\t\r\n", max_size=40),
            st.builds(
                lambda scheme, host, path, q: f"{scheme}://{host}{path}{q}",
                st.sampled_from(["http", "https", "HTTP"]),
                st.text(alphabet="abcXY29.-", max_size=20),
                st.sampled_from(
                    ["", "/", "/p1", "/a b", "/x/../y", "/p ", "/pa\tth", "/p\r\nq"]
                ),
                st.sampled_from(["", "?q=1", "?a=%20b", "?a=\t1"]),
            ),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=60, deadline=None)
def test_fast_path_matches_pure_function(hrefs):
    """The UDF's vectorized fast path must agree element-for-element with
    the simulator's pure function — adversarial hrefs included (uppercase
    scheme, whitespace, dot segments, empty netloc, fragments)."""
    import pandas as pd

    base = V2 + "/p1"
    got = canonicalize_urls.func(
        pd.Series([base] * len(hrefs)), pd.Series(hrefs, dtype="object")
    )
    want = [canonicalize(base, h) for h in hrefs]
    assert list(got) == want, hrefs


def test_onion_pattern_python_and_spark_agree(spark):
    urls = [
        V2 + "/p1",
        V3,
        "http://short.onion/x",
        "https://example0.com/p0",
        "http://" + "a" * 16 + ".onion",
        "http://" + "a" * 17 + ".onion/x",
        "ftp://" + "a" * 16 + ".onion",
        "http://" + "A2" * 8 + ".onion?q=1",
    ]
    pat = re.compile(ONION_URL_PATTERN)
    df = spark.createDataFrame([(u,) for u in urls], "url string").select(
        "url", onion_url_col(F.col("url")).alias("m")
    )
    got = {r.url: r.m for r in df.collect()}
    for u in urls:
        assert bool(pat.match(u)) == got[u], u
