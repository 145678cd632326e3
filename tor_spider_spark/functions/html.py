"""Raw-HTML link extraction (SURVEY §2.9 #3 — the optional UDF for users
pointing the engine at real page bodies instead of the synthetic corpus's
precomputed out_links).

Reference parity: colly's ``OnHTML("a[href]", ...)`` handler walks the
parsed DOM and visits every anchor's href (reference spider/spider.go:
297-302 for the job collector, :346-354 for the seed collector). This is
a real HTML parse (stdlib ``html.parser``), not a regex scrape: attribute
order, quoting style, interleaved attributes and entity references
(``&amp;`` → ``&``) are handled the way a browser-grade tokenizer does.

UDF-budget note (SURVEY §2.9): HTML tokenization is genuinely
non-relational — this joins canonicalize/image-decode/bloom/robots in the
sanctioned Python set. It is Arrow-batched (pandas UDF); the per-document
parse is CPU-bound Python, so at 100 TB it belongs on the biggest
executor pool, downstream of every pushed-down filter."""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType


class _AnchorCollector(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)
                    break  # first href attribute wins, as in browsers


def extract_links_py(html: str | None) -> list[str] | None:
    """Pure function (shared with tests/oracles): hrefs of <a> tags, in
    document order, entities unescaped; None in → None out."""
    if html is None:
        return None
    p = _AnchorCollector()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # truncated/malformed markup: keep what was parsed
    return p.hrefs


@pandas_udf(ArrayType(StringType()))
def extract_links(html: pd.Series) -> pd.Series:
    return pd.Series([extract_links_py(h) for h in html], dtype="object")
