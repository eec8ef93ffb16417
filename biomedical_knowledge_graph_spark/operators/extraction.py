"""HTML→text extraction (S1 analogue).

The reference's S1 is a line-state-machine OBO stanza parser
(kg_scripts/go_kg_builder.py:358-511) — driver-side, row-at-a-time Python.
In this engine the per-document parse is HTML→text over the ``pages.html``
binary column (BASELINE.json input_hint), executed as an Arrow-vectorized
pandas UDF so no per-row Python crosses the JVM boundary.

The hard invariant (SURVEY.md §7.4-1): extracted ``text`` must be
**byte-identical per url** across runs and cluster sizes. Therefore
``extract_text`` is a *pure function of the html bytes only* — a pinned,
dependency-free algorithm (regex state, no environment-sensitive parser
libraries). Goldens are asserted in tests/test_extraction.py.

Pinned algorithm (documented so it can never drift silently):
1. decode bytes as UTF-8 with ``errors="replace"``;
2. drop ``<script>``/``<style>``/``<!-- -->`` blocks (case-insensitive,
   non-greedy, dotall);
3. replace ``<br>`` and closing block tags (</p> </div> </li> </h1..6>
   </tr>) with ``\n``, every other tag with a single space;
4. unescape the five XML entities ``&amp; &lt; &gt; &quot; &#39;`` and
   ``&nbsp;`` (→ space) — nothing else;
5. per line: collapse runs of spaces/tabs to one space, strip;
6. drop empty lines; join with ``\n``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_RE_DROP = re.compile(
    r"(?is)<script\b.*?</script\s*>|<style\b.*?</style\s*>|<!--.*?-->"
)
_RE_NEWLINE_TAGS = re.compile(
    r"(?i)<br\s*/?>|</(?:p|div|li|h[1-6]|tr)\s*>"
)
_RE_ANY_TAG = re.compile(r"(?s)<[^>]*>")
_RE_SPACES = re.compile(r"[ \t\r\f\v]+")

_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last, so freshly produced '&' is not re-expanded
)


def extract_text(html: bytes | None) -> str:
    """Pure function html-bytes → text. See module docstring for the pinned
    algorithm; any change here is a breaking format change."""
    if html is None:
        return ""
    s = html.decode("utf-8", errors="replace")
    s = _RE_DROP.sub(" ", s)
    s = _RE_NEWLINE_TAGS.sub("\n", s)
    s = _RE_ANY_TAG.sub(" ", s)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    lines = []
    for line in s.split("\n"):
        line = _RE_SPACES.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched wrapper around :func:`extract_text`."""
    return html.map(extract_text)


def html_to_text(col: str | Column = "html") -> Column:
    """Column expression: extracted text from an html binary column."""
    return extract_text_udf(F.col(col) if isinstance(col, str) else col)


def extract_pages(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pages(url, warc_ts, html, lang, ...) → docs(url, warc_ts, text, lang).

    Projects the heavy ``html`` column away immediately after extraction so
    downstream shuffles never carry raw bytes (SURVEY.md §4 row 1: keep the
    html column out of the shuffle).
    """
    out = pages.withColumn(text_col, html_to_text("html"))
    return out.select([c for c in out.columns if c != "html"])
