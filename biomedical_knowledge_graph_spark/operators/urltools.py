"""URL canonicalization for webtext KG pipelines.

Common-Crawl-style corpora key everything on the page URL; before joins,
dedup, or per-domain skew handling the URL must be canonicalized — raw
crawl URLs differ in case, fragments, tracking parameters and port
spellings while naming the same resource. The north-rule pipeline salts
joins by head DOMAIN, so the registrable-domain extraction here is the
input to that skew strategy.

Everything is built-in JVM column functions (regexp + higher-order array
ops) in ONE projection — zero shuffle, zero Python; the 100 TB path is
the scan itself. Every regex is RE2-compatible (no backrefs/lookaround)
and mirrored verbatim in the DuckDB oracle SQL.

The registrable-domain (eTLD+1) extraction is a documented HEURISTIC: a
small built-in set of second-level public suffixes (co/com/org/net/ac/
gov/edu + 2-letter ccTLD) instead of the full Mozilla public-suffix list.
A production deployment broadcasts the real list as a dim table and
joins; the column shape and the plan are identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that never identify a resource (tracking/attribution)
TRACKING_PARAMS: tuple[str, ...] = (
    "utm_source",
    "utm_medium",
    "utm_campaign",
    "utm_term",
    "utm_content",
    "fbclid",
    "gclid",
    "ref",
)

# second-level labels that act as public suffixes under a 2-letter ccTLD
# (heuristic subset; see module docstring)
_SECOND_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co", "com", "org", "net", "ac", "gov", "edu",
)


def _host(url: Column) -> Column:
    return F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?([^/:?#]+)", 1)
    )


def registrable_domain(host: Column) -> Column:
    """eTLD+1 heuristic: last 2 labels, or last 3 when the TLD is
    2 letters and the second-level label is a known public suffix
    (site.co.uk → site.co.uk, www.site.com → site.com)."""
    labels = F.split(host, r"\.", -1)
    n = F.size(labels)
    tld = F.element_at(labels, -1)
    second = F.element_at(labels, -2)
    take3 = (
        (n >= 3)
        & (F.length(tld) == 2)
        & second.isin(*_SECOND_LEVEL_SUFFIXES)
    )
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return F.when(n <= 1, host).when(take3, last3).otherwise(last2)


def normalize_urls(
    df: DataFrame, url_col: str = "url", id_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """(ids..., url_norm, host, domain, path, n_query_params).

    Normalization: scheme + host lowercased, ports and fragments
    dropped, tracking query parameters (TRACKING_PARAMS) stripped,
    empty path → '/'. Path and surviving query keep their
    original case and order (lowercasing a path changes the resource on
    case-sensitive servers)."""
    url = F.col(url_col)
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    host = _host(url)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    path = F.when(path == "", "/").otherwise(path)
    # the query is only what appears BEFORE any fragment: a bare
    # '\?(...)' would match a '?' INSIDE the fragment and leak fragment
    # content into url_norm (review r6: 'p#sec?x=1' reported x=1 as a
    # surviving parameter)
    rawq = F.regexp_extract(url, r"^[^#]*\?([^#]*)", 1)
    params = F.filter(
        F.split(rawq, "&", -1),
        lambda p: (F.length(p) > 0)
        & ~F.lower(F.regexp_extract(p, r"^([^=]*)", 1)).isin(
            *TRACKING_PARAMS
        ),
    )
    query = F.array_join(params, "&")
    url_norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", "").otherwise(F.concat(F.lit("?"), query)),
    )
    return df.select(
        *id_cols,
        url_norm.alias("url_norm"),
        host.alias("host"),
        registrable_domain(host).alias("domain"),
        path.alias("path"),
        F.size(params).cast("long").alias("n_query_params"),
    )
