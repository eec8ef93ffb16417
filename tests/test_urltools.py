"""URL canonicalization (operators/urltools.py)."""

from __future__ import annotations

from biomedical_knowledge_graph_spark.operators.urltools import (
    normalize_urls,
)


def test_normalize_urls_hand_checked(spark):
    rows = [
        (1, "HTTPS://WWW.Example.COM:443/Path/One?utm_source=x&id=7#frag"),
        (2, "http://sub.site.co.uk/a/b?ref=z&q=1&fbclid=abc"),
        (3, "https://bare.org"),
        (4, "https://user:pw@host.net:8080/p?utm_campaign=c"),
        (5, "https://single"),
        (6, "http://a.b.co.jp/x"),  # 'co' under 2-letter ccTLD -> last-3
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.doc_id: r for r in normalize_urls(df).collect()}

    r1 = out[1]
    assert r1.url_norm == "https://www.example.com/Path/One?id=7"
    assert r1.host == "www.example.com"
    assert r1.domain == "example.com"
    assert (r1.path, r1.n_query_params) == ("/Path/One", 1)

    r2 = out[2]
    assert r2.url_norm == "http://sub.site.co.uk/a/b?q=1"
    assert r2.domain == "site.co.uk"  # eTLD+1 through the co.uk suffix

    r3 = out[3]
    assert r3.url_norm == "https://bare.org/"  # empty path -> '/'
    assert (r3.domain, r3.n_query_params) == ("bare.org", 0)

    r4 = out[4]
    assert r4.host == "host.net"  # userinfo and port stripped
    assert r4.url_norm == "https://host.net/p"

    assert out[5].domain == "single"  # single-label host is its own domain
    assert out[6].domain == "b.co.jp"  # registrable under the co.jp suffix

    # zero shuffle: the whole op is one projection
    plan = normalize_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_fragment_query_not_leaked(spark):
    """A '?' inside the fragment is NOT a query (review r6: 'p#sec?x=1'
    leaked x=1 into url_norm as a surviving parameter)."""
    from biomedical_knowledge_graph_spark.operators.urltools import (
        normalize_urls,
    )

    df = spark.createDataFrame(
        [
            (1, "http://a.com/p#sec?x=1"),
            (2, "http://a.com/p?x=1#sec?y=2"),
        ],
        "doc_id long, url string",
    )
    rows = {r.doc_id: r for r in normalize_urls(df).collect()}
    assert rows[1].url_norm == "http://a.com/p"
    assert rows[1].n_query_params == 0
    assert rows[2].url_norm == "http://a.com/p?x=1"
    assert rows[2].n_query_params == 1
