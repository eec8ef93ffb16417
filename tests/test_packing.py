

def test_chunk_windows_hand_checked(spark):
    """12-token doc, window 5, stride 3: starts 0,3,6,9 — full coverage,
    short tail; empty and single-token docs."""
    from biomedical_knowledge_graph_spark.operators.packing import (
        chunk_windows,
    )

    toks = " ".join(f"t{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, toks), (2, ""), (3, None), (4, "only")],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text)
        for r in chunk_windows(df, window=5, stride=3).collect()
    }
    assert rows == {
        (1, 0): (5, "t0 t1 t2 t3 t4"),
        (1, 1): (5, "t3 t4 t5 t6 t7"),
        (1, 2): (5, "t6 t7 t8 t9 t10"),
        (1, 3): (3, "t9 t10 t11"),
        (4, 0): (1, "only"),
    }


def test_chunk_windows_guards_and_plan(spark):
    import pytest
    from biomedical_knowledge_graph_spark.operators.packing import (
        chunk_windows,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_windows(df, window=4, stride=5)
    with pytest.raises(ValueError, match="stride"):
        chunk_windows(df, window=4, stride=0)
    plan = (
        chunk_windows(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
