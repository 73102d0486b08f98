"""Deletion-neighborhood fuzzy matching (operators/fuzzy.py)."""

from __future__ import annotations

from financial_data_stream_processing_engine_spark.operators.fuzzy import fuzzy_pairs_edit1


def test_fuzzy_edit1_complete_on_planted_typos(spark):
    rows = [
        (1, "chromatic"),
        (2, "chromtic"),    # deletion  → dist 1
        (3, "chromatik"),   # substitution → dist 1
        (4, "chromatics"),  # insertion → dist 1
        (5, "chromatography"),  # far
        (6, "chromatic"),   # exact duplicate → dist 0
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_pairs_edit1(df, "id", "name").collect()
    }
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 4)] == 1
    assert got[(1, 6)] == 0
    # transitively-1 pairs that are actually 2 apart must be absent
    assert (2, 3) not in got and (3, 4) not in got
    assert all(b != 5 and a != 5 for a, b in got)


def test_fuzzy_edit1_no_duplicate_pairs(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaa")], "id long, name string"
    )
    # identical strings share every deletion key — the pair must still
    # appear exactly once
    rows = fuzzy_pairs_edit1(df, "id", "name").collect()
    assert len(rows) == 1 and rows[0].dist == 0
