"""Bigram-LM quality scoring: hand-computed add-one probabilities on a
tiny corpus, edge cases (no-transition docs, unseen contexts), and the
bucketing contract (operators/lm.py)."""

from __future__ import annotations

import pytest

from financial_data_stream_processing_engine_spark.operators import lm


def _score(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = lm.lm_quality_score(df, **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_hand_computed_bigram_probabilities(spark):
    # reference slice = doc 0 only: "a b a b a c"
    #   c(a,b)=2  c(b,a)=2  c(a,c)=1 ;  c(a·)=3  c(b·)=2 ;  V=3
    rows = [
        (0, "a b a b a c"),
        (1, "a b c"),   # P(b|a)=(2+1)/(3+3)=0.5, P(c|b)=(0+1)/(2+3)=0.2
        (2, "z"),       # no transitions
        (3, "x y"),     # unseen context: P=(0+1)/(0+3)=1/3
    ]
    got = _score(spark, rows)
    r1 = got[1]
    assert r1["n_bigrams"] == 2 and r1["n_unseen_bigrams"] == 1
    assert r1["mean_tp"] == pytest.approx((0.5 + 0.2) / 2, abs=1e-9)
    r2 = got[2]
    assert (r2["n_bigrams"], r2["n_unseen_bigrams"]) == (0, 0)
    assert r2["mean_tp"] is None and r2["lm_bucket"] == "und"
    r3 = got[3]
    assert r3["n_unseen_bigrams"] == 1
    # 1/3 quantized to the 1e-9 grid: floor(1/3·1e9)/1e9
    assert r3["mean_tp"] == pytest.approx(0.333333333, abs=1e-12)
    # reference doc scores itself too (train slice is not excluded)
    assert got[0]["n_bigrams"] == 5 and got[0]["n_unseen_bigrams"] == 0


def test_bucket_thresholds_and_custom_ref_filter(spark):
    from pyspark.sql import functions as F

    rows = [(10, "a b"), (11, "a b"), (12, "q r")]
    # train on doc 10 only: c(a,b)=1, c(a·)=1, V={a,b} → P(b|a)=2/3
    df_filter = F.col("doc_id") == 10
    got = _score(spark, rows, ref_filter=df_filter)
    assert got[11]["mean_tp"] == pytest.approx(2 / 3, abs=1e-9)
    assert got[12]["n_unseen_bigrams"] == 1
    # fixture-corpus thresholds: 2/3 ≥ 3.5e-2 → 'high'
    assert got[11]["lm_bucket"] == "high"
    # bucket labels honor custom thresholds end-to-end
    pc, cc, vs = lm.bigram_lm_counts(
        _df(spark, [(10, "a b")]), text_col="text"
    )
    out = lm.with_lm_score(
        _df(spark, rows), pc, cc, vs, buckets=(("high", 0.9), ("mid", 0.6))
    )
    by_id = {r["doc_id"]: r for r in out.collect()}
    assert by_id[11]["lm_bucket"] == "mid"    # 2/3 in [0.6, 0.9)
    assert by_id[12]["lm_bucket"] == "low"    # unseen floor 1/2 < 0.6


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_empty_and_whitespace_docs(spark):
    rows = [(0, "a b c d"), (1, ""), (2, "   ")]
    got = _score(spark, rows)
    assert got[1]["lm_bucket"] == "und" and got[1]["n_bigrams"] == 0
    # "   " splits into empty-string tokens → transitions exist and are
    # scored like any unseen token (deterministic, same in the oracle)
    assert got[2]["n_bigrams"] > 0
