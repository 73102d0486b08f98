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
    rows = [(0, "a b c d"), (1, ""), (2, "   "), (3, "a  b c d")]
    got = _score(spark, rows)
    assert got[1]["lm_bucket"] == "und" and got[1]["n_bigrams"] == 0
    # "   " has no real tokens: empty-string tokens are dropped BEFORE
    # pairing (the vocabulary excludes '' too), so no transitions
    assert got[2]["n_bigrams"] == 0 and got[2]["lm_bucket"] == "und"
    # whitespace formatting must not change transition counts: the
    # double-spaced doc scores identically to its single-spaced twin
    assert got[3]["n_bigrams"] == got[0]["n_bigrams"] == 3
    assert got[3]["mean_tp"] == got[0]["mean_tp"]


def _nb(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = lm.nb_lang_classifier(df, **kw)
    return {r["doc_id"]: r for r in out.collect()}


def test_nb_hand_computed_likelihood_deltas(spark):
    # train slice = ids not divisible by 5:
    #   id 1 "a a b" (en)  → pos tokens a,a,b  (tot_pos=3)
    #   id 2 "b c"   (de)  → neg tokens b,c    (tot_neg=2)   V={a,b,c}=3
    # per-token deltas:
    #   a: 3/6 − 1/5 =  0.3
    #   b: 2/6 − 2/5 = −0.0666…
    #   c: 1/6 − 2/5 = −0.2333…
    #   OOV: 1/6 − 1/5 = −0.0333…
    rows = [
        (1, "a a b", "en"),
        (2, "b c", "de"),
        (0, "a b", "fr"),   # holdout: mean(0.3, −0.0666…) > 0 → 'en'
        (5, "d", "en"),     # holdout, OOV-only → 'other'
        (10, "", "en"),     # holdout, no tokens → 'und'
    ]
    got = _nb(spark, rows)
    r0 = got[0]
    assert r0["is_holdout"] and r0["label_bin"] == "other"
    assert r0["n_tokens"] == 2 and r0["n_oov_tokens"] == 0
    assert r0["mean_delta"] == pytest.approx((0.3 - 1 / 15) / 2, abs=2e-9)
    assert r0["nb_pred"] == "en"
    r5 = got[5]
    assert r5["n_oov_tokens"] == 1 and r5["nb_pred"] == "other"
    assert r5["mean_delta"] == pytest.approx(1 / 6 - 1 / 5, abs=2e-9)
    r10 = got[10]
    assert r10["n_tokens"] == 0 and r10["nb_pred"] == "und"
    assert r10["mean_delta"] is None and r10["label_bin"] == "en"
    # train docs are scored too (model sees its own slice)
    assert got[1]["nb_pred"] == "en" and got[1]["label_bin"] == "en"


def test_nb_learns_a_separable_corpus(spark):
    """Learnability golden test (the fixture's synthetic text carries
    no lang signal, so — like text_language_id — accuracy is pinned on
    a handcrafted corpus): two 'languages' drawing from overlapping
    but differently-weighted vocabularies; the trained model must
    classify the held-out slice ≥90% correctly."""
    import random

    rng = random.Random(7)
    en_vocab = ["the", "quick", "brown", "fox", "jumps", "lazy", "dog", "and"]
    xx_vocab = ["der", "schnelle", "braune", "fuchs", "springt", "faul", "und"]
    rows = []
    for i in range(200):
        pos = i % 2 == 0
        main = en_vocab if pos else xx_vocab
        other = xx_vocab if pos else en_vocab
        toks = [
            main[rng.randrange(len(main))]
            if rng.random() < 0.8
            else other[rng.randrange(len(other))]
            for _ in range(12)
        ]
        rows.append((i, " ".join(toks), "en" if pos else "de"))
    got = _nb(spark, rows)
    hold = [r for r in got.values() if r["is_holdout"]]
    acc = sum(r["nb_pred"] == r["label_bin"] for r in hold) / len(hold)
    assert len(hold) == 40
    assert acc >= 0.9, f"holdout accuracy {acc:.2f}"


def test_bpe_train_matches_pure_python_reference(spark):
    """The distributed trainer must reproduce a from-scratch reference
    loop (overlapping pair counts, deterministic tie-breaks,
    replace-to-fixpoint merges) on a corpus exercising cascaded
    merges and ties."""
    import re
    from collections import Counter

    from financial_data_stream_processing_engine_spark.operators.text import (
        bpe_train_merges,
    )

    texts = [
        "the scan was slow slow slow",
        "order the batch then scan the batch",
        "hash join beats sort merge join here",
        "the the the window value key",
        "scan order scan order scan",
        "aaa aaaa aa",  # overlapping-adjacency counting
    ]

    def reference(texts, k):
        vocab = Counter()
        for t in texts:
            for w in re.findall("[a-z]+", t.lower()):
                vocab[w] += 1
        words = {w: list(w) for w in vocab}
        merges = []
        for _ in range(k):
            pairs = Counter()
            for w, toks in words.items():
                for i in range(len(toks) - 1):
                    pairs[(toks[i], toks[i + 1])] += vocab[w]
            if not pairs:
                break
            (a, b), cnt = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((a, b, cnt))
            # replace-to-fixpoint — the trainer/tokenizer-shared merge
            # semantic (see test_property_iterative.py)
            pat, rep = f"|{a}|{b}|", f"|{a}{b}|"
            for w, toks in words.items():
                s = "|" + "|".join(toks) + "|"
                while pat in s:
                    s = s.replace(pat, rep)
                words[w] = s.strip("|").split("|")
        return merges

    k = 8
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["left_tok"], r["right_tok"], r["pair_count"])
        for r in bpe_train_merges(df, k=k).orderBy("rank").collect()
    ]
    assert got == reference(texts, k)


def test_bpe_train_long_same_pair_runs_match_reference(spark):
    """The r18 retry-path rewrite (ADVICE r17 #2: extra replace passes
    probe convergence cheaply instead of re-paying the pair argmax)
    must leave the merge sequence bit-identical on the corpus shape
    that exercises it hardest — long same-symbol runs, where one
    replace pass leaves instances and a round loops several times."""
    import re
    from collections import Counter

    from financial_data_stream_processing_engine_spark.operators.text import (
        bpe_train_merges,
    )

    texts = [
        "xxxxxxxxx xxxxxx xxx",        # 9/6/3-run: multi-pass (x,x) rounds
        "abababab abab ab",            # alternating pair cascade
        "zzzz yyyy zzzz yyyy zz yy",
    ]

    def reference(texts, k):
        vocab = Counter()
        for t in texts:
            for w in re.findall("[a-z]+", t.lower()):
                vocab[w] += 1
        words = {w: list(w) for w in vocab}
        merges = []
        for _ in range(k):
            pairs = Counter()
            for w, toks in words.items():
                for i in range(len(toks) - 1):
                    pairs[(toks[i], toks[i + 1])] += vocab[w]
            if not pairs:
                break
            (a, b), cnt = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((a, b, cnt))
            pat, rep = f"|{a}|{b}|", f"|{a}{b}|"
            for w, toks in words.items():
                s = "|" + "|".join(toks) + "|"
                while pat in s:
                    s = s.replace(pat, rep)
                words[w] = s.strip("|").split("|")
        return merges

    k = 6
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["left_tok"], r["right_tok"], r["pair_count"])
        for r in bpe_train_merges(df, k=k).orderBy("rank").collect()
    ]
    assert got == reference(texts, k)


def test_bpe_train_stops_when_pairs_exhausted(spark):
    from financial_data_stream_processing_engine_spark.operators.text import (
        bpe_train_merges,
    )

    # single-char words only: no adjacent pairs ever exist
    df = spark.createDataFrame([(0, "a b c a")], "doc_id long, text string")
    assert bpe_train_merges(df, k=5).count() == 0
    # one two-char word: exactly one learnable merge
    df2 = spark.createDataFrame([(0, "ab ab c")], "doc_id long, text string")
    rows = bpe_train_merges(df2, k=5).collect()
    assert [(r["left_tok"], r["right_tok"], r["pair_count"]) for r in rows] == [
        ("a", "b", 2)
    ]


def test_bpe_train_then_tokenize_chain(spark):
    """Learned merges must drive the applying tokenizer correctly:
    on a corpus with one dominant pair, the chain yields the merged
    token with the exact corpus count."""
    from financial_data_stream_processing_engine_spark.operators.text import (
        bpe_token_counts,
        bpe_train_merges,
    )

    df = spark.createDataFrame(
        [(0, "ab ab ab c"), (1, "ab cd")], "doc_id long, text string"
    )
    learned = bpe_train_merges(df, k=2).orderBy("rank").collect()
    merges = tuple((r["left_tok"], r["right_tok"]) for r in learned)
    # round 1 merges (a,b) weight 4; round 2 merges (c,d) weight 1
    assert merges == (("a", "b"), ("c", "d"))
    counts = {
        r["token"]: r["n_occurrences"]
        for r in bpe_token_counts(df, merges=merges).collect()
    }
    assert counts == {"ab": 4, "c": 1, "cd": 1}


def test_ols_probe_matches_numpy_lstsq(spark):
    """The Cramer solve over exact quantized moments must agree with
    numpy's least-squares on the same quantized design matrix (tiny
    rtol: different but both-correct float paths), residuals must
    satisfy target − pred ≡ residual exactly by construction, and
    NULL-feature rows are excluded from fit and output."""
    import numpy as np

    from financial_data_stream_processing_engine_spark.operators.lm import ols_probe

    rows = [
        (i, 0.1 * (i % 7), 0.05 * (i % 5), 0.02 * (i % 11),
         0.3 + 0.5 * 0.1 * (i % 7) - 0.2 * 0.05 * (i % 5) + 0.01 * (i % 3))
        for i in range(40)
    ] + [(100, None, 0.1, 0.1, 0.5)]
    df = spark.createDataFrame(
        rows, "doc_id long, x1 double, x2 double, x3 double, y double"
    )
    got = {r["doc_id"]: r for r in ols_probe(
        df, feature_cols=("x1", "x2", "x3"), target_col="y", id_col="doc_id"
    ).collect()}
    assert 100 not in got and len(got) == 40
    # numpy fit on the SAME quantized integers (the probe's 1e-6 grid)
    import math
    qi = lambda v: math.floor(v * 1e6)  # noqa: E731
    Q = np.array([[1e6, qi(r[1]), qi(r[2]), qi(r[3])] for r in rows[:40]])
    qy = np.array([qi(r[4]) for r in rows[:40]], dtype=float)
    w = np.linalg.lstsq(Q, qy, rcond=None)[0]
    any_row = got[0]
    np.testing.assert_allclose(
        [any_row["c0"], any_row["c1"], any_row["c2"], any_row["c3"]],
        w, rtol=1e-6,
    )
    for i, r in enumerate(rows[:40]):
        g = got[r[0]]
        assert g["target"] == qi(r[4]) * 1e-6
        # pred + residual reconstructs the target on the grid exactly
        assert abs((g["pred"] + g["residual"]) - g["target"]) < 1e-12


def test_ols_probe_singular_gram_yields_null_coefficients(spark):
    """A collinear design (x2 = x1) has det = 0 — the probe must
    return NULL coefficients via the NULLIF guard, not crash or
    divide by zero."""
    from financial_data_stream_processing_engine_spark.operators.lm import ols_probe

    rows = [(i, 0.1 * i, 0.1 * i, 0.0, 1.0) for i in range(10)]
    df = spark.createDataFrame(
        rows, "doc_id long, x1 double, x2 double, x3 double, y double"
    )
    out = ols_probe(
        df, feature_cols=("x1", "x2", "x3"), target_col="y", id_col="doc_id"
    ).collect()
    assert len(out) == 10
    assert all(r["c0"] is None and r["pred"] is None for r in out)
