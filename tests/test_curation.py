"""Unit tests for the corpus-curation operators (chunking, packing,
contamination, mixture sampling, quotas) on hand-built corpora where
the expected output is computable by inspection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_data_stream_processing_engine_spark.io_utils import load_table
from financial_data_stream_processing_engine_spark.operators import curation


def _docs(spark, rows):
    """rows: (doc_id, text[, source[, lang]])"""
    full = [
        (r[0], r[1], r[2] if len(r) > 2 else "srcA", r[3] if len(r) > 3 else "en")
        for r in rows
    ]
    return spark.createDataFrame(
        full, "doc_id long, text string, source string, lang string"
    )


def test_chunking_windows_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = _docs(spark, [(1, text), (2, "a b")])
    out = {
        (r.doc_id, r.chunk_idx): (r.chunk_tokens, r.chunk_text)
        for r in curation.chunk_documents(df, window=4, stride=3).collect()
    }
    # doc 1: 10 tokens, window 4, stride 3 -> starts 0,3,6 cover to 9;
    # n_chunks = 1 + ceil(6/3) = 3
    assert out[(1, 0)] == (4, "w0 w1 w2 w3")
    assert out[(1, 1)] == (4, "w3 w4 w5 w6")
    assert out[(1, 2)] == (4, "w6 w7 w8 w9")
    assert (1, 3) not in out
    # doc 2: shorter than one window -> exactly one (short) chunk
    assert out[(2, 0)] == (2, "a b")
    assert (2, 1) not in out


def test_chunking_null_text_keeps_the_document(spark):
    """A NULL-text doc must still yield its at-least-one-chunk row —
    explode of a NULL sequence would silently drop the doc_id."""
    df = _docs(spark, [(1, "a b"), (2, None)])
    out = {r.doc_id: (r.chunk_idx, r.chunk_text) for r in
           curation.chunk_documents(df, window=4, stride=3).collect()}
    assert out[2] == (0, "")
    seg = curation.dedup_segments(df, window=4)
    assert {r.doc_id for r in seg.collect()} == {1, 2}


def test_chunking_rejects_bad_params(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        curation.chunk_documents(df, window=4, stride=0)


def test_packing_greedy_reset_and_oversize(spark):
    # one source, force a single shard by using ids that land anywhere:
    # group key includes shard, so compute expected per (shard) group
    rows = [(i, " ".join(["t"] * n)) for i, n in enumerate([3, 3, 3, 10, 2, 2])]
    df = _docs(spark, rows)
    out = curation.pack_sequences(df, budget=6).collect()
    by_group: dict = {}
    for r in out:
        by_group.setdefault((r.source, r.shard), []).append(r)
    for grp in by_group.values():
        grp.sort(key=lambda r: r.doc_id)
        acc, idx = 0, -1
        for r in grp:
            n = int(r.n_tokens)
            if idx < 0 or acc + n > 6:
                idx += 1
                acc = n
            else:
                acc += n
            assert r.pack_idx == idx, (r, grp)
    # oversize doc (10 tokens > budget 6) sits alone in its pack
    big = next(r for r in out if r.n_tokens == 10)
    peers = [
        r
        for r in out
        if r.source == big.source and r.shard == big.shard and r.pack_idx == big.pack_idx
    ]
    assert [p.doc_id for p in peers] == [big.doc_id]


def test_contamination_flags_overlap(spark):
    df = _docs(
        spark,
        [
            (0, "alpha beta gamma delta"),        # probe (id % 2 == 0 below)
            (1, "alpha beta gamma epsilon"),      # shares shingle 'alpha beta gamma'
            (3, "zeta eta theta iota"),           # disjoint
        ],
    )
    out = {
        r.doc_id: r
        for r in curation.contamination_overlap(
            df, probe_pred=F.col("doc_id") % 2 == 0, n=3, flag_ratio=0.5
        ).collect()
    }
    assert set(out) == {1, 3}
    assert out[1].n_overlap == 1 and out[1].n_shingles == 2
    assert out[1].contaminated is True  # ratio 0.5 >= 0.5
    assert out[3].n_overlap == 0 and out[3].contaminated is False


def test_mixture_sample_rates_and_unlisted_drop(spark):
    rows = [(i, "x", f"src{i % 2}") for i in range(200)]
    df = _docs(spark, rows)
    kept = curation.mixture_sample(df, {"src0": 16}).collect()
    # src0 at 16/16 keeps every src0 row; src1 unlisted -> dropped
    assert {r.source for r in kept} == {"src0"}
    assert len(kept) == 100
    none_kept = curation.mixture_sample(df, {"src0": 0})
    assert none_kept.count() == 0


def test_redact_pii_counts_and_placeholders(spark):
    from financial_data_stream_processing_engine_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@test.org or 10.0.0.1 thanks"),
            (2, "call +44-123-4567 and 555-123-4567"),
            (3, "nothing to see"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (out[1].n_email, out[1].n_ipv4) == (1, 1)
    # counts must equal EMITTED placeholders: an IPv4 the loose phone
    # pattern also matches is typed <IP> once, never double-counted
    ip = spark.createDataFrame(
        [(9, "server at 192.168.100.42 down")], "doc_id long, text string"
    )
    r9 = redact_pii(ip).collect()[0]
    assert (r9.n_ipv4, r9.n_phone) == (1, 0)
    assert r9.text_redacted == "server at <IP> down"
    assert "<EMAIL>" in out[1].text_redacted and "<IP>" in out[1].text_redacted
    assert "a.b+c@test.org" not in out[1].text_redacted
    assert out[2].n_phone == 2 and out[2].text_redacted.count("<PHONE>") == 2
    assert out[3].text_redacted == "nothing to see"
    assert (out[3].n_email, out[3].n_phone, out[3].n_ipv4) == (0, 0, 0)


def test_repetition_stats_flags_looping_text(spark):
    from financial_data_stream_processing_engine_spark.operators.text import (
        repetition_stats,
    )

    looping = " ".join(["spam ham"] * 10)         # 'ham spam ham' repeats
    varied = " ".join(f"w{i}" for i in range(20))  # all 3-grams unique
    df = spark.createDataFrame(
        [(1, looping), (2, varied)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in repetition_stats(df, flag_ratio=0.3).collect()}
    assert out[1].repetitive and out[1].top_ngram_count >= 9
    assert not out[2].repetitive and out[2].top_ngram_count == 1
    assert out[2].n_ngrams == 18


def test_select_token_budget_keeps_whole_top_buckets(spark):
    # quality 0.95 bucket: 3000 tokens; 0.85: 4000; 0.75: 3000
    rows = (
        [(i, 1000, 0.95) for i in range(3)]
        + [(10 + i, 1000, 0.85) for i in range(4)]
        + [(20 + i, 1000, 0.75) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, quality_score double")
    kept = curation.select_token_budget(df, budget=7500).collect()
    # 95-bucket (3000) + 85-bucket (4000) fit; adding the 75-bucket
    # (3000 more) would blow the budget -> whole-bucket under-fill
    assert sorted(r.doc_id for r in kept) == [0, 1, 2, 10, 11, 12, 13]
    assert {r.bucket for r in kept} == {95, 85}
    # a budget below the top bucket keeps nothing (never partial buckets)
    assert curation.select_token_budget(df, budget=2000).count() == 0


def test_quota_cap_deterministic(spark):
    rows = [(i, "x", "s", "en" if i < 30 else "de") for i in range(50)]
    df = _docs(spark, rows)
    out1 = curation.quota_cap(df, per_group=10, group_col="lang")
    out2 = curation.quota_cap(df.repartition(7), per_group=10, group_col="lang")
    got1 = sorted((r.lang, r.doc_id) for r in out1.collect())
    got2 = sorted((r.lang, r.doc_id) for r in out2.collect())
    assert got1 == got2  # layout-independent selection
    per = {}
    for lang, _ in got1:
        per[lang] = per.get(lang, 0) + 1
    assert per == {"en": 10, "de": 10}


def test_train_split_partitions_and_stability(spark):
    df = _docs(spark, [(i, f"doc {i}") for i in range(200)])
    out = curation.train_split(df, valid_16ths=1, test_16ths=2)
    rows = {r.doc_id: r.split for r in out.collect()}
    # total function: every doc gets exactly one of the three labels
    assert set(rows.values()) <= {"train", "valid", "test"}
    assert len(rows) == 200
    counts = {s: list(rows.values()).count(s) for s in ("train", "valid", "test")}
    # 13/1/2 sixteenths with md5 uniformity — loose bounds, no flake
    assert counts["train"] > counts["test"] > 0
    # content-addressed: a permuted, re-partitioned corpus splits identically
    again = {
        r.doc_id: r.split
        for r in curation.train_split(df.orderBy(F.rand(7)).repartition(7)).collect()
    }
    assert again == rows


def test_dedup_segments_drops_repeats_keeps_order(spark):
    seg = " ".join(f"s{i}" for i in range(10))  # one exact 10-token segment
    uniq = " ".join(f"u{i}" for i in range(10))
    tail = " ".join(f"t{i}" for i in range(10))
    df = _docs(spark, [(1, seg + " " + uniq), (2, seg + " " + tail)])
    out = {r.doc_id: r for r in curation.dedup_segments(df, window=10).collect()}
    # doc 1 (smaller id) keeps both segments, in original order
    assert out[1].n_segments == 2 and out[1].n_kept == 2
    assert out[1].dedup_text == seg + " " + uniq
    # doc 2 loses the shared segment but keeps its own tail
    assert out[2].n_segments == 2 and out[2].n_kept == 1
    assert out[2].dedup_text == tail


def test_dedup_segments_doc_fully_duplicated(spark):
    seg = " ".join(f"x{i}" for i in range(10))
    df = _docs(spark, [(1, seg), (2, seg)])
    out = {r.doc_id: r for r in curation.dedup_segments(df, window=10).collect()}
    assert out[1].n_kept == 1 and out[1].dedup_text == seg
    # the later doc loses everything yet still appears, empty
    assert out[2].n_kept == 0 and out[2].dedup_text == ""


def test_tfidf_surfaces_planted_rare_term(spark):
    from financial_data_stream_processing_engine_spark.operators import text as T

    common = "alpha beta gamma"
    df = _docs(
        spark,
        [(1, common + " zzyzx zzyzx"), (2, common), (3, common), (4, common)],
    )
    out = T.tfidf_top_terms(df, k=1).collect()
    top = {r.doc_id: (r.term, r.tf, r.df) for r in out}
    # the planted rare term dominates doc 1 (tf=2, df=1, N=4 -> score 8)
    assert top[1] == ("zzyzx", 2, 1)
    # ubiquitous terms tie at score 1 -> alphabetical winner
    assert top[2][0] == "alpha"


def test_tfidf_custom_id_column(spark):
    from financial_data_stream_processing_engine_spark.operators import text as T

    df = spark.createDataFrame(
        [(7, "alpha beta zzyzx zzyzx"), (8, "alpha beta")],
        "item_id long, text string",
    )
    out = T.tfidf_top_terms(df, k=1, id_col="item_id").collect()
    assert {r.item_id: r.term for r in out}[7] == "zzyzx"


def test_bm25_terms_with_regex_and_identifier_chars(spark):
    """Query terms containing '.', spaces, or backticks must not break
    column resolution — term text appears only in output aliases,
    never in names that get re-parsed."""
    from financial_data_stream_processing_engine_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [(1, "u.s. news today"), (2, "plain text here"), (3, "u.s. u.s. news")],
        "doc_id long, text string",
    )
    out = bm25_topk(df, query_terms=("u.s.", "a`b"), k=3).collect()
    scores = {r.doc_id: r.score for r in out}
    assert scores[3] > scores[1] > scores[2] == 0.0
    assert "tf_u.s." in out[0].asDict()


def test_bm25_matches_reference_formula(spark, sf_dir):
    """bm25_topk agrees with a literal NumPy recomputation of the
    documented rational-idf BM25 on the same tokenization."""
    from collections import Counter

    from financial_data_stream_processing_engine_spark.operators.text import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    terms = ("spark", "window", "merge")
    got = bm25_topk(docs, query_terms=terms, k=10).collect()
    rows = docs.select("doc_id", "text").collect()
    dls, tfs = {}, {}
    for r in rows:
        toks = [t for t in r.text.split(" ") if t]
        dls[r.doc_id] = len(toks)
        c = Counter(toks)
        tfs[r.doc_id] = [c.get(t, 0) for t in terms]
    n = len(dls)
    total = sum(dls.values())
    avgdl = float(total) / n
    dfs = [sum(1 for d in tfs.values() if d[i] > 0) for i in range(len(terms))]
    def score(doc):
        s = 0.0
        for i in range(len(terms)):
            tf = tfs[doc][i]
            if tf:
                idf = (n - dfs[i] + 0.5) / (dfs[i] + 0.5)
                s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dls[doc] / avgdl)))
        return s
    expect = sorted(dls, key=lambda d: (-score(d), d))[:10]
    assert [r.doc_id for r in got] == expect
    for r in got:
        assert abs(r.score - score(r.doc_id)) < 1e-9
        assert r.dl == dls[r.doc_id]
