"""Behavior tests for the unigram-LM tokenizer trainer: QLOG grid
properties, a full pure-Python replica sweep (the louvain/BPE replica
discipline), and the fixture fit ladder."""

from __future__ import annotations

import re
from collections import Counter

from financial_data_stream_processing_engine_spark.operators.unigram import (
    MAX_PIECE_LEN,
    MAX_WORD_LEN,
    MIN_COUNT,
    _compositions,
    comp_parts_rows,
    unigram_segment,
    unigram_train,
)


def _qlog(c: int) -> int:
    bl = c.bit_length()
    return (bl - 1) * 256 + ((c * 256) >> (bl - 1)) - 256


def test_qlog_monotone_and_exact_on_powers():
    vals = [_qlog(c) for c in range(1, 100000)]
    assert all(a <= b for a, b in zip(vals, vals[1:]))
    # exactly k*256 at powers of two (a true log2 grid anchor)
    for k in range(0, 16):
        assert _qlog(1 << k) == k * 256


def test_composition_table_counts_and_coverage():
    rows = comp_parts_rows()
    # tetranacci composition counts per word length
    t = {1: 1, 2: 2, 3: 4, 4: 8, 5: 15, 6: 29, 7: 56, 8: 108}
    by_len = Counter(r[0] for r in rows)
    for n, cnt in t.items():
        n_comps = len({r[1] for r in rows if r[0] == n})
        assert n_comps == cnt, (n, n_comps)
    # every composition's parts cover the word exactly
    spans = {}
    for wlen, cid, n_parts, pidx, pstart, plen in rows:
        spans.setdefault((wlen, cid), []).append((pidx, pstart, plen))
    for (wlen, cid), parts in spans.items():
        parts.sort()
        pos = 0
        for _pidx, pstart, plen in parts:
            assert pstart == pos and 1 <= plen <= MAX_PIECE_LEN
            pos += plen
        assert pos == wlen
    del by_len


def _py_unigram_train(texts: list[str], rounds: int = 3):
    """Pure-Python replica of unigram_train — independent loops, same
    decisions: substring-count init, QLOG costs, lattice argmin by
    (cost, n_parts, comp_id), usage-count M-step, char reseed."""
    words: Counter = Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            if len(w) <= MAX_WORD_LEN:
                words[w] += 1
    comps = {n: _compositions(n, MAX_PIECE_LEN) for n in range(1, MAX_WORD_LEN + 1)}
    init: Counter = Counter()
    for w, f in words.items():
        for s in range(len(w)):
            for ln in range(1, min(MAX_PIECE_LEN, len(w) - s) + 1):
                init[w[s : s + ln]] += f
    chars = {w[i] for w in words for i in range(len(w))}
    vocab = {p: c for p, c in init.items() if len(p) == 1 or c >= MIN_COUNT}

    def viterbi(voc, T):
        best = {}
        for w in words:
            cands = []
            for cid, parts in enumerate(comps[len(w)]):
                pieces, start, ok = [], 0, True
                for pl in parts:
                    pc = w[start : start + pl]
                    if pc not in voc:
                        ok = False
                        break
                    pieces.append(pc)
                    start += pl
                if ok:
                    cost = sum(_qlog(T) - _qlog(voc[p]) + 1 for p in pieces)
                    cands.append((cost, len(parts), cid, pieces))
            best[w] = min(cands)
        return best

    report = []
    for r in range(rounds):
        T = sum(vocab.values())
        best = viterbi(vocab, T)
        report.append(
            (r, sum(f * best[w][0] for w, f in words.items()), len(vocab), T)
        )
        usage: Counter = Counter()
        for w, f in words.items():
            for p in best[w][3]:
                usage[p] += f
        vocab = dict(usage)
        for ch in chars:
            vocab.setdefault(ch, 1)
    T = sum(vocab.values())
    final = {p: (c, _qlog(T) - _qlog(c) + 1) for p, c in vocab.items()}
    return final, report, viterbi(vocab, T), words


def test_unigram_train_matches_python_replica_sweep(spark):
    import random as _random

    rng = _random.Random(79)
    base_words = ["scan", "scans", "window", "windows", "col", "column",
                  "columns", "a", "of", "the", "rescan", "unwind"]
    for trial in range(3):
        texts = [
            " ".join(rng.choices(base_words, k=rng.randint(3, 12)))
            for _ in range(rng.randint(4, 10))
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        vocab_df, report_df = unigram_train(df, rounds=3)
        got_vocab = {r["piece"]: (r["cnt"], r["cost"]) for r in vocab_df.collect()}
        got_report = sorted(tuple(r) for r in report_df.collect())
        want_vocab, want_report, want_best, words = _py_unigram_train(texts, 3)
        assert got_vocab == want_vocab, trial
        assert got_report == [tuple(map(int, r)) for r in want_report], trial
        # per-doc segmentation accounting under the final model
        seg = {
            r["doc_id"]: (r["n_words"], r["n_pieces"], r["total_cost"])
            for r in unigram_segment(df, vocab_df).collect()
        }
        for i, t in enumerate(texts):
            ws = [w for w in re.findall("[a-z]+", t.lower()) if len(w) <= MAX_WORD_LEN]
            want = (
                len(ws),
                sum(want_best[w][1] for w in ws),
                sum(want_best[w][0] for w in ws),
            )
            assert seg[i] == want, (trial, i)


def test_unigram_segment_scans_corpus_once(spark, sf_dir):
    """unigram_segment's distinct-word frame is re-aggregated from the
    per-doc counts, not from a second corpus scan — the shared
    (doc_id, word) aggregate subtree must come back as a
    ReusedExchange in the executed plan.  The vocab is a driver
    literal here so the ONLY parquet scan the plan can contain is the
    corpus itself."""
    from financial_data_stream_processing_engine_spark.io_utils import load_table

    docs = load_table(spark, sf_dir, "documents")
    vocab = spark.createDataFrame(
        [(c, 50) for c in "abcdefghijklmnopqrstuvwxyz"] + [("th", 900), ("an", 800)],
        "piece string, cnt long",
    )
    out = unigram_segment(docs, vocab)
    # materialize THIS dataframe (not a derived count plan) so AQE
    # finalizes its own plan — exchange reuse is applied adaptively
    assert len(out.collect()) > 0
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "== Initial Plan ==" in plan  # adaptively executed
    final = plan.split("== Initial Plan ==")[0]
    tree_scans = [
        ln
        for ln in final.splitlines()
        if re.search(r"\bScan parquet\b", ln) and "+-" in ln
    ]
    assert len(tree_scans) == 1, tree_scans
    assert "ReusedExchange" in final


def test_unigram_fit_ladder_nonincreasing_on_fixture(spark, sf_dir):
    """Hard-EM on the fixture corpus must not worsen the corpus cost
    round over round (82.1M → 57.1M → fixpoint on sf0.001) — the
    value-content certificate the fit entry ships."""
    from financial_data_stream_processing_engine_spark.io_utils import load_table

    docs = load_table(spark, sf_dir, "documents")
    _vocab, report = unigram_train(docs, rounds=3)
    rows = sorted((r["round"], r["corpus_cost"]) for r in report.collect())
    costs = [c for _r, c in rows]
    assert len(costs) == 3
    assert all(a >= b for a, b in zip(costs, costs[1:])), costs
    assert costs[0] > costs[-1]  # the EM actually moved on this corpus
