"""Property test: prefix-filter exact similarity join equals brute
force on random corpora AND random rational thresholds (not just the
fixture's 4/5).

The soundness proof (frequency-ordered prefixes of integer-ceiling
length collide for every qualifying pair) is threshold-dependent —
the integer arithmetic exists precisely because double ceilings
misround for some (num/den, |S|) combinations — so the property is
pinned across the threshold space, including thresholds like 7/100
whose double ceil is wrong.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings, strategies as st

from financial_data_stream_processing_engine_spark.operators import dedup

VOCAB = [f"w{i}" for i in range(30)]


def _make_corpus(seed: int, n_docs: int, n_dup_pairs: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    for _ in range(n_docs):
        length = rng.randint(3, 30)
        docs.append(" ".join(rng.choice(VOCAB) for _ in range(length)))
    for _ in range(n_dup_pairs):
        src = rng.randrange(len(docs))
        toks = docs[src].split()
        for _ in range(rng.randint(0, 2)):
            toks[rng.randrange(len(toks))] = rng.choice(VOCAB)
        docs.append(" ".join(toks))
    return list(enumerate(docs))


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_docs=st.integers(min_value=4, max_value=15),
    n_dup_pairs=st.integers(min_value=1, max_value=4),
    threshold=st.sampled_from([(4, 5), (7, 100), (1, 2), (2, 3), (9, 10), (3, 10)]),
    n=st.sampled_from([2, 3]),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_prefix_filter_equals_brute_force(spark, seed, n_docs, n_dup_pairs, threshold, n):
    num, den = threshold
    rows = _make_corpus(seed, n_docs, n_dup_pairs)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    truth = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(df, n=n, threshold=num / den).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in dedup.prefix_filter_jaccard_pairs(
            df, n=n, threshold_num=num, threshold_den=den
        ).collect()
    }
    assert got == truth
