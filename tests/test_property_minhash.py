"""Property test: MinHash-LSH pairs equal exact all-pairs Jaccard on
random corpora (not just the driver fixture).

The catalog's central LSH claim — verified-LSH output == brute-force
output at threshold 0.8 with (64 hashes, 16 bands) — is probabilistic;
this pins it on randomized near-dup corpora where hypothesis controls
the duplication structure.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings, strategies as st

from financial_data_stream_processing_engine_spark.operators import dedup

VOCAB = [f"w{i}" for i in range(40)]


def _make_corpus(seed: int, n_docs: int, n_dup_pairs: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        length = rng.randint(15, 40)
        docs.append(" ".join(rng.choice(VOCAB) for _ in range(length)))
    # plant near-duplicates: copy a doc and perturb a couple of tokens
    for j in range(n_dup_pairs):
        src = rng.randrange(len(docs))
        toks = docs[src].split()
        for _ in range(rng.randint(0, 2)):
            toks[rng.randrange(len(toks))] = rng.choice(VOCAB)
        docs.append(" ".join(toks))
    return list(enumerate(docs))


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_docs=st.integers(min_value=5, max_value=20),
    n_dup_pairs=st.integers(min_value=1, max_value=5),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_minhash_lsh_equals_exact_pairs(spark, seed, n_docs, n_dup_pairs):
    corpus = _make_corpus(seed, n_docs, n_dup_pairs)
    df = spark.createDataFrame(corpus, "doc_id long, text string")

    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.8).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(df, threshold=0.8).collect()
    }
    # verified-LSH must equal brute force: banding recall at j>=0.8 is
    # 1-(1-j^4)^16 >= 1-4e-8 per pair, and verification kills any
    # false candidate exactly like the brute-force filter.
    assert lsh == exact
