"""Property tests for the iterative operators: k-core peeling, k-truss
edge-support peeling and BPE merge training must reproduce from-scratch
Python references on randomized inputs (not just the handcrafted
menagerie / fixture).
"""

from __future__ import annotations

import random
import re
from collections import Counter
from itertools import combinations

from hypothesis import HealthCheck, given, settings, strategies as st

from financial_data_stream_processing_engine_spark.operators.graph import kcore, ktruss
from financial_data_stream_processing_engine_spark.operators.text import (
    bpe_train_merges,
)


def _py_kcore(edges, k):
    alive = {n for e in edges for n in e}
    es = set(edges)
    while True:
        deg: dict[int, int] = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n in alive if deg.get(n, 0) >= k}
        if keep == alive:
            return {n: deg.get(n, 0) for n in alive}
        alive = keep
        es = {(a, b) for a, b in es if a in alive and b in alive}


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_nodes=st.integers(min_value=4, max_value=25),
    n_edges=st.integers(min_value=3, max_value=60),
    k=st.integers(min_value=2, max_value=4),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_kcore_matches_reference_peel(spark, seed, n_nodes, n_edges, k):
    rng = random.Random(seed)
    edges = set()
    for _ in range(n_edges):
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    if not edges:
        edges = {(0, 1)}
    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    got = {r["node"]: r["core_deg"] for r in kcore(df, k=k).collect()}
    assert got == _py_kcore(edges, k)


def _py_ktruss(edges, k):
    """Reference edge-support peel: brute-force triangle enumeration
    per round (combinations over the adjacency sets), drop edges with
    support < k-2 until stable; returns {edge: in-truss support}."""
    es = set(edges)
    t = k - 2
    while True:
        adj: dict[int, set[int]] = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: 0 for e in es}
        for u, v, w in (
            tri
            for tri in combinations(sorted(adj), 3)
            if tri[1] in adj[tri[0]] and tri[2] in adj[tri[0]] and tri[2] in adj[tri[1]]
        ):
            for e in ((u, v), (u, w), (v, w)):
                sup[e] += 1
        keep = {e for e in es if sup[e] >= t}
        if keep == es:
            return sup
        es = keep


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_nodes=st.integers(min_value=4, max_value=18),
    n_edges=st.integers(min_value=3, max_value=60),
    k=st.integers(min_value=3, max_value=5),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ktruss_matches_reference_peel(spark, seed, n_nodes, n_edges, k):
    rng = random.Random(seed)
    edges = set()
    for _ in range(n_edges):
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    if not edges:
        edges = {(0, 1)}
    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["support"] for r in ktruss(df, k=k).collect()}
    assert got == _py_ktruss(edges, k)


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_nodes=st.integers(min_value=4, max_value=18),
    n_edges=st.integers(min_value=3, max_value=60),
    k=st.integers(min_value=3, max_value=4),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_truss_communities_match_reference_labels(spark, seed, n_nodes, n_edges, k):
    """Composition sweep: community labels over random graphs must
    equal the reference peel's survivors labeled by union-find — min
    reachable id per node, exact member counts (skipped trivially when
    the truss is empty, which the reference detects too)."""
    from financial_data_stream_processing_engine_spark.operators.graph import (
        truss_communities,
    )

    rng = random.Random(seed)
    edges = set()
    for _ in range(n_edges):
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    if not edges:
        edges = {(0, 1)}
    surv = list(_py_ktruss(edges, k))
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in surv:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_lab = {v: find(v) for e in surv for v in e}
    sizes: dict[int, int] = {}
    for v, c in want_lab.items():
        sizes[c] = sizes.get(c, 0) + 1
    want = {v: (c, sizes[c]) for v, c in want_lab.items()}
    df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    got = {
        r["node"]: (r["community"], r["n_members"])
        for r in truss_communities(df, k=k).collect()
    }
    assert got == want


def _py_bpe_train(texts, k):
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
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b, cnt))
        # replace-to-fixpoint application — the ONE merge semantic the
        # trainer shares with bpe_tokenize_pieces (a single delimiter-
        # string pass misses adjacent occurrences that share their
        # boundary '|': this sweep caught exactly that divergence)
        pat, rep = f"|{a}|{b}|", f"|{a}{b}|"
        for w, toks in words.items():
            s = "|" + "|".join(toks) + "|"
            while pat in s:
                s = s.replace(pat, rep)
            words[w] = s.strip("|").split("|")
    return merges


@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_docs=st.integers(min_value=1, max_value=8),
    k=st.integers(min_value=1, max_value=6),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_train_matches_reference_on_random_corpora(spark, seed, n_docs, k):
    rng = random.Random(seed)
    # small alphabet → dense pair collisions → tie-breaks exercised;
    # repeated chars → overlapping-adjacency counting exercised
    alphabet = "abc"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 10))
        )
        for _ in range(n_docs)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["left_tok"], r["right_tok"], r["pair_count"])
        for r in bpe_train_merges(df, k=k).orderBy("rank").collect()
    ]
    assert got == _py_bpe_train(texts, k)
