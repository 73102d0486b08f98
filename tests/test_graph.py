"""Graph-operator unit tests (pagerank has oracle + star/stability
tests elsewhere; this file pins triangle counting on known graphs)."""

import pytest


def test_triangle_count_known_graphs(spark):
    from financial_data_stream_processing_engine_spark.operators.graph import triangle_count

    def count(edges):
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        return triangle_count(df).collect()[0]

    # K4: C(4,3) = 4 triangles, 6 edges
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = count(k4)
    assert (r["n_edges"], r["n_triangles"]) == (6, 4)
    # star graph: hub + 5 leaves, no triangles — the skew case degree
    # orientation exists for
    star = [(0, i) for i in range(1, 6)]
    r = count(star)
    assert (r["n_edges"], r["n_triangles"]) == (5, 0)
    # two disjoint triangles sharing no nodes
    two = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    r = count(two)
    assert (r["n_edges"], r["n_triangles"]) == (6, 2)
    # triangle + pendant edge
    pend = [(0, 1), (1, 2), (0, 2), (2, 3)]
    r = count(pend)
    assert (r["n_edges"], r["n_triangles"]) == (4, 1)


def test_clustering_coefficient_known_graphs(spark):
    from financial_data_stream_processing_engine_spark.operators.graph import (
        clustering_coefficient,
    )

    def lcc_map(edges):
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        return {r["node"]: r for r in clustering_coefficient(df).collect()}

    # K4: every node deg 3, 3 triangles each, lcc exactly 1
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = lcc_map(k4)
    assert all(
        (out[n]["degree"], out[n]["n_triangles"], out[n]["lcc"]) == (3, 3, 1.0)
        for n in range(4)
    )
    # star: hub deg 5 lcc 0; leaves deg 1 lcc 0 (deg < 2 convention)
    out = lcc_map([(0, i) for i in range(1, 6)])
    assert out[0]["degree"] == 5 and out[0]["lcc"] == 0.0
    assert out[1]["degree"] == 1 and out[1]["lcc"] == 0.0
    # triangle + pendant: node 2 has deg 3, 1 triangle → lcc = 1/3
    out = lcc_map([(0, 1), (1, 2), (0, 2), (2, 3)])
    assert out[2]["n_triangles"] == 1
    assert out[2]["lcc"] == 2.0 / 6.0
    assert out[0]["lcc"] == 1.0 and out[3]["lcc"] == 0.0


def test_packed_order_key_rejects_out_of_range_ids(spark):
    """ids outside [0, 2^31) would silently break the (degree, id)
    packing's total order — the guard must fail loudly instead
    (ADVICE r7)."""
    import pytest

    from financial_data_stream_processing_engine_spark.operators.graph import triangle_count

    for bad in [[(-1, 2), (2, 3), (-1, 3)], [(1, 2**31), (1, 2)]]:
        df = spark.createDataFrame(bad, "id_a long, id_b long")
        with pytest.raises(Exception, match="2\\^31|USER_RAISED"):
            triangle_count(df).collect()


def test_kcore_handcrafted_structures(spark):
    from financial_data_stream_processing_engine_spark.operators.graph import kcore

    edges = [
        # 4-clique (3-core) with a pendant chain that peels away
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6), (6, 7),
        # triangle: 2-core but not 3-core
        (10, 11), (11, 12), (10, 12),
        # 4-cycle: 2-core
        (20, 21), (21, 22), (22, 23), (23, 20),
        # star: peels entirely at k=2
        (30, 31), (30, 32), (30, 33),
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got2 = {r["node"]: r["core_deg"] for r in kcore(df, k=2).collect()}
    assert set(got2) == {1, 2, 3, 4, 10, 11, 12, 20, 21, 22, 23}
    assert got2[1] == 3 and got2[10] == 2 and got2[20] == 2
    got3 = {r["node"]: r["core_deg"] for r in kcore(df, k=3).collect()}
    assert set(got3) == {1, 2, 3, 4} and all(d == 3 for d in got3.values())
    # k above the max core: everything peels, empty result
    assert kcore(df, k=5).count() == 0


def test_kcore_long_chain_needs_many_rounds(spark):
    from financial_data_stream_processing_engine_spark.operators.graph import kcore

    # a path graph peels one endpoint pair per round — the worst case
    # for round counts; a triangle at one end survives
    path = [(i, i + 1) for i in range(12)] + [(12, 13), (13, 14), (12, 14)]
    df = spark.createDataFrame(path, "id_a long, id_b long")
    got = {r["node"] for r in kcore(df, k=2).collect()}
    assert got == {12, 13, 14}
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        kcore(df, k=2, max_rounds=3)


def test_ktruss_handcrafted_structures(spark):
    from financial_data_stream_processing_engine_spark.operators.graph import ktruss

    edges = [
        # two triangles sharing edge (1,2): all five edges 3-truss;
        # the shared edge closes 2 triangles, the others 1
        (1, 2), (1, 3), (2, 3), (1, 4), (2, 4),
        # pendant edge off the cluster: closes nothing, peels
        (4, 5),
        # 4-cycle: a 2-core with ZERO triangles — the structure that
        # separates truss from core (kcore keeps it, ktruss drops it)
        (20, 21), (21, 22), (22, 23), (23, 20),
        # star: peels entirely
        (30, 31), (30, 32), (30, 33),
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["support"] for r in ktruss(df, k=3).collect()}
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1, (1, 4): 1, (2, 4): 1}
    # K4 at k=4: every edge closes exactly 2 in-truss triangles
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    got4 = {
        (r["id_a"], r["id_b"]): r["support"]
        for r in ktruss(spark.createDataFrame(k4, "id_a long, id_b long"), k=4).collect()
    }
    assert set(got4) == set(k4) and all(s == 2 for s in got4.values())


def test_ktruss_cascade_and_max_rounds(spark):
    """Removing low-support edges lowers neighbours' support — the
    peel must cascade: K4 minus one edge has a support-2 edge in round
    one, but dropping the four support-1 edges strands it."""
    import pytest as _pytest

    from financial_data_stream_processing_engine_spark.operators.graph import ktruss

    k4m = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
    df = spark.createDataFrame(k4m, "id_a long, id_b long")
    # k=3 keeps everything (both triangles share (1,2))
    assert ktruss(df, k=3).count() == 5
    # k=4: round 1 drops the support-1 edges, round 2 strands (1,2)
    assert ktruss(df, k=4).count() == 0
    with _pytest.raises(RuntimeError, match="did not converge"):
        ktruss(df, k=4, max_rounds=2)
    # triangle-free graph at the weakest truss: empty, converges fast
    path = spark.createDataFrame([(i, i + 1) for i in range(5)], "id_a long, id_b long")
    assert ktruss(path, k=3).count() == 0


def test_ktruss_accepts_non_canonical_edge_orientation(spark):
    """Reversed input edges must canonicalize, not silently peel: the
    per-round support join keys on (least, greatest) pairs, so an
    un-normalized (2,1) edge would match no support row without the
    re-canonicalization step."""
    from financial_data_stream_processing_engine_spark.operators.graph import ktruss

    reversed_tri = [(2, 1), (3, 1), (3, 2)]
    df = spark.createDataFrame(reversed_tri, "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["support"] for r in ktruss(df, k=3).collect()}
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 1}


def test_truss_communities_handcrafted(spark):
    """Two 3-truss communities bridged by a single weak edge: the
    bridge closes no triangle inside the survivors, so the peel cuts
    it and the components split exactly at the community boundary —
    each labeled by its min node id, with its member count."""
    from financial_data_stream_processing_engine_spark.operators.graph import (
        truss_communities,
    )

    tri_a = [(1, 2), (1, 3), (2, 3)]          # community {1,2,3}
    k4_b = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    bridge = [(3, 10)]                          # weak tie, no triangle
    df = spark.createDataFrame(tri_a + k4_b + bridge, "id_a long, id_b long")
    got = {r["node"]: (r["community"], r["n_members"])
           for r in truss_communities(df, k=3).collect()}
    assert got == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        10: (10, 4), 11: (10, 4), 12: (10, 4), 13: (10, 4),
    }
    # k=4: the triangle dissolves, only K4 survives as one community
    got4 = {r["node"]: (r["community"], r["n_members"])
            for r in truss_communities(df, k=4).collect()}
    assert got4 == {10: (10, 4), 11: (10, 4), 12: (10, 4), 13: (10, 4)}


def test_ktruss_oracle_unroll_depth_covers_fixtures(spark, sf_dir):
    """The DuckDB k-truss/communities oracles unroll the peel a FIXED
    8 rounds (plans/llm_queries.py::_ktruss_unrolled_ctes) and rely on
    rounds past the fixpoint being the identity — sound only if the
    fixture graphs' peel depth is ≤ 8.  Run the Spark peel with
    max_rounds=8 against both fixture similarity graphs: a denser
    future fixture needing more rounds raises here LOUDLY, flagging
    the unroll constant before the driver sees a confusing mismatch
    (ADVICE r9 #1)."""
    from financial_data_stream_processing_engine_spark.operators.graph import ktruss
    from financial_data_stream_processing_engine_spark.plans.llm_queries import (
        _similarity_pairs,
    )

    # sf0.001 (the pytest fixture dir); sf0.01 (the driver correctness
    # scale) is covered by tools/verify_local.py's oracle comparison,
    # which would itself fail loudly on a fixpoint-not-reached mismatch
    pairs = _similarity_pairs(spark, sf_dir)
    ktruss(pairs, k=3, max_rounds=8)  # raises if the peel needs > 8


def test_partition_modularity_handcrafted(spark):
    """Modularity arithmetic on a hand-checked graph: triangle {1,2,3}
    + K4 {10..13} + bridge (3,10) + an isolated pair (20,21) whose
    endpoints stay singletons (the pair closes no triangle, so the
    truss labels neither; its edge is INTER-community by the singleton
    convention).  m = 11; every count and each q_c checked exactly."""
    from financial_data_stream_processing_engine_spark.operators.graph import (
        partition_modularity,
        truss_communities,
    )

    edges = (
        [(1, 2), (1, 3), (2, 3)]
        + [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
        + [(3, 10), (20, 21)]
    )
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    labels = truss_communities(df, k=3).select("node", "community")
    got = {r["community"]: r for r in partition_modularity(df, labels).collect()}
    m = 11.0
    # community 1 = {1,2,3}: 3 intra edges, degrees 2+2+3 (node 3 has
    # the bridge) = 7; community 10 = {10..13}: 6 intra, degrees
    # 4+3+3+3 = 13; singletons 20, 21: 0 intra, degree 1 each
    assert set(got) == {1, 10, 20, 21}
    c1, c10 = got[1], got[10]
    assert (c1["n_members"], c1["intra_edges"], c1["degree_sum"], c1["is_labeled"]) == (3, 3, 7, True)
    assert (c10["n_members"], c10["intra_edges"], c10["degree_sum"], c10["is_labeled"]) == (4, 6, 13, True)
    for s in (20, 21):
        r = got[s]
        assert (r["n_members"], r["intra_edges"], r["degree_sum"], r["is_labeled"]) == (1, 0, 1, False)
        assert r["q_contrib"] == 0.0 / m - (1.0 / (2 * m)) ** 2
    assert c1["q_contrib"] == 3.0 / m - (7.0 / (2 * m)) ** 2
    assert c10["q_contrib"] == 6.0 / m - (13.0 / (2 * m)) ** 2
    # the partition's Q: sum of contributions, positive (denser than chance)
    q = sum(r["q_contrib"] for r in got.values())
    assert q == pytest.approx(
        3 / m - (7 / (2 * m)) ** 2 + 6 / m - (13 / (2 * m)) ** 2 - 2 * (1 / (2 * m)) ** 2
    )
    assert q > 0.3


def test_partition_modularity_perfect_and_null_partitions(spark):
    """Law checks: two disjoint cliques labeled by their components
    give the textbook Q = 1 − Σ(d_c/2m)²; putting EVERY node in ONE
    community gives Q = 0 exactly (e_c/m = 1, (d_c/2m)² = 1)."""
    from pyspark.sql import functions as F

    from financial_data_stream_processing_engine_spark.operators.graph import (
        partition_modularity,
    )

    tri_a = [(0, 1), (1, 2), (0, 2)]
    tri_b = [(10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(tri_a + tri_b, "id_a long, id_b long")
    labels = spark.createDataFrame(
        [(n, 0) for n in (0, 1, 2)] + [(n, 10) for n in (10, 11, 12)],
        "node long, community long",
    )
    rows = partition_modularity(df, labels).collect()
    q = sum(r["q_contrib"] for r in rows)
    assert q == pytest.approx(1 - 2 * (6 / 12) ** 2)  # = 0.5
    one = spark.createDataFrame(
        [(n, 0) for n in (0, 1, 2, 10, 11, 12)], "node long, community long"
    )
    rows1 = partition_modularity(df, one).collect()
    assert len(rows1) == 1 and rows1[0]["q_contrib"] == 0.0


def test_partition_modularity_empty_edges_is_empty_not_nan(spark):
    """ADVICE r10: m = 0 (empty edge frame) must NOT surface NaN/Inf
    q_contrib rows — every output row descends from an edge endpoint,
    so the result is EMPTY by construction and the /m divisions never
    execute (pinned here so the invariant can't silently regress)."""
    from financial_data_stream_processing_engine_spark.operators.graph import (
        partition_modularity,
    )

    edges = spark.createDataFrame([], "id_a long, id_b long")
    labels = spark.createDataFrame([(1, 0), (2, 0)], "node long, community long")
    assert partition_modularity(edges, labels).collect() == []


def test_partition_modularity_random_sweep_matches_reference(spark):
    """Randomized sweep: on random graphs with random partial
    partitions (some nodes deliberately unlabeled → singletons), every
    per-community row must match a pure-Python reference BITWISE —
    same counts, same fixed-shape IEEE arithmetic."""
    import random as _random

    from financial_data_stream_processing_engine_spark.operators.graph import (
        partition_modularity,
    )

    rng = _random.Random(73)
    for trial in range(5):
        n = rng.randint(6, 18)
        nodes = list(range(n))
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for _ in range(rng.randint(n, 3 * n))
                for a, b in [rng.sample(nodes, 2)]
            }
        )
        n_comm = rng.randint(1, 4)
        labeled = {
            v: rng.randrange(n_comm) for v in nodes if rng.random() < 0.7
        }
        touched = sorted({v for e in edges for v in e})
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        lab_rows = [(v, c) for v, c in labeled.items()]
        labels = spark.createDataFrame(lab_rows or [(None, None)], "node long, community long")
        if not lab_rows:
            labels = labels.where("node IS NOT NULL")
        got = {
            r["community"]: (
                r["n_members"], r["is_labeled"], r["intra_edges"],
                r["degree_sum"], r["q_contrib"],
            )
            for r in partition_modularity(df, labels).collect()
        }
        m = len(edges)
        lab = {v: labeled.get(v, v) for v in touched}
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        want: dict[int, list] = {}
        for v in touched:
            c = lab[v]
            w = want.setdefault(c, [0, False, 0, 0])
            w[0] += 1
            w[1] = w[1] or (v in labeled)
            w[3] += deg[v]
        for a, b in edges:
            if lab[a] == lab[b]:
                want[lab[a]][2] += 1
        expect = {
            c: (
                nm, il, intra, ds,
                intra / m - (ds / (2 * m)) * (ds / (2 * m)),
            )
            for c, (nm, il, intra, ds) in want.items()
        }
        assert got == expect, (trial, n, m)

def _py_louvain_refine(edges, labels, max_rounds=20):
    """Pure-Python reference of operators/graph.py::louvain_refine —
    the EXACT same round structure (integer gain numerators, per-node
    argmax, priority blocking, combined per-target + per-source
    conservative admission, single-move fallback), so the Spark result
    must match it node-for-node."""
    # the adjacency sets below dedup parallel edges while deg/m count
    # every row — a duplicate edge would silently diverge from the
    # Spark implementation (weight-2 semantics), so reject it loudly
    # here; sweeps that want parallel edges use the weighted replica
    assert len(set(edges)) == len(edges), "duplicate edges: use weighted replica"
    adj: dict[int, set] = {}
    deg: dict[int, int] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m = len(edges)
    assert m > 0
    lab = {n: labels.get(n, n) for n in deg}
    lab0 = dict(lab)
    for i in range(max_rounds + 1):
        tot: dict[int, int] = {}
        for n, c in lab.items():
            tot[c] = tot.get(c, 0) + deg[n]
        kic: dict[int, dict[int, int]] = {}
        for n in deg:
            d = kic.setdefault(n, {})
            for nb in adj[n]:
                d[lab[nb]] = d.get(lab[nb], 0) + 1
        cand = []
        for n in sorted(deg):
            a, k = lab[n], deg[n]
            kia = kic[n].get(a, 0)
            for c, kib in kic[n].items():
                if c == a:
                    continue
                g = 2 * m * (kib - kia) - k * (tot[c] - tot[a] + k)
                if g > 0:
                    cand.append({"node": n, "k": k, "src": a, "tgt": c, "g": g})
        # per-node best (g desc, tgt asc); every node may move — the
        # multi-departure form (no per-source thinning)
        bestn: dict[int, dict] = {}
        for x in cand:
            cur = bestn.get(x["node"])
            if cur is None or (-x["g"], x["tgt"]) < (-cur["g"], cur["tgt"]):
                bestn[x["node"]] = x
        selected = list(bestn.values())
        if not selected:
            return {n: (lab[n], lab[n] != lab0[n]) for n in deg}
        assert i < max_rounds, "reference did not converge"

        def pri(x):
            return (-x["g"], x["node"])

        dep: dict[int, dict] = {}
        for x in selected:
            cur = dep.get(x["src"])
            if cur is None or pri(x) < pri(cur):
                dep[x["src"]] = x
        arr: dict[int, dict] = {}
        for x in selected:
            cur = arr.get(x["tgt"])
            if cur is None or pri(x) < pri(cur):
                arr[x["tgt"]] = x
        free = [
            x
            for x in selected
            if not (x["tgt"] in dep and pri(dep[x["tgt"]]) < pri(x))
            and not (x["src"] in arr and pri(arr[x["src"]]) < pri(x))
        ]
        # combined conservative admission: cumulative survivor degrees
        # per target AND per source, in global priority order
        applied = []
        st: dict[int, int] = {}
        ss: dict[int, int] = {}
        for x in sorted(free, key=pri):
            if x["g"] - x["k"] * (st.get(x["tgt"], 0) + ss.get(x["src"], 0)) > 0:
                applied.append(x)
            st[x["tgt"]] = st.get(x["tgt"], 0) + x["k"]
            ss[x["src"]] = ss.get(x["src"], 0) + x["k"]
        if not applied:
            applied = [min(selected, key=pri)]
        for x in applied:
            lab[x["node"]] = x["tgt"]
    raise AssertionError("unreachable")


def test_louvain_refine_barbell_moves_mislabeled_node(spark):
    """Two triangles joined by a bridge, node 3 mislabeled into the
    left community: the refinement must move exactly node 3 back to
    the right triangle, Q must strictly improve, and refining the
    refined labels must move nothing (fixpoint)."""
    from financial_data_stream_processing_engine_spark.operators.graph import (
        louvain_refine,
        partition_modularity,
    )

    tri = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    e = spark.createDataFrame(tri, "id_a long, id_b long")
    bad = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 0), (4, 10), (5, 10)],
        "node long, community long",
    )
    ref = louvain_refine(e, bad)
    got = {r["node"]: (r["community"], r["moved"]) for r in ref.collect()}
    assert got == {
        0: (0, False), 1: (0, False), 2: (0, False),
        3: (10, True), 4: (10, False), 5: (10, False),
    }
    q0 = sum(r["q_contrib"] for r in partition_modularity(e, bad).collect())
    q1 = sum(
        r["q_contrib"]
        for r in partition_modularity(e, ref.select("node", "community")).collect()
    )
    assert q1 > q0
    again = louvain_refine(e, ref.select("node", "community"))
    assert again.where("moved").count() == 0


def test_louvain_refine_duplicate_label_rows_raise(spark):
    """Two label rows for one node would fan out through the label
    join and double-count its degree in every Σtot — the guard must
    raise loudly instead (ADVICE r11)."""
    import pytest as _pytest

    from financial_data_stream_processing_engine_spark.operators.graph import (
        louvain_refine,
    )

    e = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    labels = spark.createDataFrame(
        [(0, 5), (0, 6)], "node long, community long"
    )
    with _pytest.raises(ValueError, match="one row per node"):
        louvain_refine(e, labels)


def test_louvain_refine_multi_departure_disperses_in_one_round(spark):
    """Three disjoint triangles with one node of each mislabeled into a
    shared bogus community: ALL THREE departures from that community
    must be admitted in the SAME applied round (the multi-departure
    admission — the r11 one-departure-per-source rule needed three
    rounds here), so max_rounds=1 suffices and the result is the clean
    triangle partition."""
    from financial_data_stream_processing_engine_spark.operators.graph import (
        louvain_refine,
    )

    tris = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (6, 7), (7, 8), (6, 8)]
    e = spark.createDataFrame(tris, "id_a long, id_b long")
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (3, 3), (4, 3), (6, 6), (7, 6),
         (2, 99), (5, 99), (8, 99)],
        "node long, community long",
    )
    got = {
        r["node"]: (r["community"], r["moved"])
        for r in louvain_refine(e, labels, max_rounds=1).collect()
    }
    assert got == {
        0: (0, False), 1: (0, False), 2: (0, True),
        3: (3, False), 4: (3, False), 5: (3, True),
        6: (6, False), 7: (6, False), 8: (6, True),
    }


def test_louvain_refine_empty_edges_raises(spark):
    """m = 0 has no modularity to refine — must raise loudly."""
    import pytest as _pytest

    from financial_data_stream_processing_engine_spark.operators.graph import (
        louvain_refine,
    )

    e = spark.createDataFrame([], "id_a long, id_b long")
    labels = spark.createDataFrame([(1, 0)], "node long, community long")
    with _pytest.raises(ValueError, match="m = 0"):
        louvain_refine(e, labels)


def test_louvain_refine_random_sweep_matches_reference(spark):
    """Randomized sweep: on random graphs with random partial initial
    partitions, the Spark refinement must match the pure-Python
    replica of the same deterministic algorithm node-for-node, Q must
    never decrease, and the result must be a fixpoint."""
    import random as _random

    from financial_data_stream_processing_engine_spark.operators.graph import (
        louvain_refine,
        partition_modularity,
    )

    rng = _random.Random(74)
    for trial in range(4):
        n = rng.randint(6, 14)
        nodes = list(range(n))
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for _ in range(rng.randint(n, 3 * n))
                for a, b in [rng.sample(nodes, 2)]
            }
        )
        n_comm = rng.randint(1, 4)
        labeled = {v: rng.randrange(n_comm) for v in nodes if rng.random() < 0.6}
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        lab_rows = [(v, c) for v, c in labeled.items()]
        labels = spark.createDataFrame(
            lab_rows or [(None, None)], "node long, community long"
        )
        if not lab_rows:
            labels = labels.where("node IS NOT NULL")
        got = {
            r["node"]: (r["community"], r["moved"])
            for r in louvain_refine(df, labels, max_rounds=30).collect()
        }
        want = _py_louvain_refine(edges, labeled, max_rounds=30)
        assert got == want, (trial, edges, labeled)
        q0 = sum(
            r["q_contrib"] for r in partition_modularity(df, labels).collect()
        )
        ref_labels = spark.createDataFrame(
            [(v, c) for v, (c, _) in got.items()], "node long, community long"
        )
        q1 = sum(
            r["q_contrib"] for r in partition_modularity(df, ref_labels).collect()
        )
        assert q1 >= q0 - 1e-12, (trial,)


def test_louvain_oracle_unroll_depth_covers_fixtures(spark, sf_dir):
    """The DuckDB refinement oracle unrolls the local-move phase a
    FIXED 8 rounds (plans/llm_queries.py::_louvain_refine_sql) and
    relies on rounds past the fixpoint being the identity — sound only
    if the fixture refinement converges in ≤ 8 applied rounds.  Run
    the Spark refinement with max_rounds=8 against the sf0.001
    similarity graph (sf0.01 is covered by tools/verify_local.py's
    oracle comparison): a fixture change needing more rounds raises
    here LOUDLY (the ktruss depth-guard pattern)."""
    from financial_data_stream_processing_engine_spark.operators.graph import (
        louvain_refine,
        truss_communities,
    )
    from financial_data_stream_processing_engine_spark.plans.llm_queries import (
        _similarity_pairs,
    )

    pairs = _similarity_pairs(spark, sf_dir).localCheckpoint()
    comm = truss_communities(pairs, k=3).select("node", "community")
    louvain_refine(pairs, comm, max_rounds=8)  # raises if > 8 rounds


def test_community_coarsen_handcrafted(spark):
    """Two triangles bridged by one edge, labeled by triangle: the
    coarsened graph must be two self-loops of weight 3 plus one cut
    edge of weight 1; total weight = m.  Unlabeled nodes coarsen as
    their own singleton supernode."""
    from financial_data_stream_processing_engine_spark.operators.graph import (
        community_coarsen,
    )

    tri = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    e = spark.createDataFrame(tri, "id_a long, id_b long")
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 10), (4, 10), (5, 10)],
        "node long, community long",
    )
    got = {
        (r["community_a"], r["community_b"]): r["weight"]
        for r in community_coarsen(e, labels).collect()
    }
    assert got == {(0, 0): 3, (10, 10): 3, (0, 10): 1}
    assert sum(got.values()) == len(tri)
    # partial labels: 4 and 5 unlabeled → singleton supernodes
    part = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 0)], "node long, community long"
    )
    got2 = {
        (r["community_a"], r["community_b"]): r["weight"]
        for r in community_coarsen(e, part).collect()
    }
    assert got2 == {(0, 0): 4, (0, 4): 1, (0, 5): 1, (4, 5): 1}
    assert sum(got2.values()) == len(tri)


def test_community_coarsen_random_total_weight_invariant(spark):
    """On random graphs with random partial labels: total coarsened
    weight equals m, self-loop weights equal per-community intra-edge
    counts (cross-checked against partition_modularity's intra_edges),
    and every row is canonical (a ≤ b)."""
    import random as _random

    from financial_data_stream_processing_engine_spark.operators.graph import (
        community_coarsen,
        partition_modularity,
    )

    rng = _random.Random(75)
    for trial in range(3):
        n = rng.randint(6, 16)
        nodes = list(range(n))
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for _ in range(rng.randint(n, 3 * n))
                for a, b in [rng.sample(nodes, 2)]
            }
        )
        labeled = {v: rng.randrange(3) for v in nodes if rng.random() < 0.7}
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        lab_rows = [(v, c) for v, c in labeled.items()]
        labels = spark.createDataFrame(
            lab_rows or [(None, None)], "node long, community long"
        )
        if not lab_rows:
            labels = labels.where("node IS NOT NULL")
        rows = community_coarsen(df, labels).collect()
        assert all(r["community_a"] <= r["community_b"] for r in rows)
        assert sum(r["weight"] for r in rows) == len(edges)
        self_loops = {
            r["community_a"]: r["weight"]
            for r in rows
            if r["community_a"] == r["community_b"]
        }
        intra = {
            r["community"]: r["intra_edges"]
            for r in partition_modularity(df, labels).collect()
            if r["intra_edges"] > 0
        }
        assert self_loops == intra, (trial,)


def test_community_coarsen_weighted_composes_to_third_level(spark):
    """Coarsening an ALREADY-WEIGHTED graph (the previous coarsen's
    output) must SUM the weights, not count rows — the self-composable
    form a third Louvain level needs; total weight stays W."""
    from financial_data_stream_processing_engine_spark.operators.graph import (
        community_coarsen,
    )

    # weighted coarse graph: supernodes 0,1,2 with weights incl. a
    # self-loop; W = 4 + 3 + 5 + 2 = 14
    coarse = spark.createDataFrame(
        [(0, 0, 4), (0, 1, 3), (1, 2, 5), (0, 2, 2)],
        "id_a long, id_b long, weight long",
    )
    labels = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20)], "node long, community long"
    )
    rows = {
        (r["community_a"], r["community_b"]): r["weight"]
        for r in community_coarsen(coarse, labels, weight="weight").collect()
    }
    # 0,1 → 10 (intra: self-loop 4 + edge 3), 2 → 20; cross 10-20: 5+2
    assert rows == {(10, 10): 7, (10, 20): 7}
    assert sum(rows.values()) == 14
    # weight=None keeps the legacy row-count semantics
    unweighted = {
        (r["community_a"], r["community_b"]): r["weight"]
        for r in community_coarsen(coarse, labels).collect()
    }
    assert unweighted == {(10, 10): 2, (10, 20): 2}


def test_louvain_refine_weighted_coarse_graph(spark):
    """Weighted mode over a coarse-style graph with self-loops: two
    heavy supernodes (big self-loop weights) must keep their
    communities, while a light supernode pair bridged by weight 2
    merges; self-loops count twice in the weighted degree and never
    propose a move."""
    from financial_data_stream_processing_engine_spark.operators.graph import (
        louvain_refine,
    )

    coarse = spark.createDataFrame(
        [(0, 0, 5), (1, 1, 4), (0, 1, 1), (2, 2, 3), (1, 2, 1), (3, 4, 2), (3, 3, 1)],
        "community_a long, community_b long, weight long",
    )
    empty = spark.createDataFrame([], "node long, community long")
    got = {
        r["node"]: (r["community"], r["moved"])
        for r in louvain_refine(
            coarse, empty, max_rounds=6,
            src="community_a", dst="community_b", weight="weight",
        ).collect()
    }
    assert got == {
        0: (0, False), 1: (1, False), 2: (2, False),
        3: (4, True), 4: (4, False),
    }


def test_louvain_refine_weight_one_equals_unweighted(spark):
    """A weight column of all 1s must produce exactly the unweighted
    result — the weighted generalization degenerates correctly."""
    import random as _random

    from financial_data_stream_processing_engine_spark.operators.graph import (
        louvain_refine,
    )

    rng = _random.Random(76)
    n = 12
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(30)
            for a, b in [rng.sample(range(n), 2)]
        }
    )
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    dfw = spark.createDataFrame(
        [(a, b, 1) for a, b in edges], "id_a long, id_b long, w long"
    )
    labels = spark.createDataFrame([(0, 0), (1, 0)], "node long, community long")
    plain = {
        r["node"]: (r["community"], r["moved"])
        for r in louvain_refine(df, labels, max_rounds=30).collect()
    }
    weighted = {
        r["node"]: (r["community"], r["moved"])
        for r in louvain_refine(dfw, labels, max_rounds=30, weight="w").collect()
    }
    assert plain == weighted


def test_louvain_level2_chain_depth_guard(spark, sf_dir):
    """The level-2 oracle unrolls BOTH local-move phases 8 rounds
    (plans/llm_queries.py::_louvain_level2_sql): run the full Spark
    chain (truss → refine → coarsen → weighted refine) against the
    sf0.001 similarity graph with max_rounds=8 at each level — a
    fixture change needing deeper compare-scale refinement raises
    here LOUDLY (sf0.01 is covered by verify_local's oracle compare;
    the sf0.1 bench graph legitimately needs ~16 rounds, which the
    entries' generous max_rounds=40 absorbs without any value
    compare)."""
    from financial_data_stream_processing_engine_spark.operators.graph import (
        community_coarsen,
        louvain_refine,
        truss_communities,
    )
    from financial_data_stream_processing_engine_spark.plans.llm_queries import (
        _similarity_pairs,
    )

    pairs = _similarity_pairs(spark, sf_dir).localCheckpoint()
    comm = truss_communities(pairs, k=3).select("node", "community")
    l1 = louvain_refine(pairs, comm, max_rounds=8).select("node", "community")
    coarse = community_coarsen(pairs, l1)
    empty = spark.createDataFrame([], "node long, community long")
    l2 = louvain_refine(
        coarse, empty, max_rounds=8,
        src="community_a", dst="community_b", weight="weight",
    )
    # the coarse self-loop weights + cut weights must partition m
    m = pairs.count()
    from pyspark.sql import functions as F

    assert coarse.agg(F.sum("weight")).collect()[0][0] == m
    assert l2.count() == coarse.selectExpr(
        "community_a AS c"
    ).union(coarse.selectExpr("community_b")).distinct().count()


def test_louvain_quality_ladder_on_fixture(spark, sf_dir):
    """The Louvain equivalence law on the real fixture graph: Q
    (measured over the ORIGINAL graph) must strictly climb truss →
    level-1 refinement → two-level partition whenever moves were
    applied — every applied move strictly increased the (equivalent)
    objective, so a non-improving ladder means the gain arithmetic or
    the coarse-graph equivalence broke."""
    from pyspark.sql import functions as F

    from financial_data_stream_processing_engine_spark.operators.graph import (
        community_coarsen,
        louvain_refine,
        partition_modularity,
        truss_communities,
    )
    from financial_data_stream_processing_engine_spark.plans.llm_queries import (
        _similarity_pairs,
    )

    pairs = _similarity_pairs(spark, sf_dir).localCheckpoint()
    comm = truss_communities(pairs, k=3).select("node", "community").localCheckpoint()

    def q_of(labels):
        return sum(
            r["q_contrib"] for r in partition_modularity(pairs, labels).collect()
        )

    q_truss = q_of(comm)
    l1 = louvain_refine(pairs, comm, max_rounds=40)
    l1_moved = l1.where("moved").count()
    l1 = l1.select("node", "community").localCheckpoint()
    q_l1 = q_of(l1)
    coarse = community_coarsen(pairs, l1)
    empty = spark.createDataFrame([], "node long, community long")
    l2 = louvain_refine(
        coarse, empty, max_rounds=40,
        src="community_a", dst="community_b", weight="weight",
    )
    l2_moved = l2.where("moved").count()
    labels2 = l1.join(
        l2.select(F.col("node").alias("community"), F.col("community").alias("__c2")),
        ["community"],
    ).select("node", F.col("__c2").alias("community"))
    q_l2 = q_of(labels2)
    assert l1_moved > 0 and q_l1 > q_truss
    assert l2_moved > 0 and q_l2 > q_l1


def _py_louvain_refine_weighted(edges_w, labels, max_rounds=30):
    """Weighted pure-Python reference of louvain_refine(weight=...) —
    integer edge weights, self-loops counted twice in degrees and
    never proposing moves, W = total weight in place of m; otherwise
    the exact round structure of _py_louvain_refine."""
    adj: dict[int, dict[int, int]] = {}
    deg: dict[int, int] = {}
    m = 0
    for a, b, w in edges_w:
        m += w
        if a == b:
            deg[a] = deg.get(a, 0) + 2 * w
            adj.setdefault(a, {})
            continue
        adj.setdefault(a, {})[b] = adj.setdefault(a, {}).get(b, 0) + w
        adj.setdefault(b, {})[a] = adj.setdefault(b, {}).get(a, 0) + w
        deg[a] = deg.get(a, 0) + w
        deg[b] = deg.get(b, 0) + w
    assert m > 0
    lab = {n: labels.get(n, n) for n in deg}
    lab0 = dict(lab)
    for i in range(max_rounds + 1):
        tot: dict[int, int] = {}
        for n, c in lab.items():
            tot[c] = tot.get(c, 0) + deg[n]
        kic: dict[int, dict[int, int]] = {}
        for n in deg:
            d = kic.setdefault(n, {})
            for nb, w in adj[n].items():
                d[lab[nb]] = d.get(lab[nb], 0) + w
        cand = []
        for n in sorted(deg):
            a, k = lab[n], deg[n]
            kia = kic[n].get(a, 0)
            for c, kib in kic[n].items():
                if c == a:
                    continue
                g = 2 * m * (kib - kia) - k * (tot[c] - tot[a] + k)
                if g > 0:
                    cand.append({"node": n, "k": k, "src": a, "tgt": c, "g": g})
        bestn: dict[int, dict] = {}
        for x in cand:
            cur = bestn.get(x["node"])
            if cur is None or (-x["g"], x["tgt"]) < (-cur["g"], cur["tgt"]):
                bestn[x["node"]] = x
        selected = list(bestn.values())
        if not selected:
            return {n: (lab[n], lab[n] != lab0[n]) for n in deg}
        assert i < max_rounds, "weighted reference did not converge"

        def pri(x):
            return (-x["g"], x["node"])

        dep: dict[int, dict] = {}
        for x in selected:
            cur = dep.get(x["src"])
            if cur is None or pri(x) < pri(cur):
                dep[x["src"]] = x
        arr: dict[int, dict] = {}
        for x in selected:
            cur = arr.get(x["tgt"])
            if cur is None or pri(x) < pri(cur):
                arr[x["tgt"]] = x
        free = [
            x
            for x in selected
            if not (x["tgt"] in dep and pri(dep[x["tgt"]]) < pri(x))
            and not (x["src"] in arr and pri(arr[x["src"]]) < pri(x))
        ]
        applied = []
        st: dict[int, int] = {}
        ss: dict[int, int] = {}
        for x in sorted(free, key=pri):
            if x["g"] - x["k"] * (st.get(x["tgt"], 0) + ss.get(x["src"], 0)) > 0:
                applied.append(x)
            st[x["tgt"]] = st.get(x["tgt"], 0) + x["k"]
            ss[x["src"]] = ss.get(x["src"], 0) + x["k"]
        if not applied:
            applied = [min(selected, key=pri)]
        for x in applied:
            lab[x["node"]] = x["tgt"]
    raise AssertionError("unreachable")


def test_louvain_refine_weighted_random_sweep_matches_reference(spark):
    """Randomized WEIGHTED sweep incl. self-loops (the coarse-graph
    shape level 2 consumes): the Spark weighted refinement must match
    the pure-Python weighted replica node-for-node, from both
    singleton starts and random partial partitions."""
    import random as _random

    from financial_data_stream_processing_engine_spark.operators.graph import (
        louvain_refine,
    )

    rng = _random.Random(77)
    for trial in range(3):
        n = rng.randint(5, 12)
        nodes = list(range(n))
        pair_edges = sorted(
            {
                (min(a, b), max(a, b))
                for _ in range(rng.randint(n, 3 * n))
                for a, b in [rng.sample(nodes, 2)]
            }
        )
        edges_w = [(a, b, rng.randint(1, 5)) for a, b in pair_edges]
        # self-loops on a random subset — the coarsened intra weights
        for v in nodes:
            if rng.random() < 0.4:
                edges_w.append((v, v, rng.randint(1, 4)))
        labeled = (
            {} if trial == 0
            else {v: rng.randrange(3) for v in nodes if rng.random() < 0.5}
        )
        df = spark.createDataFrame(
            edges_w, "community_a long, community_b long, weight long"
        )
        lab_rows = [(v, c) for v, c in labeled.items()]
        labels = spark.createDataFrame(
            lab_rows or [(None, None)], "node long, community long"
        )
        if not lab_rows:
            labels = labels.where("node IS NOT NULL")
        got = {
            r["node"]: (r["community"], r["moved"])
            for r in louvain_refine(
                df, labels, max_rounds=30,
                src="community_a", dst="community_b", weight="weight",
            ).collect()
        }
        want = _py_louvain_refine_weighted(edges_w, labeled, max_rounds=30)
        assert got == want, (trial, edges_w, labeled)
        if trial == 0:
            # pin the Spark window admission path on the weighted
            # shape too (small_admit=0 disables the driver fast path)
            got_win = {
                r["node"]: (r["community"], r["moved"])
                for r in louvain_refine(
                    df, labels, max_rounds=30, small_admit=0,
                    src="community_a", dst="community_b", weight="weight",
                ).collect()
            }
            assert got_win == want, (trial, edges_w, labeled)


def test_neardup_communities_oracle_unroll_depth_covers_fixtures(spark, sf_dir):
    """The pipeline_neardup_communities oracle unrolls the local-move
    phase a FIXED 8 rounds (plans/llm_queries.py::
    _neardup_communities_sql) and relies on rounds past the fixpoint
    being the identity — sound only if the fixture near-dup graph's
    refinement converges in ≤ 8 applied rounds.  Run the Spark chain
    with max_rounds=8 against the sf0.001 near-dup graph (sf0.01 is
    covered by verify_local's oracle comparison) — a fixture change
    needing more rounds raises here LOUDLY (the ktruss depth-guard
    pattern)."""
    from pyspark.sql import functions as F

    from financial_data_stream_processing_engine_spark.io_utils import load_table
    from financial_data_stream_processing_engine_spark.operators.dedup import (
        connected_components,
        prefix_filter_jaccard_pairs,
    )
    from financial_data_stream_processing_engine_spark.operators.graph import (
        louvain_refine,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = prefix_filter_jaccard_pairs(
        docs, id_col="doc_id", text_col="text", n=3,
        threshold_num=4, threshold_den=5,
    ).localCheckpoint()
    seed = connected_components(pairs).select(
        "node", F.col("component").alias("community")
    )
    louvain_refine(pairs, seed, src="id_a", dst="id_b", max_rounds=8)


def test_louvain_refine_multi_departure_stress_sweep(spark):
    """Denser randomized sweep aimed at the multi-departure paths: a
    few larger graphs seeded with ONE giant bogus community (maximum
    dispersal pressure — many simultaneous departures from one source,
    plus same-target convoys for the combined admission), compared
    node-for-node against the pure-Python replica, with the Q-ladder
    checks of the main sweep."""
    import random as _random

    from financial_data_stream_processing_engine_spark.operators.graph import (
        louvain_refine,
        partition_modularity,
    )

    rng = _random.Random(78)
    for trial in range(2):
        n = rng.randint(16, 24)
        nodes = list(range(n))
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for _ in range(4 * n)
                for a, b in [rng.sample(nodes, 2)]
            }
        )
        # giant bogus community: half the nodes share one label that
        # the refinement must disperse; the rest are singletons
        labeled = {v: 1000 for v in nodes if rng.random() < 0.5}
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        labels = spark.createDataFrame(
            list(labeled.items()) or [(None, None)], "node long, community long"
        )
        got = {
            r["node"]: (r["community"], r["moved"])
            for r in louvain_refine(df, labels, max_rounds=30).collect()
        }
        want = _py_louvain_refine(edges, labeled, max_rounds=30)
        assert got == want, (trial, edges, labeled)
        # small_admit=0 forces the Spark WINDOW admission path every
        # round (these graphs otherwise take the driver-side
        # small-move fast path) — both paths must be node-for-node
        # identical to the replica
        got_win = {
            r["node"]: (r["community"], r["moved"])
            for r in louvain_refine(
                df, labels, max_rounds=30, small_admit=0
            ).collect()
        }
        assert got_win == want, (trial, edges, labeled)
        q0 = sum(
            r["q_contrib"] for r in partition_modularity(df, labels).collect()
        )
        ref_labels = spark.createDataFrame(
            [(v, c) for v, (c, _) in got.items()], "node long, community long"
        )
        q1 = sum(
            r["q_contrib"] for r in partition_modularity(df, ref_labels).collect()
        )
        assert q1 >= q0 - 1e-12, (trial,)


def test_gc_hint_floor_never_exceeds_pre_gc_usage():
    """VERDICT r15 #7 / ADVICE r14 #4: System.gc() may be serviced
    asynchronously, so the post-collection heap re-read can land HIGHER
    than the pre-GC usage (another thread allocated in between).  The
    floor _iterative_gc_hint stamps must be clamped to the PRE-GC
    usage — an over-read floor would suppress future collections longer
    than the 12.5%-growth back-off intends.  Driven with a scripted
    fake JVM so the heap readings are deterministic (no behavior
    change to the operator; this pins the existing clamp)."""
    from types import SimpleNamespace

    from financial_data_stream_processing_engine_spark.operators import graph as g

    class FakeRuntime:
        """totalMemory() always mx; freeMemory() walks a scripted list
        of used-heap readings (used = total - free)."""

        def __init__(self, mx, usages):
            self._mx = mx
            self._usages = list(usages)
            self._i = 0

        def maxMemory(self):
            return self._mx

        def totalMemory(self):
            return self._mx

        def freeMemory(self):
            u = self._usages[min(self._i, len(self._usages) - 1)]
            self._i += 1
            return self._mx - u

    mx = 1000
    key = "fake-app-gc-clamp-test"
    gc_calls = []

    def fake_spark(rt):
        return SimpleNamespace(
            _jvm=SimpleNamespace(
                java=SimpleNamespace(
                    lang=SimpleNamespace(
                        Runtime=SimpleNamespace(getRuntime=lambda: rt)
                    )
                ),
                System=SimpleNamespace(gc=lambda: gc_calls.append(1)),
            ),
            sparkContext=SimpleNamespace(applicationId=key),
        )

    g._GC_LAST_AFTER.pop(key, None)
    try:
        # fire: used 800 > mx/2 and > floor(0) + 125; the post-GC
        # re-read comes back HIGHER (900: concurrent allocation) —
        # the stamped floor must clamp to the pre-GC 800
        g._iterative_gc_hint(fake_spark(FakeRuntime(mx, [800, 900])))
        assert gc_calls == [1]
        assert g._GC_LAST_AFTER[key] == 800

        # back-off: 890 < 800 + 125 → no collection fires
        g._iterative_gc_hint(fake_spark(FakeRuntime(mx, [890])))
        assert gc_calls == [1]
        assert g._GC_LAST_AFTER[key] == 800

        # growth past floor + 12.5% fires again; a genuine reclaim
        # (post-GC 100 < pre-GC 930) stamps the lower floor unclamped
        g._iterative_gc_hint(fake_spark(FakeRuntime(mx, [930, 100])))
        assert gc_calls == [1, 1]
        assert g._GC_LAST_AFTER[key] == 100
    finally:
        g._GC_LAST_AFTER.pop(key, None)
