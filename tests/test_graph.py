"""Graph-operator unit tests (pagerank has oracle + star/stability
tests elsewhere; this file pins triangle counting on known graphs)."""


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
