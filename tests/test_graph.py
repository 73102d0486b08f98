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
