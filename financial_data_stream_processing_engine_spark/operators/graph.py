"""Graph operators over edge-list DataFrames.

Companions to ``operators.dedup.connected_components`` (min-label
propagation): iterative algorithms expressed as per-round join +
aggregate, never materializing anything super-linear in |E|.

Determinism contract: per-round neighbor sums accumulate through
quantized integers (``functions.numeric.qint``) — float addition is
not associative, so a plain double SUM would vary with shuffle order
AND disagree with the oracle; the integer grid makes every round a
pure function of the previous one, hence bit-reproducible at any
parallelism and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from financial_data_stream_processing_engine_spark.functions.numeric import qint

#: contribution grid for pagerank sums: ranks are O(1/N); 1e-12 keeps
#: ~6 significant digits at N=1e6 nodes per contribution
PR_QSCALE = 12


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    k: int = 4,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``k`` fixed iterations of PageRank (damping 0.85) over a
    directed edge list: rᵢ₊₁(v) = 0.15/N + 0.85·Σ_{u→v} rᵢ(u)/deg(u).

    Fixed iteration count on purpose: a convergence test would need a
    per-round driver check (fine — connected_components does it), but
    rank consumers (dedup canonicalization, crawl prioritization)
    conventionally run a fixed small k, and a fixed k makes the oracle
    an exact unrolled recomputation rather than an approximation.

    Dangling nodes (no out-edges) leak their mass — the standard
    simplified formulation; callers who need the stochastic fix add a
    sink edge per dangling node.

    Scale: per iteration one join (edges ⋈ ranks, shuffled on ``src``)
    + one aggregation on ``dst`` — linear in |E|, the same per-round
    profile as connected_components.  The plan is built lazily over k
    rounds (k is small); for large k insert ``localCheckpoint`` every
    few rounds to truncate lineage.
    """
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    ed = edges.join(deg, src).select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), "__deg"
    )
    # materialize the (edge, degree) list ONCE: it feeds every round's
    # join, and without this the entire upstream edge pipeline (e.g.
    # a cosine-pair enumeration) re-executes per round — the same
    # lineage-truncation move connected_components makes (measured ~2×
    # on the similarity-graph entry at sf0.1)
    ed = ed.localCheckpoint(eager=False)
    r = (
        nodes.select(F.col(node_col).alias("__node"))
        .crossJoin(F.broadcast(nn))
        .select("__node", (F.lit(1.0) / F.col("n")).alias("__r"), "n")
    )
    for _ in range(k):
        contrib = ed.join(
            r.select(F.col("__node").alias("__src"), "__r"), "__src"
        ).select("__dst", (F.col("__r") / F.col("__deg")).alias("__c"))
        sums = contrib.groupBy("__dst").agg(
            (
                F.sum(qint(F.col("__c"), PR_QSCALE)).cast("double")
                * F.lit(10.0 ** -PR_QSCALE)
            ).alias("__s")
        )
        r = (
            nodes.select(F.col(node_col).alias("__node"))
            .crossJoin(F.broadcast(nn))
            .join(sums, F.col("__node") == F.col("__dst"), "left")
            .select(
                "__node",
                (
                    F.lit(0.15) / F.col("n")
                    + F.lit(0.85) * F.coalesce(F.col("__s"), F.lit(0.0))
                ).alias("__r"),
                "n",
            )
        )
    return r.select(F.col("__node").alias(node_col), F.col("__r").alias("rank"))


def triangle_count(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Exact triangle count over canonical undirected edges
    (``id_a < id_b``), degree-oriented.

    Orientation (the MapReduce NodeIterator++ of Suri & Vassilvitskii,
    WWW 2011): each edge points from its lower to its higher endpoint
    under the total order (degree, id), so every triangle is counted
    exactly once — at its lowest-order apex — and per-node out-degree
    is bounded by O(√|E|), which bounds the wedge join's fan-out on
    skewed graphs (the celebrity-node blowup a raw id ordering leaves
    open).  The order key packs (degree, id) into one BIGINT
    (degree·2³² + id) so external engines compare identically; ids
    outside [0, 2³¹) — where the packing stops being a total order —
    raise per-row instead of silently miscounting.

    Two shuffles: the wedge self-join on the apex and the closure
    check on the (v, w) pair — the standard linear-in-wedges profile.
    The edge list is materialized once (``localCheckpoint``) because
    it feeds the degree pass, the orientation and the closure side;
    an unmaterialized upstream (e.g. cosine-pair enumeration) would
    re-execute three times.

    Returns a single row (n_edges, n_triangles).
    """
    e, _deg, tri_nodes = _oriented_triangles(edges, id_a, id_b)
    tri = tri_nodes.agg(
        (F.count(F.lit(1)) / F.lit(3)).cast("long").alias("n_triangles")
    )
    return e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(tri)


def _oriented_triangles(edges: DataFrame, id_a: str, id_b: str):
    """Shared degree-orientation + wedge-closure core: returns
    (canonical_edges, degrees(node, __deg), triangle_nodes(node)) with
    THREE node rows per triangle — one per corner — so callers either
    count/3 (global) or group by node (local counts)."""
    e = edges.select(
        F.col(id_a).alias("a"), F.col(id_b).alias("b")
    ).localCheckpoint(eager=True)
    deg, tris = _closed_triangles(e)
    tri_nodes = tris.select(F.explode(F.array("src", "v", "w")).alias("node"))
    return e, deg, tri_nodes


def _closed_triangles(e: DataFrame):
    """Degree-oriented triangle enumeration over a canonical
    (``a`` < ``b``) edge frame: returns (degrees(node, __deg),
    tris(src, v, w)) with ONE row per distinct triangle.  The wedge
    core shared by the node-exploding callers (triangle_count /
    clustering_coefficient via :func:`_oriented_triangles`) and the
    per-EDGE support peel (:func:`ktruss`), which re-runs it each
    round on a shrinking edge set."""
    touch = e.select(F.col("a").alias("node")).unionByName(
        e.select(F.col("b").alias("node"))
    )
    deg = touch.groupBy("node").agg(F.count(F.lit(1)).alias("__deg"))
    # the packed key is only a total order for ids in [0, 2³¹); out of
    # that range it would silently misorder (wrong counts) — so the
    # assumption fails LOUDLY instead, per row, inside the expression
    # (an unreferenced assert column would be pruned by Catalyst)
    ok = deg.select(
        "node",
        F.when(
            (F.col("node") >= 0) & (F.col("node") < F.lit(2147483648)),
            F.col("__deg") * F.lit(4294967296) + F.col("node"),
        )
        .otherwise(F.raise_error(F.lit("triangle orientation requires 0 <= node id < 2^31")))
        .alias("__ok"),
    )
    eab = e.join(
        ok.select(F.col("node").alias("a"), F.col("__ok").alias("ok_a")), "a"
    ).join(ok.select(F.col("node").alias("b"), F.col("__ok").alias("ok_b")), "b")
    orient = eab.select(
        F.when(F.col("ok_a") < F.col("ok_b"), F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(F.col("ok_a") < F.col("ok_b"), F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.greatest("ok_a", "ok_b").alias("ok_dst"),
    )
    o1 = orient.select("src", F.col("dst").alias("v"), F.col("ok_dst").alias("ok_v"))
    o2 = orient.select("src", F.col("dst").alias("w"), F.col("ok_dst").alias("ok_w"))
    wedges = (
        o1.join(o2, "src")
        .filter(F.col("ok_v") < F.col("ok_w"))
        .select("src", "v", "w")
    )
    closing = orient.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tris = wedges.join(closing, ["v", "w"])
    return deg, tris


def clustering_coefficient(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Per-node local clustering coefficient over canonical undirected
    edges: lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), 0 when deg < 2 —
    the standard community-density signal, sharing the degree-oriented
    wedge-closure core with :func:`triangle_count` (each closed wedge
    emits its three corners; a groupBy turns corner rows into per-node
    triangle counts, map-side combinable).  The only float op is the
    single final division of two exact integers — identical
    cross-engine.

    Returns (node, degree, n_triangles, lcc) for every node with at
    least one edge.
    """
    _e, deg, tri_nodes = _oriented_triangles(edges, id_a, id_b)
    tcnt = tri_nodes.groupBy("node").agg(F.count(F.lit(1)).alias("__tri"))
    return deg.join(tcnt, "node", "left").select(
        "node",
        F.col("__deg").alias("degree"),
        F.coalesce(F.col("__tri"), F.lit(0)).cast("long").alias("n_triangles"),
        F.when(
            F.col("__deg") >= 2,
            (F.coalesce(F.col("__tri"), F.lit(0)) * F.lit(2)).cast("double")
            / (F.col("__deg") * (F.col("__deg") - F.lit(1))).cast("double"),
        ).otherwise(F.lit(0.0)).alias("lcc"),
    )


def kcore(
    edges: DataFrame,
    k: int = 2,
    max_rounds: int = 40,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """k-core decomposition by iterative peeling → the maximal induced
    subgraph where every node keeps degree ≥ k; returns
    (node, core_deg) for its members, core_deg the degree INSIDE the
    core.  The standard graph-density pruning before community /
    centrality analysis: pendant chains and sparse fringe peel away,
    cycles and cliques survive.

    Per round: one degree aggregation + two semi-joins dropping edges
    with a peeled endpoint — everything linear in \\|E\\|, nothing
    super-linear materialized (the module contract).  Each round's
    edge set is ``localCheckpoint``-ed (the pagerank/kmeans lineage
    rule).  Convergence is detected by survivor COUNT equality, which
    here implies SET equality: peeling is monotone (alive sets only
    ever shrink), so equal cardinality is equal membership — one
    bounded driver scalar per round, the connected_components
    precedent.  A graph needing more than ``max_rounds`` peels raises
    rather than silently returning a non-core (the same loud-failure
    contract as the triangle order-key range guard above).
    """
    e = edges.select(F.col(src).alias("id_a"), F.col(dst).alias("id_b")).localCheckpoint()
    prev_n = -1
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("id_a").alias("node"))
            .unionAll(e.select(F.col("id_b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("core_deg"))
        )
        alive = deg.where(F.col("core_deg") >= k).localCheckpoint()
        n = alive.count()
        if n == prev_n:
            return alive
        prev_n = n
        e = (
            e.join(alive.select(F.col("node").alias("id_a")), "id_a", "semi")
            .join(alive.select(F.col("node").alias("id_b")), "id_b", "semi")
            .localCheckpoint()
        )
    raise RuntimeError(f"k-core peel did not converge within {max_rounds} rounds")


def ktruss(
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 40,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """k-truss decomposition by edge-support peeling → the maximal
    subgraph where every EDGE closes ≥ k−2 triangles inside the
    subgraph (Cohen's truss definition) — the cohesion refinement one
    step above :func:`kcore`'s degree pruning: a hub with many pendant
    neighbours survives a 2-core but keeps no 3-truss edge, while a
    near-duplicate clique keeps all of its edges, so truss membership
    separates genuinely dense communities from star topologies that
    merely LOOK dense by degree.

    Per round: one degree-oriented triangle enumeration over the
    surviving edges (:func:`_closed_triangles` — linear in wedges,
    O(√|E|) fan-out on skewed graphs), each triangle exploded into its
    three canonical (min, max) edges, one map-side-combinable per-edge
    support aggregation, and one filter dropping edges with support
    < k−2.  Dropping an edge can only LOWER other edges' support, so
    the edge set shrinks monotonically and the count-equality
    convergence test is sound (the :func:`kcore` argument verbatim);
    each round's survivors are ``localCheckpoint``-ed (the pagerank
    lineage rule).  A graph needing more than ``max_rounds`` peels
    raises loudly rather than returning a non-truss.

    Returns (src, dst, support) for the surviving canonical edges —
    ``support`` the in-truss triangle count of the edge (≥ k−2), so
    trussness-per-edge is readable straight off the result.

    Input edges are re-canonicalized (least, greatest) here because the
    per-round support join keys on the canonical form — a reversed
    input edge would otherwise silently match no support row and peel.
    Duplicate edge ROWS remain the caller's contract (they would
    inflate triangle multiplicity), the same undirected-simple-graph
    precondition :func:`triangle_count` and :func:`kcore` state.
    """
    t = k - 2
    e = edges.select(
        F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
    ).localCheckpoint()
    prev_n = -1
    for _ in range(max_rounds):
        _deg, tris = _closed_triangles(e)
        tri_edges = tris.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("src", "v").alias("ea"), F.greatest("src", "v").alias("eb")
                    ),
                    F.struct(
                        F.least("src", "w").alias("ea"), F.greatest("src", "w").alias("eb")
                    ),
                    F.struct(
                        F.least("v", "w").alias("ea"), F.greatest("v", "w").alias("eb")
                    ),
                )
            ).alias("ed")
        ).select(F.col("ed.ea").alias("a"), F.col("ed.eb").alias("b"))
        sup = tri_edges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))
        kept = (
            e.join(sup, ["a", "b"], "left")
            .select("a", "b", F.coalesce(F.col("support"), F.lit(0)).alias("support"))
            .where(F.col("support") >= t)
            .localCheckpoint()
        )
        n = kept.count()
        if n == prev_n:
            return kept.select(
                F.col("a").alias(src),
                F.col("b").alias(dst),
                F.col("support").cast("long").alias("support"),
            )
        prev_n = n
        e = kept.select("a", "b")  # kept is already checkpointed
    raise RuntimeError(f"k-truss peel did not converge within {max_rounds} rounds")


def truss_communities(
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 40,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Community labels over the k-truss: peel to the k-truss
    (:func:`ktruss`), then label its connected components by iterative
    min-label propagation (operators/dedup.py::connected_components —
    the same linear-per-round machinery the dedup cluster entry runs;
    truss-confined components are the classic dense-community
    extraction, e.g. Cohen 2008: trusses split exactly where
    communities touch only through weak ties, so the component ids ARE
    community ids).  Composition of two proven iterative cores — the
    peel shrinks monotonically, the propagation converges in diameter
    rounds, both ``localCheckpoint`` per round and carry only bounded
    convergence scalars to the driver.

    Returns (node, community, n_members) for every node keeping a
    truss edge — community the min reachable node id inside the truss,
    n_members its size (one extra map-side-combinable count + one
    same-keyed join; the size frame is at most one row per community,
    so AQE broadcasts it when small and shuffles it when a pathological
    graph makes it wide — no hint forces the wrong strategy at scale)."""
    from financial_data_stream_processing_engine_spark.operators.dedup import (
        connected_components,
    )

    kept = ktruss(edges, k=k, max_rounds=max_rounds, src=src, dst=dst)
    comp = connected_components(kept, id_a=src, id_b=dst).select(
        "node", F.col("component").alias("community")
    )
    sizes = comp.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return comp.join(sizes, ["community"]).select("node", "community", "n_members")


def partition_modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Per-community Newman modularity contributions of a node
    partition over an undirected simple graph — THE standard
    community-quality score: ``q_c = e_c/m − (d_c/(2m))²`` with ``m``
    the graph's edge count, ``e_c`` the community's intra edges and
    ``d_c`` its members' degree sum; ``Q = Σ_c q_c``.  Nodes without a
    row in ``labels(node, community)`` are their own singleton
    community (``e_c = 0``) — the convention that makes Q compare
    across partitions covering different node subsets (e.g. truss
    communities, which label only truss survivors).

    Plan shape: degrees by one map-side-combinable count, labels
    attached to the edge list by two node-keyed joins (the labels
    frame is node-sized — AQE broadcasts it when small, shuffles when
    not), per-community aggregation, and the exact 1-row ``m`` frame
    cross-joined.  Everything linear in \\|E\\|.

    Exactness: every aggregate is an exact BIGINT; ``q_contrib`` is
    three IEEE ops on exactly-representable integers (two divisions,
    one multiply, one subtract in a fixed shape) — bit-identical in
    any engine stating the same expression.

    Empty edge frame (m = 0, ADVICE r10): the ``/m`` divisions never
    execute — every output row descends from an edge endpoint
    (``touch`` → ``deg`` → ``ns``), so an empty ``edges`` yields an
    EMPTY result frame, not NaN/Inf rows; there is no divide-by-zero
    path to guard and no cross-engine IEEE-division divergence to
    worry about (tests/test_operators_graph.py pins this).

    Returns (community, n_members, is_labeled, intra_edges,
    degree_sum, q_contrib), ``is_labeled`` false exactly for the
    singleton rows."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    touch = e.select(F.col("a").alias("node")).unionByName(
        e.select(F.col("b").alias("node"))
    )
    deg = touch.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("__deg"))
    lab = deg.join(
        labels.select("node", "community"), ["node"], "left"
    ).select(
        "node",
        "__deg",
        F.coalesce(F.col("community"), F.col("node")).alias("community"),
        F.col("community").isNotNull().alias("__labeled"),
    )
    ns = lab.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.bool_or("__labeled").alias("is_labeled"),
        F.sum("__deg").cast("long").alias("degree_sum"),
    )
    la = lab.select(F.col("node").alias("a"), F.col("community").alias("__ca"))
    lb = lab.select(F.col("node").alias("b"), F.col("community").alias("__cb"))
    intra = (
        e.join(la, ["a"])
        .join(lb, ["b"])
        .where(F.col("__ca") == F.col("__cb"))
        .groupBy(F.col("__ca").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("__intra"))
    )
    m = e.agg(F.count(F.lit(1)).cast("long").alias("__m"))
    half = F.col("degree_sum").cast("double") / (F.col("__m") * F.lit(2)).cast("double")
    return (
        ns.join(intra, ["community"], "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_members",
            "is_labeled",
            F.coalesce(F.col("__intra"), F.lit(0)).cast("long").alias("intra_edges"),
            "degree_sum",
            (
                F.coalesce(F.col("__intra"), F.lit(0)).cast("double")
                / F.col("__m").cast("double")
                - half * half
            ).alias("q_contrib"),
        )
    )
