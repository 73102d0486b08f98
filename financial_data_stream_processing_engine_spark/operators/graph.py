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

from pyspark.sql import DataFrame, functions as F, types as T

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
    from pyspark.sql import Observation

    e = edges.select(F.col(src).alias("id_a"), F.col(dst).alias("id_b")).localCheckpoint()
    prev_n = -1
    for i in range(max_rounds):
        deg = (
            e.select(F.col("id_a").alias("node"))
            .unionAll(e.select(F.col("id_b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("core_deg"))
        )
        # one job per round (r17, the connected_components idiom): the
        # eager checkpoint materializes the survivors AND delivers the
        # convergence count through the observation — the separate
        # count() job it replaces re-scanned the checkpoint blocks
        obs = Observation(f"kcore_round_{i}")
        alive = (
            deg.where(F.col("core_deg") >= k)
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n = obs.get["n"]
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
    from pyspark.sql import Observation

    t = k - 2
    e = edges.select(
        F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
    ).localCheckpoint()
    prev_n = -1
    for i in range(max_rounds):
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
        # one job per round (r17, the connected_components idiom): the
        # eager checkpoint materializes the survivors AND delivers the
        # convergence count through the observation — no separate
        # count() job re-scanning the checkpoint blocks
        obs = Observation(f"ktruss_round_{i}")
        kept = (
            e.join(sup, ["a", "b"], "left")
            .select("a", "b", F.coalesce(F.col("support"), F.lit(0)).alias("support"))
            .where(F.col("support") >= t)
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n = obs.get["n"]
        if n == prev_n:
            return kept.select(
                F.col("a").alias(src),
                F.col("b").alias(dst),
                F.col("support").cast("long").alias("support"),
            )
        prev_n = n
        e = kept.select("a", "b")  # kept is already checkpointed
    raise RuntimeError(f"k-truss peel did not converge within {max_rounds} rounds")


def truss_labels(
    edges: DataFrame,
    k: int = 3,
    max_rounds: int = 40,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """(node, community) over the k-truss — the label sub-chain of
    :func:`truss_communities` WITHOUT the member-count aggregation:
    peel to the k-truss (:func:`ktruss`), then min-label connected
    components.  Callers that only consume the labels (the Louvain
    refine/coarsen chain, partition modularity — which re-derives any
    per-community sums it needs) previously paid truss_communities'
    community-keyed count exchange + size join just to project it away
    (r18, guide §1.2: don't compute what you throw away)."""
    from financial_data_stream_processing_engine_spark.operators.dedup import (
        connected_components,
    )

    kept = ktruss(edges, k=k, max_rounds=max_rounds, src=src, dst=dst)
    return connected_components(kept, id_a=src, id_b=dst).select(
        "node", F.col("component").alias("community")
    )


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
    convergence scalars to the driver.  Label-only consumers use
    :func:`truss_labels` (no size aggregation).

    Returns (node, community, n_members) for every node keeping a
    truss edge — community the min reachable node id inside the truss,
    n_members its size (one extra map-side-combinable count + one
    same-keyed join; the size frame is at most one row per community,
    so AQE broadcasts it when small and shuffles it when a pathological
    graph makes it wide — no hint forces the wrong strategy at scale)."""
    comp = truss_labels(edges, k=k, max_rounds=max_rounds, src=src, dst=dst)
    sizes = comp.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return comp.join(sizes, ["community"]).select("node", "community", "n_members")


#: applicationId → heap usage right after this module's last
#: System.gc() — the back-off floor for :func:`_iterative_gc_hint`.
_GC_LAST_AFTER: dict[str, int] = {}


def _iterative_gc_hint(spark) -> None:
    """Iterative-loop hygiene: each refinement round leaves behind
    broadcast relations and superseded checkpoint blocks whose
    JVM-side cleanup (ContextCleaner) is weak-reference-driven — it
    only fires after BOTH the Python references die (py4j holds them
    until a CPython gc pass) and a JVM GC runs.  Under a chained entry
    (truss peel → level-1 refine → coarsen → level-2 refine) the
    default 1 GiB local-mode heap accumulates collectable-but-
    uncollected garbage between rounds; one explicit collection per
    round keeps the live set round-sized at any number of rounds
    (measured: the chained level-2 fixture idles at ~100 MB after
    collection vs ~400-600 MB of pending garbage without it).  This is
    defensive hygiene — the EXPONENTIAL cost bug the level-2 chain
    exposed was localCheckpoint's origin-statistics compounding, fixed
    by the parquet spill in :func:`louvain_refine`.

    The CPython pass every call is a generation-1 collect: the round's
    py4j handles die young, and a full gen2 scan costs 0.1-0.3 s per
    call in long sessions (measured spikes) for objects whose release
    only matters when a JVM collection actually fires — so the FULL
    ``gc.collect()`` runs exactly then, immediately before
    ``System.gc()``, and promoted handles still release first.  The
    JVM ``System.gc()`` is a full stop-the-world collection,
    so it only fires when the heap is actually under pressure (used
    > 50% of max) — an idle-heap round skips it instead of paying fixed
    GC latency ~16 times per bench entry (ADVICE r11).

    Pressure alone is not sufficient (r14): late in a long session the
    heap's LIVE set (block-manager caches, code cache) can sit above
    50% permanently, and then every round would pay a full
    stop-the-world collection that reclaims nothing — measured as
    ~+10 s on ``graph_louvain_refine`` when benched after ~60 other
    entries vs standalone.  So the hint also tracks the post-GC usage
    of its LAST collection (per app) and only fires again once usage
    has grown ≥ 12.5 % of max beyond that floor — i.e. when there is
    actual garbage to reclaim.  If a collection reclaims little, the
    floor rises and the hint backs off; if it reclaims a lot, the
    floor drops and the hint stays responsive.  Worst-case garbage
    accumulation between collections is bounded at ~12.5 % of the
    heap — far below the 40-60 % pending-garbage problem the hint
    exists to prevent."""
    import gc

    gc.collect(1)
    try:
        rt = spark._jvm.java.lang.Runtime.getRuntime()
        used = rt.totalMemory() - rt.freeMemory()
        mx = rt.maxMemory()
        key = spark.sparkContext.applicationId
        if used * 2 > mx and used > _GC_LAST_AFTER.get(key, 0) + mx * 0.125:
            # full CPython pass first: gen2-promoted py4j handles must
            # release for the JVM collection to see their garbage
            gc.collect()
            spark._jvm.System.gc()
            # System.gc() may be serviced asynchronously, and another
            # thread can allocate between the call and this re-read —
            # an over-read would stamp the floor high and suppress
            # future collections longer than intended (ADVICE r14 #4).
            # Clamp to the pre-GC usage: the floor records "heap after
            # our last collection", which can never exceed the heap
            # BEFORE it.  Heuristic drift only in either direction —
            # the floor self-corrects at the next fired collection.
            after = rt.totalMemory() - rt.freeMemory()
            _GC_LAST_AFTER[key] = min(after, used)
    except Exception:  # pragma: no cover - Spark Connect has no _jvm
        pass


def _admit_moves_local(rows) -> list[tuple]:
    """Exact-integer driver-side replica of the round's priority
    blocking + combined conservative admission, for a BOUNDED
    (``small_admit``-collected) move set: dep/arr champions per
    source/target community, the two blocking predicates, prefix
    degree sums over the free rows in global (g desc, node asc)
    priority order, ``cg = g − k·(St_prev + Ss_prev) > 0`` admission,
    and the single-globally-best conflict-cycle fallback — the same
    decisions the Spark window plan makes, on plain Python ints
    (g arrives as decimal(38,0) → int, so nothing is lossy).  Returns
    ``[(node, tgt)]`` to apply."""
    sel = [
        {
            "node": r["node"],
            "k": int(r["k"]),
            "src": r["src"],
            "tgt": r["tgt"],
            "g": int(r["g"]),
        }
        for r in rows
    ]

    def pri(x):
        return (-x["g"], x["node"])

    dep: dict = {}
    arr: dict = {}
    for x in sel:
        d = dep.get(x["src"])
        if d is None or pri(x) < pri(d):
            dep[x["src"]] = x
        a = arr.get(x["tgt"])
        if a is None or pri(x) < pri(a):
            arr[x["tgt"]] = x
    free = [
        x
        for x in sel
        if not (x["tgt"] in dep and pri(dep[x["tgt"]]) < pri(x))
        and not (x["src"] in arr and pri(arr[x["src"]]) < pri(x))
    ]
    applied, st, ss = [], {}, {}
    for x in sorted(free, key=pri):
        if x["g"] - x["k"] * (st.get(x["tgt"], 0) + ss.get(x["src"], 0)) > 0:
            applied.append(x)
        st[x["tgt"]] = st.get(x["tgt"], 0) + x["k"]
        ss[x["src"]] = ss.get(x["src"], 0) + x["k"]
    if not applied:
        applied = [min(sel, key=pri)]
    return [(x["node"], x["tgt"]) for x in applied]


def louvain_refine(
    edges: DataFrame,
    labels: DataFrame,
    max_rounds: int = 20,
    src: str = "id_a",
    dst: str = "id_b",
    weight: str | None = None,
    small_admit: int = 4096,
) -> DataFrame:
    """One-level modularity-guided refinement of a node partition —
    the Louvain LOCAL-MOVE phase (Blondel et al. 2008) over an
    undirected simple graph, with :func:`partition_modularity` as the
    exact objective: per round every node considers adopting a
    NEIGHBOR community, and a deterministic non-interfering subset of
    strictly-improving moves is applied until no improving move
    exists.  Nodes without a ``labels(node, community)`` row start as
    their own singleton (the partition_modularity convention), so
    feeding truss-community labels refines exactly the partition the
    modularity entry scores.  NODE IDS AND COMMUNITY IDS SHARE ONE
    NAMESPACE under that convention: an explicit label whose community
    id equals some UNLABELED node's id silently merges with that node's
    singleton (by design for component/truss seeds, whose community ids
    are member node ids — a min-id seed can never collide with a
    non-member); callers minting community ids from a different
    namespace must keep them disjoint from unlabeled node ids.
    ``labels`` must hold AT MOST ONE row per node — a duplicate would
    fan out through the label join and double-count degrees in every
    Σtot, so it raises loudly (the audio basis-table convention).

    The gain test is EXACT INTEGER arithmetic — moving node i (degree
    ``k``) from community a to b changes Q by ``(k_{i→b} − k_{i→a})/m
    − k·(Σtot_b − Σtot_a + k)/(2m²)``, and multiplying through by the
    positive ``2m²`` gives the integer numerator

        g = 2m·(k_{i→b} − k_{i→a}) − k·(Σtot_b − Σtot_a + k)

    so ``ΔQ > 0  ⟺  g > 0`` with no float anywhere (decimal(38,0)
    here, HUGEINT in the oracle — the rolloff-comparison contract).

    Parallel-move soundness: per round the candidate set is thinned to
    per-node best (g desc, target asc), then PRIORITY BLOCKING
    (priority = g desc, node asc) makes each community's membership
    change ONE-DIRECTIONAL: an arrival into community c is dropped iff
    c's best departure has strictly higher priority, and a departure
    from s is dropped iff the best arrival into s has strictly higher
    priority.  In the surviving set no target community loses a member
    and no source community gains one (were an arrival into c and a
    departure from c both accepted, the arrival must beat c's best
    departure while the departure must beat c's best arrival — the
    total priority order forbids the cycle), and the globally best
    move beats every blocker, so it always survives.
    Survivors still interact through their Σtot terms — each arrival
    into b grows ``Σtot_b`` and (NEW in the multi-departure admission)
    each departure from a shrinks ``Σtot_a``, both shrinking later
    movers' true gains — so admission is a conservative COMBINED
    prefix: order survivors by global priority (g desc, node asc) and
    admit move j iff

        cg_j = g_j − k_j·(St_{j−1} + Ss_{j−1}) > 0

    where ``St`` cumulates the degrees of higher-priority survivors
    sharing j's TARGET and ``Ss`` those sharing j's SOURCE.  Applying
    the admitted moves in that order, mover j's true sequential gain
    is ``cg_j`` plus only nonnegative corrections: prior movers can
    shrink ``k_{j→src}`` (a co-departing neighbor) and grow
    ``k_{j→tgt}`` (a co-arriving neighbor) but never the reverse —
    blocking guarantees no prior mover LEFT j's target or ENTERED j's
    source — and the cumulative sums over-count by including
    non-admitted survivors (dropping a move only removes
    interference).  So every admitted move strictly increases Q even
    under simultaneous application, the round's ΔQ is a sum of
    positives, and a whole community can disperse in ONE round —
    multi-departure admission — instead of one departure per source
    per round (the r11 scale watch-item).  If the filters empty a
    non-empty candidate set (a
    conflict cycle), exactly ONE move — the globally best (g desc,
    node asc) — is applied instead, so every applied round strictly
    increases Q and the loop terminates (Q ranges over a finite set of
    rationals on the 1/(2m²) grid).  Convergence = a round with zero
    improving candidates; needing more than ``max_rounds``
    move-applying rounds raises loudly (the kcore/ktruss contract).
    An EMPTY edge frame raises — there is no modularity to refine at
    m = 0.

    Per-round cost: one degree-sum aggregation (community-sized), one
    neighbor-community count (linear in |E|), the candidate join
    (linear), three window argmaxes and the priority-blocking joins
    over a frame at most one row per NODE — nothing super-linear,
    zero per-round driver scalars (the setup's m and duplicate-label
    reads are ONE fused job), and the label frame spilled to parquet
    per WINDOWED round.  The probe plan is deliberately exchange-lean
    (VERDICT r14 #4 — under AQE every exchange is a driver-scheduled
    stage job, the measured tail floor): the label base CARRIES the
    static degree k so no deg join exists, and the node's
    own-community weight kia rides a window over the node partition
    the per-node best already shuffles on instead of a kic self-join.
    Every round opens with ONE bounded
    probe (``limit(small_admit + 1).collect()`` — driver-safe by the
    bound; the default 4096 is sized so fixture-scale graphs run EVERY
    round on the one-job path — 4096 five-field rows is a trivial
    driver collect, and the r15 measurement showed the window-path rounds
    cost ~1.5 s of checkpoint/window/spill machinery the driver path
    replaces with one dict fold); rounds whose move set fits (the
    convergence tail) skip the
    window admission plan entirely: the probe already IS the complete
    move set (limit only truncates when more rows exist), the
    identical exact-integer admission runs driver-side
    (:func:`_admit_moves_local`), and the applied moves fold into a
    driver-side overrides dict (bounded by small_admit × max_rounds)
    that every later round reads as base ⋈ ONE broadcast literal — a
    tail round is exactly ONE Spark job, with no plan compounding
    because each round joins the SAME parquet base
    (the Pregel stable-storage discipline; see
    the in-body note — Spark's localCheckpoint would carry origin
    statistics whose join-product sizeInBytes compounds EXPONENTIALLY
    in bit length across rounds, blowing up planning itself).

    WEIGHTED graphs (``weight`` = an integer edge-weight column, e.g.
    the :func:`community_coarsen` output — Louvain phase 2 runs this
    same local-move over the coarsened graph): the gain numerator
    generalizes verbatim with ``W = Σ weights`` in place of ``m``,
    weighted neighbor-community sums in place of counts, and weighted
    degrees ``k_i = Σ_{j≠i} w_ij + 2·w_ii`` — self-loop rows
    (``src = dst``, the coarsened intra-community weights) count twice
    in the degree (each self-loop contributes two edge-ends, the
    standard 2W degree-sum identity) and never propose a move (a node
    is always "adjacent" to its own community through them).  Weights
    stay integers, so the no-float decision-path guarantee is
    unchanged.  ``weight=None`` (default) is the unweighted simple
    graph: weight 1 per edge, self-loops absent by the module's
    simple-graph precondition.

    Returns (node, community, moved) for every node incident to an
    edge — the refined label and whether it differs from the input
    partition."""
    import os
    import time

    from pyspark.sql import Window

    from financial_data_stream_processing_engine_spark.io_utils import scratch_dir

    DEC = "decimal(38,0)"
    spark_s = edges.sparkSession
    _iterative_gc_hint(spark_s)

    # Round-state goes through PARQUET, not localCheckpoint — the
    # Pregel stable-storage discipline, and here a hard correctness-
    # of-cost requirement: Spark's localCheckpoint captures the origin
    # plan's STATISTICS, and a join's sizeInBytes is the PRODUCT of
    # its children's, so a checkpoint-carried stat compounds
    # exponentially in BIT LENGTH across refinement rounds (measured:
    # planning 1 s → 13 s → 172 s → BigInt-arithmetic OOM by round 3
    # on a 171-edge coarse graph).  A parquet round-trip resets stats
    # to true file sizes and fully truncates lineage; the per-round
    # write is label-frame-sized — exactly what a 1000-executor Pregel
    # loop checkpoints anyway.  The setup frames spill once too, so a
    # stats monster arriving via the INPUT frame (e.g. a coarsened
    # graph produced by a prior refinement level) is shed at the door.
    spill_root = scratch_dir("louvain_spill_")

    def spill(df: DataFrame, name: str) -> DataFrame:
        path = os.path.join(spill_root, name)
        df.write.mode("overwrite").parquet(path)
        return spark_s.read.parquet(path)

    w_col = F.lit(1).cast("long") if weight is None else F.col(weight).cast("long")
    e = spill(
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"),
            w_col.alias("w"),
        ),
        "e",
    )
    # ONE fused setup job for both bounded scalar reads (VERDICT r14
    # #4): total weight m and the duplicate-label guard are single-row
    # aggregates over different frames — crossJoin of two 1-row frames
    # collapses them into one collect instead of two scheduled jobs
    stats = (
        e.agg(F.sum("w").alias("s"))
        .crossJoin(
            labels.agg(
                F.count("*").alias("n"), F.countDistinct("node").alias("d")
            )
        )
        .collect()[0]
    )
    m = stats["s"] or 0
    if m == 0:
        raise ValueError("louvain_refine needs a non-empty edge frame (m = 0)")
    # duplicate-label guard (ADVICE r11): a second row for a node would
    # fan out through the left join below and double-count its degree
    # in every Σtot — caught before any state spills
    if stats["n"] != stats["d"]:
        raise ValueError(
            "louvain_refine: labels must have at most one row per node "
            f"({stats['n']} rows over {stats['d']} distinct nodes)"
        )
    # symmetrized NON-self adjacency: self-loops carry degree (2w
    # below) but are never a neighbor-community candidate edge
    nonself = e.where(F.col("a") != F.col("b"))
    sym = spill(
        nonself.select(F.col("a").alias("node"), F.col("b").alias("nb"), "w")
        .unionAll(
            nonself.select(F.col("b").alias("node"), F.col("a").alias("nb"), "w")
        ),
        "sym",
    )
    deg = (
        sym.select("node", "w")
        .unionAll(
            e.where(F.col("a") == F.col("b")).select(
                F.col("a").alias("node"), (F.col("w") * F.lit(2)).alias("w")
            )
        )
        .groupBy("node")
        .agg(F.sum("w").cast("long").alias("k"))
    )
    # the label base CARRIES the (static) degree k, so no per-round
    # deg join exists anywhere in the probe plan (VERDICT r14 #4) —
    # and deg itself needs no separate spill: it folds into lab0's one
    # spill job off the already-spilled sym/e
    lab0 = spill(
        deg.join(labels.select("node", "community"), ["node"], "left")
        .select("node", F.coalesce("community", "node").alias("community"), "k"),
        "lab0",
    )
    lab_base = lab0
    spark = edges.sparkSession
    # Tail-round label representation: small-move rounds do NOT spill
    # a new label frame — their applied moves accumulate in this
    # driver dict (bounded by small_admit × max_rounds, broadcastable
    # at any corpus scale) and every consumer reads the SAME
    # parquet-backed base joined with ONE broadcast of the overrides,
    # so per-tail-round cost collapses to the single probe job.  The
    # plan shape never compounds: each round's label relation is
    # base ⋈ one literal frame, regardless of how many tail rounds
    # have passed.  Big (windowed) rounds flush the overrides into a
    # fresh spilled base first — their plans are data-sized anyway.
    overrides: dict = {}
    node_t = {f.name: f.dataType for f in lab0.schema.fields}

    def cur_lab() -> DataFrame:
        if not overrides:
            return lab_base
        ov = spark.createDataFrame(
            list(overrides.items()),
            T.StructType(
                [
                    T.StructField("node", node_t["node"]),
                    T.StructField("__new", node_t["community"]),
                ]
            ),
        )
        return lab_base.join(F.broadcast(ov), ["node"], "left").select(
            "node", F.coalesce("__new", "community").alias("community"), "k"
        )

    # per-round wall-clock tracing (gc vs probe split), opt-in via env
    # var — the measurement harness behind the r15 floor analysis in
    # docs/ARCHITECTURE.md; zero work when unset
    _dbg = bool(os.environ.get("SPARK_GRAFT_LOUVAIN_DEBUG"))
    _t0 = _t1 = 0.0
    for i in range(max_rounds + 1):
        if _dbg:
            _t0 = time.time()
        _iterative_gc_hint(spark)
        if _dbg:
            _t1 = time.time()
        lab = cur_lab()
        tot = lab.groupBy("community").agg(F.sum("k").cast("long").alias("tot"))
        kic = (
            sym.join(
                lab.select(F.col("node").alias("nb"), F.col("community").alias("c")),
                ["nb"],
            )
            .groupBy("node", "c")
            .agg(F.sum("w").cast("long").alias("kic"))
        )
        g = (
            F.lit(2 * m).cast(DEC)
            * (F.col("kic") - F.coalesce(F.col("kia"), F.lit(0))).cast(DEC)
            - F.col("k").cast(DEC)
            * (F.col("tot_b") - F.col("tot_a") + F.col("k")).cast(DEC)
        )
        # kia (the node's weight into its OWN community) rides a window
        # over the node partition instead of a kic self-join: the
        # per-node best below already shuffles on node, so the own
        # lookup costs one extra window function in an exchange the
        # plan pays anyway — two joins fewer per round (VERDICT r14 #4).
        # max() over at most one matching row per (node, c) group is
        # exact; NULL (no intra-community edge) keeps the old
        # left-join-then-coalesce semantics.
        cand = (
            lab.join(kic, ["node"])
            .withColumn(
                "kia",
                F.max(
                    F.when(F.col("c") == F.col("community"), F.col("kic"))
                ).over(Window.partitionBy("node")),
            )
            .where(F.col("c") != F.col("community"))
            .join(
                tot.select(F.col("community").alias("c"), F.col("tot").alias("tot_b")),
                ["c"],
            )
            .join(tot.select("community", F.col("tot").alias("tot_a")), ["community"])
            .select(
                "node",
                "k",
                F.col("community").alias("src"),
                F.col("c").alias("tgt"),
                g.alias("g"),
            )
            .where(F.col("g") > 0)
        )
        best = (
            cand.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("node").orderBy(F.col("g").desc(), "tgt")
                ),
            )
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        # ONE bounded probe job decides the round's path AND, in the
        # tail, IS the whole move-set read (VERDICT r13 #3): a
        # limit(small_admit + 1) collect is driver-safe by the bound,
        # returns the COMPLETE move set whenever it fits (limit only
        # truncates when more rows exist), and replaces the former
        # checkpoint + count + collect trio — three per-round jobs →
        # one across the convergence tail, which is most rounds.
        # Early rounds whose move set overflows the probe pay one
        # extra (early-aborting) execution of the plan before the
        # checkpoint — they are few and data-sized, the tail is many
        # and floor-sized.
        probe = best.limit(small_admit + 1).collect()
        if _dbg:
            print(
                f"[louvain] round {i}: gc {_t1 - _t0:.3f}s "
                f"probe {time.time() - _t1:.3f}s moves {len(probe)}",
                flush=True,
            )
        if len(probe) == 0:
            return lab.join(
                lab0.select("node", F.col("community").alias("__c0")), ["node"]
            ).select(
                "node",
                "community",
                (F.col("community") != F.col("__c0")).alias("moved"),
            )
        if i == max_rounds:
            raise RuntimeError(
                f"louvain_refine did not converge within {max_rounds} rounds"
            )
        if len(probe) <= small_admit:
            # small-move-set fast path (VERDICT r12 #3): the
            # convergence TAIL is many rounds of a handful of
            # remaining moves, where the four admission window
            # exchanges + the applied checkpoint/count cost pure
            # per-round overhead.  The move set is driver-sized by
            # the probe bound, so run the IDENTICAL exact-integer
            # admission in Python
            # (:func:`_admit_moves_local` — the randomized sweeps in
            # tests/test_graph.py pin both paths node-for-node
            # against the pure-Python replica), then broadcast the
            # tiny applied frame into the label update.  At 100 TB
            # the first rounds take the Spark window path (the move
            # set is O(|V|) there); only the bounded tail lands here.
            # The applied moves fold into the driver-side overrides —
            # NO label spill in tail rounds (see cur_lab above): the
            # whole round cost was the one probe job.
            for node, tgt in _admit_moves_local(probe):
                overrides[node] = tgt
            continue
        # big-move-set Spark window path: materialize the full move
        # set once (the probe above saw only its first rows).  The
        # label update at the bottom spills base ⋈ overrides ⋈ applied
        # in one write and clears the overrides — any accumulated tail
        # moves flush with it.
        sel = best.localCheckpoint()
        # priority blocking: dep = the BEST departure per source
        # community (multiple departures per source are now in play);
        # arr = the best arrival per target community
        dep = (
            sel.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("src").orderBy(F.col("g").desc(), "node")
                ),
            )
            .where(F.col("rn") == 1)
            .select(
                F.col("src").alias("tgt"),
                F.col("g").alias("__dg"),
                F.col("node").alias("__dn"),
            )
        )
        arr = (
            sel.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("tgt").orderBy(F.col("g").desc(), "node")
                ),
            )
            .where(F.col("rn") == 1)
            .select(
                F.col("tgt").alias("src"),
                F.col("g").alias("__ag"),
                F.col("node").alias("__an"),
            )
        )
        higher_dep = (F.col("__dg") > F.col("g")) | (
            (F.col("__dg") == F.col("g")) & (F.col("__dn") < F.col("node"))
        )
        higher_arr = (F.col("__ag") > F.col("g")) | (
            (F.col("__ag") == F.col("g")) & (F.col("__an") < F.col("node"))
        )
        free = (
            sel.join(dep, ["tgt"], "left")
            .where(~F.coalesce(higher_dep, F.lit(False)))
            .join(arr, ["src"], "left")
            .where(~F.coalesce(higher_arr, F.lit(False)))
            .select("node", "k", "src", "tgt", "g")
        )
        # combined conservative admission: cumulative survivor degrees
        # per TARGET (Σtot_b growth) and per SOURCE (Σtot_a shrinkage),
        # both in global priority order — see the docstring proof
        wt = Window.partitionBy("tgt").orderBy(F.col("g").desc(), "node")
        ws = Window.partitionBy("src").orderBy(F.col("g").desc(), "node")
        prefix = (
            free.select(
                "*",
                F.coalesce(
                    F.sum("k").over(wt.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0),
                ).alias("st_prev"),
                F.coalesce(
                    F.sum("k").over(ws.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0),
                ).alias("ss_prev"),
            )
            .withColumn(
                "cg",
                F.col("g")
                - F.col("k").cast(DEC)
                * (F.col("st_prev") + F.col("ss_prev")).cast(DEC),
            )
            .where(F.col("cg") > 0)
        )
        applied = prefix.select("node", "tgt", "g").localCheckpoint()
        if applied.count() == 0:
            # conflict cycle: apply the single globally-best move —
            # strict Q increase, guaranteed progress
            applied = sel.orderBy(F.col("g").desc(), "node").limit(1).localCheckpoint()
        lab_base = spill(
            lab.join(
                applied.select("node", F.col("tgt").alias("__new")), ["node"], "left"
            ).select(
                "node", F.coalesce("__new", "community").alias("community"), "k"
            ),
            f"lab_{i}",
        )
        overrides.clear()  # folded into the spill above (lab = cur_lab())
    raise AssertionError("unreachable")  # pragma: no cover


def community_coarsen(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    weight: str | None = None,
) -> DataFrame:
    """Community-graph coarsening — the AGGREGATE step of Louvain
    (Blondel et al. 2008 phase 2) and the generic graph-shrinking
    primitive: collapse every community to one supernode and return
    the weighted super-edges ``(community_a, community_b, weight)``
    with ``community_a ≤ community_b`` canonical — the ``a = b`` rows
    carry the community's INTRA-edge count (its self-loop weight), the
    ``a < b`` rows the inter-community edge counts.  Unlabeled nodes
    are their own singleton community (the :func:`partition_modularity`
    convention), so the coarsened graph's total weight always equals
    ``m`` and modularity is preserved under the standard weighted
    reading.

    ``weight``: name of an integer edge-weight column on ``edges``, or
    None for the unweighted simple graph (weight 1 per edge).  Passing
    the PREVIOUS coarsen's ``weight`` column makes the operator
    self-composable (a third Louvain level coarsens an
    already-weighted graph) — summing weights, where a bare row count
    would silently discard them and break the total-weight = m
    invariant every later level depends on.

    Plan shape: two node-keyed label joins onto the edge list (the
    labels frame is node-sized — AQE broadcasts it when small), one
    least/greatest canonicalization, one map-side-combinable sum
    keyed (ca, cb).  Linear in |E|, one shuffle, all-integer output —
    nothing to quantize."""
    w_col = F.lit(1).cast("long") if weight is None else F.col(weight).cast("long")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"), w_col.alias("__w"))
    touch = e.select(F.col("a").alias("node")).unionByName(
        e.select(F.col("b").alias("node"))
    )
    lab = (
        touch.distinct()
        .join(labels.select("node", "community"), ["node"], "left")
        .select("node", F.coalesce("community", "node").alias("community"))
    )
    la = lab.select(F.col("node").alias("a"), F.col("community").alias("__ca"))
    lb = lab.select(F.col("node").alias("b"), F.col("community").alias("__cb"))
    return (
        e.join(la, ["a"])
        .join(lb, ["b"])
        .groupBy(
            F.least("__ca", "__cb").alias("community_a"),
            F.greatest("__ca", "__cb").alias("community_b"),
        )
        .agg(F.sum("__w").cast("long").alias("weight"))
    )


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
