"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``   — brute-force exact top-k: one pass over the corpus
                      (map + TakeOrderedAndProject); the baseline and
                      the correctness oracle.
* ``random_hyperplane_buckets`` — sign-LSH bucketing: the scale path
                      for near-dup/similarity at corpus scale (restrict
                      exact scoring to one bucket or multi-probe
                      neighbors).
* ``ivf_search``    — inverted-file ANN: coarse centroids partition the
                      corpus; a query probes the nearest ``nprobe``
                      cells only.  At 100 TB this is partition pruning
                      for vectors: cluster id is a partition column and
                      the scan touches nprobe/ncells of the data.

Everything is built-in expressions (fold-based dot products); LSH plane
components are derived from xxhash64 so bucketing is deterministic
(no RNG, reproducible across runs/engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from financial_data_stream_processing_engine_spark.functions.exprs import bind
from financial_data_stream_processing_engine_spark.functions.numeric import davg, qint
from financial_data_stream_processing_engine_spark.operators.dedup import (
    cosine,
    pair_dot_udf,
    vector_norm,
)


class PersistHandle:
    """Caller-owned lifecycle for frames an operator persists on the
    caller's behalf.  Lazy results mean the operator cannot know when
    its caller's consuming action has run, so release is explicit — but
    the registry must be OWNED BY THE CALL SITE, not module-global: a
    shared global pins corpus-sized MEMORY_AND_DISK blocks for the
    whole session if any caller forgets to release, and interleaved
    callers would unpersist each other's frames (ADVICE r15 #1).

    Usage::

        with PersistHandle() as h:
            pairs = bucketed_cosine_pairs(embs, persists=h)
            pairs.count()          # materialize while blocks are hot
        # h released on exit — including on failure
    """

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def track(self, df: DataFrame) -> DataFrame:
        """Register an already-persisted frame; returns it unchanged."""
        self._frames.append(df)
        return df

    def release(self, blocking: bool = False) -> int:
        """Unpersist every tracked frame and clear the handle; returns
        how many were released.  Idempotent."""
        n = 0
        while self._frames:
            df = self._frames.pop()
            try:
                df.unpersist(blocking=blocking)
                n += 1
            except Exception:  # pragma: no cover - session already stopped
                pass
        return n

    def __enter__(self) -> "PersistHandle":
        return self

    def __exit__(self, *exc: object) -> None:
        self.release()


def cosine_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a single-row query DataFrame.

    The query side is crossJoin-broadcast (1 row); ranking goes through
    orderBy+limit ⇒ TakeOrderedAndProject (per-partition heap, no
    global sort).  Ties broken by id for determinism.
    """
    q = query.select(F.col(vec_col).alias("__qvec"))
    return (
        corpus.crossJoin(F.broadcast(q))
        .withColumn("cos", cosine(F.col(vec_col), F.col("__qvec")))
        .select(id_col, "cos")
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def random_hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    num_planes: int = 8,
    out_col: str = "bucket",
) -> DataFrame:
    """Sign-LSH bucket id in [0, 2^num_planes) per vector.

    Plane p's component for dimension i is a deterministic ±1 derived
    from xxhash64(p, i) — no RNG state, so the same vector always lands
    in the same bucket (across runs AND across the train/query sides).

    Cosine-similar vectors collide with probability 1 - θ/π per plane;
    use multi-probe (flip low-confidence bits) for recall at scale.
    """
    vec = F.col(vec_col)
    bits = []
    for p in range(num_planes):
        # dot(vec, plane_p) where plane_p[i] = ±1 from hash(p, i)
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda v, i: F.when(
                    F.xxhash64(F.lit(p), i) % 2 == 0, v.cast("double")
                ).otherwise(-v.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return df.withColumn(out_col, bucket.cast("int"))


def bucketed_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 4,
    threshold: float = 0.95,
    multiprobe: bool = True,
    persists: "PersistHandle | None" = None,
) -> DataFrame:
    """Near-dup pairs restricted to sign-LSH buckets — the corpus-scale
    variant of ``dedup.embedding_cosine_pairs`` (candidate count scales
    with bucket size, not corpus²).

    With ``multiprobe`` the left side also probes every Hamming-1
    neighbor bucket, so a pair is found iff its two bucket ids differ in
    ≤1 bit: per-plane collision probability p = 1-θ/π turns into
    p^n + n·(1-p)·p^(n-1) recall — e.g. 0.13 → 0.47 at θ≈72°, n=4 —
    for (n+1)× candidate volume, still linear in corpus size.  Each
    qualifying pair matches exactly one probe (the XOR mask is unique),
    so no distinct is needed.
    """
    # materialize the bucketing ONCE when the caller hands us a
    # PersistHandle: the a/b branches of the self-join are different
    # subtrees (the probe side explodes its masks before the exchange),
    # so Spark cannot reuse the exchange and would otherwise run the
    # num_planes hash folds + the norm over the whole corpus twice —
    # the same duplication dedup.minhash_lsh_pairs documents and avoids
    # via bucket-collect.  persist (not localCheckpoint): this frame is
    # CORPUS-sized, and a checkpoint's lineage cut makes its
    # non-reliable executor blocks unrecoverable under executor loss —
    # MEMORY_AND_DISK keeps the single-computation reuse and stays
    # recomputable (ADVICE r13 #4).  Without a handle the operator
    # persists NOTHING (the bucketing recomputes on each branch):
    # correctness is identical and no block can ever leak — callers who
    # care about the 2× scan opt in and own the release (ADVICE r15 #1)
    bucketed = random_hyperplane_buckets(
        df, vec_col=vec_col, num_planes=num_planes
    ).withColumn("__nrm", vector_norm(F.col(vec_col)))
    if persists is not None:
        from pyspark import StorageLevel

        bucketed = persists.track(
            bucketed.persist(StorageLevel.MEMORY_AND_DISK)
        )
    masks = [0] + ([1 << p for p in range(num_planes)] if multiprobe else [])
    a = bucketed.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
        F.col("__nrm").alias("na"),
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("bucket"),
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
        F.col("__nrm").alias("nb"),
        "bucket",
    )
    dot = pair_dot_udf()
    return (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.try_divide(dot(F.col("v_a"), F.col("v_b")), F.col("na") * F.col("nb")),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric max-abs int8 quantization + error audit —
    the standard 4× vector-store compression for ANN at corpus scale.

    q_i = floor(v_i / scale · 127 + 0.5) (round-half-up, stated
    explicitly so external engines reproduce it bit-for-bit), with
    scale = max|v_i|.  Output keeps the int8 codes plus the
    reconstruction-error audit (max abs error, MSE) so a pipeline can
    gate on quantization quality.  All-zero vectors quantize to zeros
    with scale 0 (no division: the zero branch is explicit — ANSI mode
    raises on x/0).

    Pure per-row array expressions: no shuffle, no Python, linear scan.
    Every derived value (the cast vector, the scale, the codes, the
    dequantized vector, the error array) is ``bind``-bound
    (functions.exprs) so each is evaluated ONCE per row — the previous
    spelling embedded ``scale`` (itself an O(d) array_max) inside the
    per-element quantize/dequantize lambdas, an O(d²) re-evaluation.
    """
    zero = F.lit(0.0)

    def over_v(v: Column) -> Column:
        def over_scale(scale: Column) -> Column:
            q = F.when(
                scale > zero,
                F.transform(
                    v, lambda x: F.floor(x / scale * 127.0 + 0.5).cast("int")
                ),
            ).otherwise(F.transform(v, lambda x: F.lit(0)))

            def over_q(qq: Column) -> Column:
                dq = F.when(
                    scale > zero,
                    F.transform(qq, lambda c: c.cast("double") * scale / 127.0),
                ).otherwise(F.transform(qq, lambda c: zero))

                def over_err(err: Column) -> Column:
                    return F.struct(
                        F.size(v).alias("n_dims"),
                        scale.alias("scale"),
                        qq.alias("q"),
                        F.array_max(err).alias("max_abs_err"),
                        (
                            F.aggregate(
                                err, F.lit(0.0), lambda acc, e: acc + e * e
                            )
                            / F.size(v).cast("double")
                        ).alias("mse"),
                    )

                return bind(
                    F.zip_with(dq, v, lambda d, x: F.abs(d - x)), over_err
                )

            return bind(q, over_q)

        return bind(F.array_max(F.transform(v, F.abs)), over_scale)

    st = bind(F.transform(F.col(vec_col), lambda x: x.cast("double")), over_v)
    return df.select(F.col(id_col), st.alias("__st")).select(
        id_col,
        F.col("__st.n_dims").alias("n_dims"),
        F.col("__st.scale").alias("scale"),
        F.col("__st.q").alias("q"),
        F.col("__st.max_abs_err").alias("max_abs_err"),
        F.col("__st.mse").alias("mse"),
    )


def train_centroids(
    corpus: DataFrame,
    by: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Mean vector per ``by`` group → (centroid_id, centroid).

    Offline coarse-quantizer "training": any partitioning column works
    (a label, an LSH bucket, a sampled k-means assignment).  Aggregates
    element-wise with posexplode + groupBy — scales to any corpus.
    """
    exploded = corpus.select(
        F.col(by).alias("centroid_id"), F.posexplode(vec_col).alias("pos", "v")
    )
    # decimal-exact mean (functions.numeric.davg): order-independent, so
    # centroids — and every downstream cell assignment — are
    # bit-identical at any parallelism / cluster size.
    means = exploded.groupBy("centroid_id", "pos").agg(
        davg(F.col("v").cast("double"), "m")
    )
    return (
        means.groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            "centroid_id",
            F.transform("pm", lambda s: s["m"].cast("float")).alias("centroid"),
        )
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Attach the nearest-centroid id to every corpus vector.

    Centroids broadcast (they are tiny by construction); argmin via
    per-centroid cosine + struct-max trick, all built-in.

    PRECONDITION: corpus rows are distinct across ``corpus.columns``
    (every catalog corpus carries a unique vec_id/doc_id, so this
    holds by construction there).  The argmax groups by the full row,
    so a corpus containing bit-identical duplicate rows would collapse
    them to one — callers feeding anonymous/duplicated rows must add a
    distinct id first.  Grouping also requires every column to be
    group-able (no map-typed columns).
    """
    c = centroids.select(
        F.col("centroid_id").alias("__cid"), F.col("centroid").alias("__cvec")
    )
    scored = corpus.crossJoin(F.broadcast(c)).withColumn(
        "__sim", cosine(F.col(vec_col), F.col("__cvec"))
    )
    w_cols = [x for x in corpus.columns]
    best = (
        scored.groupBy(*w_cols)
        .agg(F.max(F.struct(F.col("__sim"), F.col("__cid"))).alias("__best"))
        .withColumn(out_col, F.col("__best.__cid"))
        .drop("__best")
    )
    return best


def kmeans_train(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: bool = False,
) -> DataFrame:
    """Lloyd-iteration spherical k-means for the coarse quantizer →
    (centroid_id, centroid).

    This is the data-driven replacement for ``train_centroids(by=
    label)``: IVF recall and SemDeDup's largest-cell bound both depend
    on cell balance, and at corpus scale there is no label column to
    lean on — the cells must come from the data.  Design choices, all
    made for engine-exact determinism (the oracle recomputes every
    iteration):

    * **Seeds** — the ``k`` smallest-``id_col`` vectors.  Fully
      deterministic and trivially SQL-expressible; Lloyd iterations
      correct mediocre seeds, and determinism is worth more here than
      k-means++ (whose sampling is RNG-dependent).
    * **Assignment** — argmax cosine with ties to the larger
      centroid_id (identical rule to :func:`assign_cells`, so search
      and training share one code path).  cosine(v, c) is scale-
      invariant in c, so the un-normalized mean update below yields
      the same assignments as the normalized spherical update.
    * **Update** — element-wise mean through the decimal-exact
      ``davg`` (posexplode + groupBy in :func:`train_centroids`):
      order-independent, hence bit-identical centroids at any
      parallelism.  Cast to float like every stored embedding.
    * **Empty cells** keep their previous centroid (left join +
      coalesce) so k never silently shrinks.

    Each iteration is one corpus scan (broadcast centroids, no
    shuffle for assignment) plus one posexplode aggregation — linear
    in corpus size, so at 100 TB the cost is iters × (scan + agg) on a
    sampled subset if desired.  With large ``iters`` pass
    ``checkpoint=True`` to truncate the growing lineage (the PageRank
    pattern — the k-row centroid frame is tiny to materialize).
    """
    cent = (
        corpus.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("centroid"),
        )
    )
    vecs = corpus.select(id_col, vec_col)
    for _ in range(iters):
        assigned = assign_cells(vecs, cent, vec_col=vec_col, out_col="__cell")
        means = train_centroids(assigned, by="__cell", vec_col=vec_col)
        cent = (
            cent.select("centroid_id", F.col("centroid").alias("__prev"))
            .join(means, "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce("centroid", "__prev").alias("centroid"),
            )
        )
        if checkpoint:
            cent = cent.localCheckpoint(eager=True)
    return cent


def kmeans_objective(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
) -> float:
    """Mean cosine of every vector to its assigned centroid — the
    (negated) spherical k-means objective, for convergence tests.

    PER-ROW mean, not per-distinct-vector: duplicate vectors carry
    their multiplicity (groupBy(vec) alone would weight a vector that
    appears 50 times the same as one that appears once — wrong
    whenever the corpus has near-dup structure, which is the normal
    case here).  The crossJoin gives each distinct vector k×mult rows,
    and the k cancels in the weighted mean, so the weights are just
    the group row counts."""
    assigned = corpus.crossJoin(
        F.broadcast(
            centroids.select(
                F.col("centroid_id").alias("__cid"),
                F.col("centroid").alias("__cvec"),
            )
        )
    ).withColumn("__sim", cosine(F.col(vec_col), F.col("__cvec")))
    best = assigned.groupBy(vec_col).agg(
        F.max("__sim").alias("__best"),
        F.count(F.lit(1)).alias("__k_rows"),
    )
    row = best.agg(
        (
            F.sum(F.col("__best") * F.col("__k_rows")) / F.sum("__k_rows")
        ).alias("__obj")
    ).collect()[0]
    return row["__obj"]


def ivf_search(
    corpus_with_cells: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """ANN: score only the ``nprobe`` cells nearest to the query.

    At scale ``corpus_with_cells`` is written partitioned by
    ``cell_col``; the filter below becomes partition pruning and the
    scan reads nprobe/ncells of the corpus.  Recall < 1 by design —
    validate against cosine_topk on a sample (see tests).
    """
    q = query.select(F.col(vec_col).alias("__qvec"))
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .withColumn("__sim", cosine(F.col("centroid"), F.col("__qvec")))
        .orderBy(F.col("__sim").desc(), F.col("centroid_id"))
        .limit(nprobe)
        .select(F.col("centroid_id").alias(cell_col))
    )
    pruned = corpus_with_cells.join(F.broadcast(probe_cells), cell_col, "left_semi")
    return cosine_topk(pruned, query, k=k, id_col=id_col, vec_col=vec_col)


def multiquery_ivf_topk(
    corpus_with_cells: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    cell_col: str = "cell",
) -> DataFrame:
    """Batched ANN: top-``k`` per query for a whole query BATCH in one
    plan — the retrieval-eval shape (N queries × corpus), not N driver
    loops.

    Plan: rank centroids per query (tiny: Q×cells, broadcast
    centroids), keep ``nprobe`` cells per query, then join the corpus
    to the probed (query, cell) pairs ON THE CELL KEY with the probe
    side broadcast — the corpus is touched once and only rows in
    probed cells are scored; a query batch never replicates the
    corpus.  Final per-query top-k via one window.  Over a persisted
    IVF index (``save_ivf_index``) the cell join becomes partition
    pruning.  Returns (query_id, id, cos, rank).
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    scored = q.crossJoin(F.broadcast(centroids)).withColumn(
        "__sim", cosine(F.col("centroid"), F.col("__qvec"))
    )
    wp = Window.partitionBy("__qid").orderBy(
        F.col("__sim").desc(), F.col("centroid_id")
    )
    probes = (
        scored.withColumn("__rk", F.row_number().over(wp))
        .filter(F.col("__rk") <= nprobe)
        .select("__qid", "__qvec", F.col("centroid_id").alias(cell_col))
    )
    cand = corpus_with_cells.join(F.broadcast(probes), cell_col).withColumn(
        "cos", cosine(F.col(vec_col), F.col("__qvec"))
    )
    wk = Window.partitionBy("__qid").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id_col), id_col, "cos", "rank"
        )
    )


# ---------------------------------------------------------------------------
# IVF index lifecycle (build once, query many)
# ---------------------------------------------------------------------------


def save_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Persist an IVF index: centroids + the cell-assigned corpus,
    PARTITIONED BY cell — so a later search with nprobe=p reads only p
    partitions off storage (partition pruning does the cell filter
    before any row is touched).  This is the "build once, query many"
    lifecycle: assignment (the expensive scan) runs once; every query
    session after that is a metadata read + p partition scans.
    """
    assigned = assign_cells(corpus, centroids, vec_col=vec_col)
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/corpus")


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(corpus_with_cells, centroids) back from :func:`save_ivf_index`.

    The corpus frame's ``cell`` is a physical partition column: an
    ``ivf_search`` over it prunes to the probed cells at the source
    (visible as ``PartitionFilters`` in the scan node).
    """
    corpus = spark.read.parquet(f"{path}/corpus")
    centroids = spark.read.parquet(f"{path}/centroids")
    return corpus, centroids


def maintain_ivf_index(
    spark,
    path: str,
    diff: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Apply a CDC change feed to a persisted IVF index — no retrain,
    no full re-encode: only the partitions whose cell membership the
    delta touches are rewritten.

    ``diff`` is the :func:`~financial_data_stream_processing_engine_spark.operators.scale.table_diff`
    shape — (id, change_type ∈ I/D/U, old_val, new_val) with
    ``vec_col`` inside the value structs.  Because cell assignment is
    a DETERMINISTIC function of the vector (argmax cosine, ties to
    the larger centroid id — the same rule as :func:`assign_cells`),
    the feed alone determines every touched partition: a D/U row's
    OLD cell is recomputed from ``old_val`` (no index scan to look it
    up), an I/U row's NEW cell from ``new_val``.  Maintenance is then

    1. touched = cells(old of D∪U) ∪ cells(new of I∪U) — bounded by
       min(|delta|, n_cells); a broadcast SEMI-JOIN on the partition
       column prunes the survivor read to the touched partitions
       (dynamic partition pruning at the scan), with no driver-side
       literal list — a wide delta (bulk reingest) stays a join, not
       a million-element ``isin`` expression (ADVICE r11);
    2. survivors = touched partitions minus D∪U keys (anti join
       against the broadcast-size delta keys);
    3. write survivors ∪ upserts with dynamic partition overwrite —
       untouched partitions are never read or written;
    4. a touched cell left EMPTY by the delta is removed explicitly
       (dynamic overwrite only replaces partitions present in the
       written frame — the same metadata delete a lake-format MERGE
       issues for emptied partitions); the emptied set is touched ∖
       written, both read off Observations riding steps 1 and 3's own
       jobs (r18 — no extra driver job), so the loop runs only over
       genuinely emptied cells.

    The rewrite set is materialized (``localCheckpoint``) before the
    overwrite because Spark refuses a self-referencing file overwrite
    on an unbroken lineage; the set is delta-sized, exactly what a
    merge-on-read compaction materializes.  Cost: O(|delta| +
    touched-partition bytes) — at 100 TB a corpus change feed costs
    the few cells it touches, not the corpus scan + Lloyd retrain of
    a rebuild.  Returns the touched-cell frame (cell ids).
    """
    from pyspark.sql import Observation

    up = diff.filter(F.col("change_type").isin("I", "U")).select(
        F.col(id_col), F.col(f"new_val.{vec_col}").alias(vec_col)
    )
    gone_old = diff.filter(F.col("change_type").isin("D", "U")).select(
        F.col(id_col), F.col(f"old_val.{vec_col}").alias(vec_col)
    )
    up_cells = assign_cells(up, centroids, vec_col=vec_col, out_col="cell")
    old_cells = assign_cells(gone_old, centroids, vec_col=vec_col, out_col="cell")
    # one job, not two (r18, the kcore/connected_components idiom): the
    # eager checkpoint materializes the touched frame AND delivers the
    # cell set through the observation — the separate count() job (and
    # below, the emptied-cells collect() job) re-scanned what the
    # checkpoint/write job had just materialized.  The set is bounded
    # by min(|delta|, n_cells), driver-safe by construction.
    obs_touched = Observation()
    touched = (
        up_cells.select("cell")
        .union(old_cells.select("cell"))
        .distinct()
        .observe(obs_touched, F.collect_set("cell").alias("cells"))
        .localCheckpoint(eager=True)
    )
    touched_cells = set(obs_touched.get["cells"])
    if not touched_cells:  # empty delta: nothing to rewrite
        return touched

    corpus = spark.read.parquet(f"{path}/corpus")
    stale_keys = diff.filter(F.col("change_type").isin("D", "U")).select(id_col)
    survivors = corpus.join(F.broadcast(touched), "cell", "left_semi").join(
        F.broadcast(stale_keys), id_col, "left_anti"
    )
    obs_written = Observation()
    new_content = (
        survivors.unionByName(up_cells.select(*survivors.columns))
        .observe(obs_written, F.collect_set("cell").alias("cells"))
        .localCheckpoint(eager=True)
    )
    written_cells = set(obs_written.get["cells"])

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        new_content.write.mode("overwrite").partitionBy("cell").parquet(
            f"{path}/corpus"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    # cells the delta emptied entirely: dynamic overwrite wrote no
    # partition for them, so drop the stale directories (metadata-level
    # delete, local-FS index layout).  Both cell sets were observed on
    # the jobs above (touched ∖ written), so no extra job runs — the
    # r17 anti-join frame still cost one collect() re-scanning the two
    # checkpoints (r18).
    import shutil
    from pathlib import Path

    for cell in sorted(touched_cells - written_cells, key=str):
        d = Path(f"{path}/corpus/cell={cell}")
        if d.is_dir():
            shutil.rmtree(d)
    return touched


def semantic_dedup(
    corpus_with_cells: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    threshold: float = 0.4,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: within each coarse
    cluster cell, a vector is DROPPED if some smaller-id vector in the
    same cell is within ``threshold`` cosine similarity — i.e. each
    near-duplicate chain keeps its min-id member.

    The greedy smaller-id rule (vs full connected components) is the
    published SemDeDup procedure's determinism fix: it needs only the
    pair list, never materializes clusters, and gives a unique,
    order-independent survivor set.  Pairs are confined to cells, so
    the quadratic term is bounded by the largest cell, not the corpus —
    at 100 TB, cells come from a k-means/LSH coarse quantizer sized so
    cells fit comfortably in a task (same contract as IVF search).

    Norms are computed once per vector; the per-pair dot product runs
    through the Arrow-vectorized ``pair_dot_udf`` (bitwise-equal to the
    expression fold, ~10× faster at pair counts).

    Returns (id, cell, is_dropped) for every corpus vector.
    """
    nrm = vector_norm(F.col(vec_col))
    a = corpus_with_cells.select(
        F.col(cell_col).alias("__cell"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
        nrm.alias("na"),
    )
    b = a.select(
        F.col("__cell"),
        F.col("id_a").alias("id_b"),
        F.col("v_a").alias("v_b"),
        F.col("na").alias("nb"),
    )
    dot = pair_dot_udf()
    dropped = (
        a.join(b, "__cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.try_divide(dot(F.col("v_a"), F.col("v_b")), F.col("na") * F.col("nb")),
        )
        .filter(F.col("cos") >= threshold)
        .select(F.col("id_b").alias("__dup_id"))
        .distinct()
    )
    return (
        corpus_with_cells.select(id_col, cell_col)
        .join(dropped, F.col(id_col) == F.col("__dup_id"), "left")
        .select(
            id_col,
            cell_col,
            F.col("__dup_id").isNotNull().alias("is_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bound ANN scale path
# ---------------------------------------------------------------------------


def dot_product(a: Column, b: Column) -> Column:
    """Left-to-right fold dot product (the numerator of
    ``dedup.cosine`` — bitwise-compatible wherever either is used)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_sq(a: Column, b: Column) -> Column:
    """Squared euclidean distance — the PQ codeword-assignment metric —
    via the same left-to-right double fold as :func:`dot_product`."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_subvectors(
    df: DataFrame,
    m: int,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Split each vector into ``m`` contiguous subvectors of
    ``dims/m`` components → (id, sub, subvec).  Pure slicing — one
    map-side posexplode, no shuffle."""
    if dims % m != 0:
        # silent truncation here would drop the trailing dims%m
        # components from every code AND every ADC score — wrong
        # rankings with no error anywhere downstream
        raise ValueError(f"pq_subvectors: dims={dims} not divisible by m={m}")
    d = dims // m
    parts = F.array(*[F.slice(F.col(vec_col), i * d + 1, d) for i in range(m)])
    return df.select(F.col(id_col), F.posexplode(parts).alias("sub", "subvec"))


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    dims: int = 64,
    ks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace PQ codebook → (sub, code_id, codeword).

    The product-quantization trainer (Jégou et al., "Product
    quantization for nearest neighbor search"): an independent
    ``ks``-codeword quantizer per subspace, here one Lloyd round per
    subspace over the SAME engine-exact machinery as
    :func:`kmeans_train` —

    * seeds: the subvectors of the ``ks`` smallest-``id_col`` vectors
      (deterministic, SQL-expressible; code_id = seed id);
    * assignment: argmin SQUARED L2 (the PQ metric — unlike the coarse
      quantizer's cosine, codewords quantize magnitude too), ties to
      the smaller code_id;
    * update: element-wise decimal-exact mean per (sub, cell, pos) —
      order-independent, bit-identical at any parallelism; empty cells
      keep their seed.

    All subspaces train in ONE relation keyed by ``sub`` (no
    per-subspace loop): the shuffle is a groupBy on (sub, cell, pos) —
    m·ks·dims/m = ks·dims rows out, linear in corpus size in."""
    subv = pq_subvectors(corpus, m, dims, id_col, vec_col)
    seed_ids = corpus.orderBy(id_col).limit(ks).select(id_col)
    cb = subv.join(F.broadcast(seed_ids), id_col).select(
        "sub", F.col(id_col).alias("code_id"), F.col("subvec").alias("codeword")
    )
    assigned = _pq_assign(subv, cb)
    exploded = assigned.select(
        "sub", F.col("code").alias("cell"), F.posexplode("subvec").alias("pos", "v")
    )
    means = (
        exploded.groupBy("sub", "cell", "pos")
        .agg(davg(F.col("v").cast("double"), "m"))
        .groupBy("sub", "cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            "sub",
            F.col("cell").alias("code_id"),
            F.transform("pm", lambda s: s["m"].cast("float")).alias("__new"),
        )
    )
    return (
        cb.join(means, ["sub", "code_id"], "left")
        .select(
            "sub",
            "code_id",
            F.coalesce("__new", "codeword").alias("codeword"),
        )
    )


def _pq_assign(subv: DataFrame, codebook: DataFrame) -> DataFrame:
    """Nearest codeword per (id, sub) by squared L2, ties to the
    smaller code_id → input columns + ``code``.  Codebooks broadcast
    (m·ks rows); argmin via struct-min, all built-in."""
    cb = codebook.select(
        "sub", F.col("code_id").alias("__cid"), F.col("codeword").alias("__cw")
    )
    scored = subv.join(F.broadcast(cb), "sub").withColumn(
        "__d2", l2_sq(F.col("subvec"), F.col("__cw"))
    )
    keys = subv.columns
    return (
        scored.groupBy(*keys)
        .agg(F.min(F.struct(F.col("__d2"), F.col("__cid"))).alias("__best"))
        .withColumn("code", F.col("__best.__cid"))
        .drop("__best")
    )


def pq_adc_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    m: int = 4,
    dims: int = 64,
    ks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-``k`` by APPROXIMATE dot product
    → (vec_id, score_adc, dot_exact, rank).

    The PQ serving shape: the corpus is stored as m small integer
    codes per vector (here m=4 codes ≈ 32 bytes → 16 bytes-per-vector
    class storage vs 256 bytes of float32 — the memory-bound regime
    where PQ lives); a query builds an m×ks lookup table of
    subvector·codeword dots ONCE, and each corpus vector's score is a
    table lookup + sum, never a float-vector scan.  This implements
    MIPS (dot-product) ADC; cosine callers pre-normalize the corpus.

    The per-vector sum over the m subspace partials runs on the
    decimal-integer grid (``functions.numeric.qint``) — an
    order-independent aggregation, so scores are bit-identical at any
    parallelism and in the DuckDB oracle.  ``dot_exact`` re-scores the
    k winners against the full vectors as an audit (k rows only).

    Scale: codes are 1 shuffle to build (the argmin groupBy); the LUT
    is m·ks rows broadcast; scoring is map-side + one groupBy(id) over
    m-row groups; top-k is TakeOrdered.  Linear at any corpus size.
    """
    if codebook is None:
        codebook = pq_train(corpus, m, dims, ks, id_col, vec_col)
    codebook = codebook.localCheckpoint(eager=False)
    codes = _pq_assign(pq_subvectors(corpus, m, dims, id_col, vec_col), codebook)
    # ONE-row query contract, enforced lazily (no extra job): a
    # multi-row query frame would emit several __qsub rows per sub,
    # the LUT join would duplicate every (sub, code_id) entry, and the
    # groupBy(id) sum would silently blend all queries into one score.
    # The multi-query path is multiquery_ivf_topk.
    qsub = (
        pq_subvectors(query, m, dims, id_col, vec_col)
        .groupBy("sub")
        .agg(F.first("subvec").alias("__qsub"), F.count(F.lit(1)).alias("__nq"))
        .select(
            "sub",
            F.when(
                F.assert_true(
                    F.col("__nq") == 1,
                    F.lit("pq_adc_topk expects a ONE-row query frame"),
                ).isNull(),
                F.col("__qsub"),
            ).alias("__qsub"),
        )
    )
    lut = codebook.join(F.broadcast(qsub), "sub").select(
        "sub",
        "code_id",
        dot_product(F.col("__qsub"), F.col("codeword")).alias("__lut"),
    )
    scored = (
        codes.join(F.broadcast(lut), (codes.sub == lut.sub) & (codes.code == lut.code_id))
        .groupBy(F.col(id_col))
        .agg(
            (F.sum(qint(F.col("__lut"))).cast("double") * F.lit(1e-9)).alias(
                "score_adc"
            )
        )
    )
    top = (
        scored.orderBy(F.col("score_adc").desc(), F.col(id_col))
        .limit(k)
    )
    qv = query.select(F.col(vec_col).alias("__qvec"))
    audit = top.join(
        corpus.select(id_col, vec_col), id_col
    ).crossJoin(F.broadcast(qv))
    from pyspark.sql import Window

    return (
        audit.select(
            id_col,
            "score_adc",
            dot_product(F.col(vec_col), F.col("__qvec")).alias("dot_exact"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("score_adc").desc(), F.col(id_col))
            ),
        )
    )


def ivfpq_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    m: int = 4,
    dims: int = 64,
    ks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ (the FAISS ``IVFADC`` composition, Jégou et al. §IV):
    coarse cells prune the corpus, product quantization on the
    RESIDUALS (v − centroid) scores what remains — together the
    canonical billion-scale ANN index: the cell list bounds the scan
    (nprobe/ncells of the data, partition-prunable) and the residual
    codes bound the memory (m bytes per vector instead of the float
    row).  → (vec_id, cell, score_adc, dot_exact, rank).  ``query`` is
    a ONE-row frame (single-vector serving; the batched path is
    multiquery_ivf_topk) — a multi-row frame would blend queries in
    the probe ranking.

    Scoring decomposes exactly: q·v ≈ q·c + q·r̂ where r̂ is the
    PQ-reconstructed residual — so the score is the per-cell q·c dot
    plus an m-term LUT sum over the (cell, sub, code) table (nprobe ×
    m × ks rows, broadcast).  The LUT sum rides the decimal-integer
    grid and the final addition is one IEEE op — deterministic at any
    parallelism, recomputable in the oracle.  One GLOBAL residual
    codebook (the FAISS default), one Lloyd round, smallest-id seeds.

    Exactness audit: the k winners are re-scored against the full
    vectors (k rows).  Residuals are computed in double (zip_with),
    matching the oracle's CAST-per-element spelling.
    """
    # the centroid frame (ncells rows) feeds the cell assignment, the
    # residual join AND the probe ranking — materialize it once or the
    # whole training aggregation re-executes per consumer (the
    # kmeans_train checkpoint rationale; measured ~2 s/extra pass at
    # sf0.1)
    centroids = centroids.localCheckpoint(eager=False)
    cv = centroids.select(
        F.col("centroid_id").alias("cell"), F.col("centroid").alias("__cvec")
    )
    cells = assign_cells(corpus, centroids, vec_col=vec_col, out_col="cell")
    resid = cells.join(F.broadcast(cv), "cell").select(
        id_col,
        "cell",
        F.zip_with(
            F.col(vec_col),
            F.col("__cvec"),
            # double subtract, then float like every stored embedding —
            # keeps the PQ machinery's float codewords type-consistent
            lambda x, y: (x.cast("double") - y.cast("double")).cast("float"),
        ).alias("__res"),
    )
    # the residual relation feeds codebook training (several scans) and
    # the encoding pass; materialize it once — at real scale this is
    # the persisted index-build write (the save_ivf_index pattern),
    # locally a lineage truncation
    resid = resid.localCheckpoint(eager=False)
    codebook = pq_train(
        resid, m=m, dims=dims, ks=ks, id_col=id_col, vec_col="__res"
    ).localCheckpoint(eager=False)
    codes = _pq_assign(
        pq_subvectors(resid, m, dims, id_col, "__res"), codebook
    ).join(resid.select(id_col, "cell"), id_col)
    qv = query.select(F.col(vec_col).alias("__qvec"))
    probe = (
        centroids.crossJoin(F.broadcast(qv))
        .withColumn("__sim", cosine(F.col("centroid"), F.col("__qvec")))
        .orderBy(F.col("__sim").desc(), F.col("centroid_id"))
        .limit(nprobe)
        .select(
            F.col("centroid_id").alias("cell"),
            F.col("centroid").alias("__cvec"),
            F.col("__qvec"),
        )
    )
    qres = probe.select(
        "cell",
        dot_product(F.col("__qvec"), F.col("__cvec")).alias("__qdotc"),
        F.zip_with(
            F.col("__qvec"),
            F.col("__cvec"),
            lambda x, y: (x.cast("double") - y.cast("double")).cast("float"),
        ).alias("__qres"),
    )
    qsub = pq_subvectors(
        qres.withColumnRenamed("cell", "__qcell"), m, dims, "__qcell", "__qres"
    ).join(
        qres.select(F.col("cell").alias("__qcell"), "__qdotc"), "__qcell"
    )
    lut = codebook.join(F.broadcast(qsub), "sub").select(
        F.col("__qcell").alias("cell"),
        "__qdotc",
        "sub",
        "code_id",
        dot_product(F.col("subvec"), F.col("codeword")).alias("__lut"),
    )
    scored = (
        codes.join(
            F.broadcast(lut),
            (codes.cell == lut.cell)
            & (codes.sub == lut.sub)
            & (codes.code == lut.code_id),
        )
        .groupBy(codes[id_col], codes.cell, lut.__qdotc)
        .agg(
            (
                F.col("__qdotc")
                + F.sum(qint(F.col("__lut"))).cast("double") * F.lit(1e-9)
            ).alias("score_adc")
        )
        .select(id_col, "cell", "score_adc")
    )
    top = scored.orderBy(F.col("score_adc").desc(), F.col(id_col)).limit(k)
    audit = top.join(corpus.select(id_col, vec_col), id_col).crossJoin(
        F.broadcast(qv)
    )
    from pyspark.sql import Window

    return (
        audit.select(
            id_col,
            "cell",
            "score_adc",
            dot_product(F.col(vec_col), F.col("__qvec")).alias("dot_exact"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("score_adc").desc(), F.col(id_col))
            ),
        )
    )
