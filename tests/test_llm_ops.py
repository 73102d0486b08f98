"""Behavior tests for the LLM-pipeline operators that the DuckDB oracle
can't check: language-ID classification, SimHash recall, IVF recall,
multimodal stub plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_data_stream_processing_engine_spark.io_utils import load_table
from financial_data_stream_processing_engine_spark.operators import dedup, multimodal, similarity, text


def test_language_id_on_real_samples(spark):
    samples = [
        (1, "the quick brown fox jumps over the lazy dog and runs to the forest", "en"),
        (2, "der schnelle braune fuchs springt über den faulen hund und das ist gut", "de"),
        (3, "el zorro marrón salta sobre el perro perezoso en la casa de una niña", "es"),
        (4, "le renard brun saute par dessus le chien paresseux dans la maison des amis", "fr"),
        (5, "敏捷的棕色狐狸跳过了懒狗然后跑进了森林里面去了", "zh"),
    ]
    df = spark.createDataFrame(samples, "doc_id long, text string, expected string")
    out = {r.doc_id: r.lang_pred for r in text.with_language_id(df).collect()}
    expected = {d: e for d, _, e in samples}
    assert out == expected


def test_language_id_unknown(spark):
    df = spark.createDataFrame([(1, "zzz qqq xxx www")], "doc_id long, text string")
    assert text.with_language_id(df).collect()[0].lang_pred == "und"


def test_simhash_banding_complete_within_radius(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # ground truth hamming distances from the raw signatures
    sigs = {r.id: r.simhash for r in dedup.simhash_signatures(docs).collect()}

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    ids = sorted(sigs)
    within3 = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if hamming(sigs[a], sigs[b]) <= 3
    }
    # the 4×16-bit chunk banding is pigeonhole-complete for hamming<=3:
    # the operator must find EXACTLY that set, no scan of all pairs
    got = {(r.id_a, r.id_b) for r in dedup.simhash_pairs(docs, max_hamming=3).collect()}
    assert got == within3
    # and those pairs overlap the planted jaccard near-dups
    truth = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert truth, "fixture should contain planted near-duplicates"
    assert len(got & truth) >= 5


def test_simhash_fingerprints_match_pure_python(spark):
    """Pin the signature math to an independent reimplementation —
    the regression here is the uint64 vote underflow that once set
    every bit (caught by the cross-engine DuckDB oracle)."""
    import hashlib

    texts = ["alpha beta gamma", "alpha beta delta", "x", "a b a b a"]

    def py_simhash(text: str, bits: int) -> int:
        hs = [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for t in text.split(" ")
        ]
        fp = 0
        for b in range(bits):
            v = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if v > 0:
                fp |= 1 << b
        return fp

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        r.id: r.simhash
        for r in dedup.simhash_signatures(
            df, token_hash=dedup.md5_token_hash60, bits=60
        ).collect()
    }
    exp = {i: py_simhash(t, 60) for i, t in enumerate(texts)}
    assert got == exp
    # sanity on the default (xxhash64/64-bit) family: fingerprints of
    # distinct docs must not all collapse to the same value
    default = [
        r.simhash for r in dedup.simhash_signatures(df).collect()
    ]
    assert len(set(default)) > 1


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    embs = load_table(spark, sf_dir, "embeddings")
    centroids = similarity.train_centroids(embs, by="label")
    with_cells = similarity.assign_cells(embs, centroids)
    hits = 0
    total = 0
    for qid in [0, 7, 42]:
        query = embs.filter(F.col("vec_id") == qid)
        exact = [r.vec_id for r in similarity.cosine_topk(embs, query, k=10).collect()]
        approx = [
            r.vec_id
            for r in similarity.ivf_search(
                with_cells, centroids, query, k=10, nprobe=3
            ).collect()
        ]
        hits += len(set(exact) & set(approx))
        total += len(exact)
    assert hits / total >= 0.5, f"IVF recall@10 {hits}/{total}"


def test_lsh_buckets_deterministic(spark, sf_dir):
    embs = load_table(spark, sf_dir, "embeddings").limit(50)
    b1 = {r.vec_id: r.bucket for r in similarity.random_hyperplane_buckets(embs).collect()}
    b2 = {r.vec_id: r.bucket for r in similarity.random_hyperplane_buckets(embs).collect()}
    assert b1 == b2
    assert 0 < len(set(b1.values())) <= 256


def test_persist_handle_owns_lifecycle(spark, sf_dir):
    """ADVICE r15 #1: the bucketing persist is owned by the CALL SITE
    via PersistHandle, not a module-global registry.  With no handle
    the operator persists nothing (leak-proof default); with a handle
    the persist exists inside the with-block, is released on exit, and
    release is idempotent.  Values are identical either way."""
    embs = load_table(spark, sf_dir, "embeddings").limit(60)
    no_handle = {
        (r.id_a, r.id_b)
        for r in similarity.bucketed_cosine_pairs(embs, threshold=0.3).collect()
    }
    with similarity.PersistHandle() as h:
        pairs = similarity.bucketed_cosine_pairs(embs, threshold=0.3, persists=h)
        with_handle = {(r.id_a, r.id_b) for r in pairs.collect()}
        assert len(h._frames) == 1
        tracked = h._frames[0]
        assert tracked.storageLevel.useMemory or tracked.storageLevel.useDisk
    assert not h._frames  # released on exit
    assert tracked.storageLevel.useMemory is False  # actually unpersisted
    assert h.release() == 0  # idempotent
    assert with_handle == no_handle


def test_persist_handle_nested_lifo(spark, sf_dir):
    """VERDICT r16 #6: the interleaving ADVICE r15 #1 actually feared —
    two NESTED handles releasing in LIFO order must not unpersist each
    other's frames.  The inner with-block's exit releases only the
    inner handle's frame; the outer frame stays hot until the outer
    exit.  Each call site owns exactly its own persists.

    Caveat this test documents: the two call sites must have DISTINCT
    logical plans — Spark's CacheManager dedupes identical analyzed
    plans into ONE cache entry, so two handles persisting the very
    same plan share a block and either release cools it (values stay
    correct; the block is just recomputed).  That is Spark cache
    semantics, not a handle defect, hence the differing limits here."""
    embs = load_table(spark, sf_dir, "embeddings")
    with similarity.PersistHandle() as outer:
        outer_pairs = similarity.bucketed_cosine_pairs(
            embs.limit(60), threshold=0.3, persists=outer
        )
        outer_vals = {(r.id_a, r.id_b) for r in outer_pairs.collect()}
        assert len(outer._frames) == 1
        outer_frame = outer._frames[0]
        with similarity.PersistHandle() as inner:
            inner_pairs = similarity.bucketed_cosine_pairs(
                embs.limit(59), threshold=0.3, persists=inner
            )
            inner_pairs.collect()
            assert len(inner._frames) == 1
            inner_frame = inner._frames[0]
            assert inner_frame is not outer_frame
        # inner exit: ITS frame is released, the outer's is untouched
        assert inner_frame.storageLevel.useMemory is False
        assert outer._frames == [outer_frame]
        assert outer_frame.storageLevel.useMemory or outer_frame.storageLevel.useDisk
        # the outer frame is still usable after the inner release
        assert {(r.id_a, r.id_b) for r in outer_pairs.collect()} == outer_vals
    assert outer_frame.storageLevel.useMemory is False  # LIFO: outer last
    assert not outer._frames
    assert outer.release() == 0 and inner.release() == 0  # both idempotent


def test_multimodal_stub_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = multimodal.as_media(
        docs, id_col="doc_id", payload=F.encode("text", "UTF-8"),
        kind="image", mime="image/x-fixture",
    )
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]

    feats = multimodal.decode_image_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(16 <= r.width < 80 and 16 <= r.height < 80 for r in rows)
    # deterministic: same payload → same pseudo-features
    again = multimodal.decode_image_features(media, fake=True).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    # the real-decode path must not silently fake: these payloads are
    # UTF-8 text, not PNGs, so every feature comes back NULL (per-row
    # isolation; the real PNG path is tested in test_multimodal_codecs)
    real = multimodal.decode_image_features(media, fake=False).collect()
    assert len(real) == 20
    assert all(r.width is None and r.mean_luma is None for r in real)


def test_fingerprints_whitespace_variants_agree(spark):
    """Both fingerprints run over the normalized text: two crawls
    differing only in whitespace must agree on the exact-dup key AND
    the near-dup shingle key."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha  beta gamma  delta ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.with_fingerprints(df).collect()}
    assert out[1].md5_full == out[2].md5_full
    assert out[1].min_shingle_fp == out[2].min_shingle_fp


def test_dedup_exact_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(3, "same text"), (1, "same text"), (2, "other")],
        "doc_id long, text string",
    )
    out = dedup.dedup_exact(df, key_cols=["text"], id_col="doc_id").collect()
    assert sorted((r.doc_id, r.text) for r in out) == [(1, "same text"), (2, "other")]


def test_embedding_lsh_bucketed_subset_of_exact(spark, sf_dir):
    """The LSH-bucketed near-dup pairs must be a strict subset of the
    exact pairs (precision 1.0); recall tracks the sign-LSH collision
    probability (1-θ/π)^planes for the corpus' similarity level."""
    embs = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs(embs, threshold=0.3).collect()
    }
    bucketed = similarity.random_hyperplane_buckets(embs, num_planes=4)
    a = bucketed.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("v_a"), "bucket"
    )
    b = bucketed.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("v_b"), "bucket"
    )
    got = {
        (r.id_a, r.id_b)
        for r in a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", dedup.cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos") >= 0.3)
        .select("id_a", "id_b")
        .collect()
    }
    assert got <= exact  # within-bucket verification never invents pairs
    assert exact and len(got) / len(exact) > 0.05


def test_text_stats_degenerate_docs_dont_crash(spark):
    """Empty/whitespace/NULL text must yield NULL ratios, not a
    DIVIDE_BY_ZERO job failure (ANSI mode)."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one"), (4, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in text.with_text_stats(df).collect()}
    assert rows[1].punct_ratio is None          # 0-char doc: undefined ratio
    assert rows[4].n_tokens is None             # NULL text propagates
    assert rows[3].quality_score is not None    # normal doc unaffected


def test_token_counts_shapes(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world 42 times!"),
            (2, "a"),
            (3, "!!!"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.with_token_counts(df).collect()}
    # "hello world 42 times!" → pieces: hello, world, 42, times, !
    assert out[1]["n_ws_tokens"] == 4
    assert out[1]["n_bpe_pieces"] == 5
    assert out[1]["n_tokens_est"] == 6  # ceil(21/4)
    assert out[3]["n_bpe_pieces"] == 1  # one punctuation run
    assert out[2]["chars_per_piece"] == 1.0


def test_quantize_int8_roundtrip_and_zero_vector(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector: no division
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in similarity.quantize_int8(df).collect()}
    r = out[1]
    assert r["scale"] == 1.0
    assert r["q"] == [127, -63, 32, 0]  # floor(x*127+0.5)
    # max error bounded by half a quantization step
    assert r["max_abs_err"] <= 0.5 * r["scale"] / 127 + 1e-12
    assert r["mse"] <= (0.5 / 127) ** 2 + 1e-12
    z = out[2]
    assert z["scale"] == 0.0 and z["q"] == [0, 0, 0, 0]
    assert z["max_abs_err"] == 0.0 and z["mse"] == 0.0


def test_connected_components_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "id_a long, id_b long",
    )
    comp = {r["node"]: r["component"] for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_raises_on_truncation(spark):
    # a 5-node chain has diameter 4; max_iter=1 cannot converge and
    # must raise rather than return split clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="max_iter"):
        dedup.connected_components(pairs, max_iter=1)


def test_dedup_clusters_survivors(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    out = {r["id"]: (r["canonical_id"], r["is_survivor"])
           for r in dedup.dedup_clusters(docs, pairs).collect()}
    assert out == {
        1: (1, True), 2: (1, False), 3: (1, False),
        4: (4, True), 5: (5, True), 6: (5, False),
    }


def test_ivf_index_roundtrip_prunes_partitions(spark, sf_dir, tmp_path):
    embs = load_table(spark, sf_dir, "embeddings")
    centroids = similarity.train_centroids(embs, by="label")
    path = str(tmp_path / "ivf")
    similarity.save_ivf_index(embs, centroids, path)

    corpus, cents = similarity.load_ivf_index(spark, path)
    # search results from the loaded index equal the in-memory path
    query = embs.filter(F.col("vec_id") == 0)
    live = similarity.assign_cells(embs, centroids)
    got = {r.vec_id for r in similarity.ivf_search(corpus, cents, query, k=10, nprobe=3).collect()}
    exp = {r.vec_id for r in similarity.ivf_search(live, centroids, query, k=10, nprobe=3).collect()}
    assert got == exp
    # and the loaded corpus filter prunes at the source: filtering one
    # cell shows a PartitionFilters entry in the scan
    one_cell = corpus.filter(F.col("cell") == corpus.select("cell").first()["cell"])
    plan = one_cell._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters")[1][:120]


# --- SemDeDup / Bloom / substring spans (round 4) ---------------------


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, cell string")


def test_semantic_dedup_drops_larger_id_within_cell(spark):
    df = _vec_df(
        spark,
        [
            (1, [1.0, 0.0, 0.0], "a"),
            (2, [0.99, 0.01, 0.0], "a"),   # near-dup of 1 → dropped
            (3, [0.0, 1.0, 0.0], "a"),     # orthogonal → kept
            (4, [1.0, 0.0, 0.0], "b"),     # identical to 1 but other cell → kept
        ],
    )
    out = {r["vec_id"]: r["is_dropped"] for r in similarity.semantic_dedup(
        df, id_col="vec_id", vec_col="embedding", cell_col="cell", threshold=0.9
    ).collect()}
    assert out == {1: False, 2: True, 3: False, 4: False}


def test_semantic_dedup_chain_keeps_only_min(spark):
    # a chain 1~2, 2~3 (1 !~ 3): greedy smaller-id rule drops 2 AND 3
    df = _vec_df(
        spark,
        [
            (1, [1.0, 0.0], "a"),
            (2, [0.95, 0.3122499], "a"),
            (3, [0.8, 0.6], "a"),
        ],
    )
    out = {r["vec_id"]: r["is_dropped"] for r in similarity.semantic_dedup(
        df, threshold=0.94, cell_col="cell"
    ).collect()}
    assert out[1] is False and out[2] is True and out[3] is True


def test_bloom_no_false_negatives_and_absent_miss(spark):
    ref = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(200)], "id long, k string"
    )
    words = dedup.bloom_build(ref, key_col="k", k=3)
    probe = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(200)]
        + [(1000 + i, f"absent-{i}") for i in range(200)],
        "id long, k string",
    )
    out = {r["id"]: r["bloom_hit"] for r in dedup.bloom_probe(
        probe, words, key_col="k", id_col="id", k=3
    ).collect()}
    # Bloom guarantee: every inserted key hits
    assert all(out[i] for i in range(200))
    # absent keys: overwhelmingly miss (600 bits of 65536 set → FP ~1e-7)
    fps = sum(1 for i in range(200) if out[1000 + i])
    assert fps == 0


def test_duplicated_span_stats_planted(spark):
    shared = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, shared + " tail one two three"),
            (2, "lead in words here " + shared),
            (3, "completely different text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.duplicated_span_stats(docs, n=8).collect()}
    # doc 3 shares nothing
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_ratio"] == 0.0
    # docs 1 and 2 each contain the shared span at least once
    assert out[1]["n_dup_spans"] >= 1 and out[2]["n_dup_spans"] >= 1
    assert 0 < out[1]["dup_ratio"] <= 1.0


def test_duplicated_span_stats_short_doc_whole_text(spark):
    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "another doc")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.duplicated_span_stats(docs, n=8).collect()}
    # sub-n docs contribute their whole text as one span
    assert out[1]["n_spans"] == 1 and out[1]["dup_ratio"] == 1.0
    assert out[2]["dup_ratio"] == 1.0
    assert out[3]["dup_ratio"] == 0.0


# --- batch 5: unicode / pagerank (round 4) ----------------------------


def test_nfc_normalize_composes_and_preserves_nfc(spark):
    docs = spark.createDataFrame(
        [(1, "café"), (2, "café"), (3, "Ångstrom"), (4, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text_nfc for r in text.nfc_normalize(docs).collect()}
    assert out[1] == "café"          # decomposed composes
    assert out[2] == "café"          # already-NFC unchanged
    assert out[3] == "Ångstrom"      # A + ring → Å
    assert out[4] is None


def test_pagerank_star_and_isolated(spark):
    from financial_data_stream_processing_engine_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "node long")
    # undirected star centered on 1 over {1..4}; node 5 isolated
    pairs = [(1, 2), (1, 3), (1, 4)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    r = {row.node: row.rank for row in pagerank(nodes, edges, k=8).collect()}
    # the hub out-ranks the spokes; spokes tie bitwise by symmetry
    assert r[1] > r[2] and r[2] == r[3] == r[4]
    # isolated node holds exactly the teleport mass
    assert r[5] == 0.15 / 5
    # ranks are positive and bounded
    assert all(0 < v < 1 for v in r.values())


def test_pagerank_bitwise_stable_under_repartition(spark):
    from financial_data_stream_processing_engine_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(30)], "node long")
    pairs = [(i, (i * 7 + 1) % 30) for i in range(30)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src long, dst long",
    )
    a = {r.node: r.rank for r in pagerank(nodes.repartition(2), edges.repartition(3), k=5).collect()}
    b = {r.node: r.rank for r in pagerank(nodes.repartition(7), edges.repartition(11), k=5).collect()}
    assert a == b  # exact ==: quantized-integer neighbor sums


def test_kmeans_objective_weights_duplicate_vectors_per_row(spark):
    """The objective is the PER-ROW mean: a vector appearing 3 times
    contributes 3 shares, not 1 (groupBy(vec) alone would deweight
    duplicates — wrong on near-dup corpora)."""
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "centroid_id long, centroid array<float>"
    )
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])] * 3 + [(2, [0.6, 0.8])],
        "vec_id long, embedding array<float>",
    )
    got = similarity.kmeans_objective(corpus, cent)
    # float32 vector storage rounds ~2e-9; the wrong per-distinct
    # answer would be (1.0 + 0.8) / 2 = 0.9, three orders away
    assert abs(got - (3 * 1.0 + 0.8) / 4) < 1e-6


def test_banding_and_pq_divisibility_fail_loudly(spark, sf_dir):
    """Leftover signature slots / truncated trailing dims must refuse,
    not silently under-recall or mis-rank."""
    import pytest
    from financial_data_stream_processing_engine_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="not divisible"):
        dedup.minhash_lsh_pairs(docs, num_hashes=60, bands=16)
    embs = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_subvectors(embs, m=3, dims=64)


def test_kmeans_objective_improves_and_cells_balanced(spark, sf_dir):
    """Lloyd rounds must improve the spherical objective over the
    seed centroids, and the trained cells must be balanced — the
    property IVF recall and SemDeDup's largest-cell bound depend on
    (operators/similarity.py::kmeans_train)."""
    embs = load_table(spark, sf_dir, "embeddings")
    obj = [
        similarity.kmeans_objective(
            embs, similarity.kmeans_train(embs, k=10, iters=i, checkpoint=True)
        )
        for i in (0, 1, 2)
    ]
    assert obj[0] < obj[1] < obj[2], f"objective not improving: {obj}"

    cent = similarity.kmeans_train(embs, k=10, iters=2, checkpoint=True)
    sizes = [
        r["count"]
        for r in similarity.assign_cells(embs, cent)
        .groupBy("cell")
        .count()
        .collect()
    ]
    assert len(sizes) == 10, "no cell may end up empty on the fixture"
    assert max(sizes) <= 1.5 * (sum(sizes) / len(sizes)), sizes


def test_kmeans_bitwise_stable_under_repartition(spark, sf_dir):
    """Decimal-exact mean updates make the trained centroids
    bit-identical at any parallelism — re-running a 1000-executor
    training job must give the same quantizer."""
    embs = load_table(spark, sf_dir, "embeddings")
    a = {
        r.centroid_id: r.centroid
        for r in similarity.kmeans_train(
            embs.repartition(3), k=8, iters=2, checkpoint=True
        ).collect()
    }
    b = {
        r.centroid_id: r.centroid
        for r in similarity.kmeans_train(
            embs.repartition(13), k=8, iters=2, checkpoint=True
        ).collect()
    }
    assert a == b


def test_pq_adc_order_independent_bitwise(spark, sf_dir):
    """PQ training, encoding and ADC scoring are deterministic at any
    parallelism: the whole top-k (scores included) is bit-identical
    under repartitioning."""
    embs = load_table(spark, sf_dir, "embeddings")
    q = embs.filter(F.col("vec_id") == 0)
    a = similarity.pq_adc_topk(embs.repartition(2), q, k=10).collect()
    b = similarity.pq_adc_topk(embs.repartition(17), q, k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_pq_self_match_ranks_first(spark, sf_dir):
    """The query vector itself must win ADC retrieval: quantization is
    shared between query-side LUT and its own codes, so its ADC score
    dominates."""
    embs = load_table(spark, sf_dir, "embeddings")
    q = embs.filter(F.col("vec_id") == 0)
    top = similarity.pq_adc_topk(embs, q, k=10).collect()
    assert top[0].vec_id == 0 and top[0].rank == 1
    # audit column must carry the exact self-dot (≈ ||q||²)
    assert abs(top[0].dot_exact - 1.0) < 0.05  # fixture embeddings are unit-norm


def test_pq_codebook_and_codes_shapes(spark, sf_dir):
    """Codebook = m×ks rows, every vector gets exactly m codes, every
    code references a codebook entry of its own subspace."""
    embs = load_table(spark, sf_dir, "embeddings")
    cb = similarity.pq_train(embs, m=4, dims=64, ks=8)
    rows = cb.collect()
    assert len(rows) == 4 * 8
    assert all(len(r.codeword) == 16 for r in rows)
    codes = similarity._pq_assign(
        similarity.pq_subvectors(embs, 4, 64), cb
    )
    per_vec = codes.groupBy("vec_id").count().collect()
    assert all(r["count"] == 4 for r in per_vec)
    valid = {(r.sub, r.code_id) for r in rows}
    assert all(
        (r.sub, r.code) in valid for r in codes.select("sub", "code").collect()
    )


def test_pq_adc_error_bounded_by_quantization(spark, sf_dir):
    """|ADC − exact| ≤ ‖q_sub‖·‖residual_sub‖ summed over subspaces
    (Cauchy–Schwarz per subspace) — checked on the top-10 rows with a
    small grid-quantization allowance."""
    import math

    embs = load_table(spark, sf_dir, "embeddings")
    q = embs.filter(F.col("vec_id") == 0)
    cb = similarity.pq_train(embs, m=4, dims=64, ks=8)
    top = similarity.pq_adc_topk(embs, q, k=10, codebook=cb).collect()
    cbm = {(r.sub, r.code_id): r.codeword for r in cb.collect()}
    codes = {
        (r.vec_id, r.sub): r.code
        for r in similarity._pq_assign(
            similarity.pq_subvectors(embs, 4, 64), cb
        ).collect()
    }
    vecs = {r.vec_id: r.embedding for r in embs.collect()}
    qv = vecs[0]
    for row in top:
        v = vecs[row.vec_id]
        bound = 0.0
        for sub in range(4):
            qs = qv[sub * 16 : sub * 16 + 16]
            vs = v[sub * 16 : sub * 16 + 16]
            cw = cbm[(sub, codes[(row.vec_id, sub)])]
            res = math.sqrt(sum((a - b) ** 2 for a, b in zip(vs, cw)))
            bound += math.sqrt(sum(x * x for x in qs)) * res
        assert abs(row.score_adc - row.dot_exact) <= bound + 1e-6, row


def test_ivfpq_candidates_confined_to_probed_cells(spark, sf_dir):
    """Every IVF-PQ result must come from one of the nprobe cells
    nearest the query — the scan-bounding property."""
    embs = load_table(spark, sf_dir, "embeddings")
    cent = similarity.train_centroids(embs, by="label", vec_col="embedding")
    q = embs.filter(F.col("vec_id") == 0)
    top = similarity.ivfpq_topk(embs, cent, q, k=10, nprobe=2).collect()
    qvec = q.collect()[0].embedding
    cents = cent.collect()
    def cos(a, b):
        import math
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)); nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)
    probed = {
        r.centroid_id
        for r in sorted(cents, key=lambda r: (-cos(r.centroid, qvec), r.centroid_id))[:2]
    }
    assert {r.cell for r in top} <= probed
    assert top[0].vec_id == 0 and top[0].rank == 1  # self-match wins


def test_ivfpq_order_independent_bitwise(spark, sf_dir):
    embs = load_table(spark, sf_dir, "embeddings")
    cent = similarity.train_centroids(embs, by="label", vec_col="embedding")
    q = embs.filter(F.col("vec_id") == 0)
    a = similarity.ivfpq_topk(embs.repartition(2), cent, q, k=10).collect()
    b = similarity.ivfpq_topk(embs.repartition(17), cent, q, k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_ivfpq_score_decomposition(spark, sf_dir):
    """score_adc must equal q·c(cell) + the LUT reconstruction — i.e.
    approximately q·v with the residual quantization as the only
    error: |score − exact| ≤ ‖q‖·‖residual error‖ and in particular
    the residual-PQ score should beat plain PQ's error on the self
    match (residual of the self vector is better centered)."""
    embs = load_table(spark, sf_dir, "embeddings")
    cent = similarity.train_centroids(embs, by="label", vec_col="embedding")
    q = embs.filter(F.col("vec_id") == 0)
    ivfpq = {r.vec_id: r for r in similarity.ivfpq_topk(embs, cent, q, k=10).collect()}
    r0 = ivfpq[0]
    assert abs(r0.score_adc - r0.dot_exact) < 1.0  # same-order reconstruction


def test_token_counts_exact_path_keeps_null_id_rows(spark):
    """with_token_counts(id_col=...) must not drop NULL-id rows — the
    exact count joins back with a LEFT join and coalesces to 0
    (ADVICE r7)."""
    df = spark.createDataFrame(
        [(1, "the batch order"), (None, "scan the row"), (2, "")],
        "doc_id long, text string",
    )
    out = text.with_token_counts(df, id_col="doc_id")
    rows = out.collect()
    assert len(rows) == 3  # NULL id survives
    by_text = {r["text"]: r for r in rows}
    assert by_text["scan the row"]["n_bpe_tokens"] == 0  # unmatched → 0
    assert by_text[""]["n_bpe_tokens"] == 0
    assert by_text["the batch order"]["n_bpe_tokens"] > 0


def test_prefix_filter_matches_brute_force_on_fixture(spark, sf_dir):
    """AllPairs prefix filtering is provably lossless — the operator
    must reproduce the quadratic brute-force pair set EXACTLY on the
    fixture corpus (which contains planted near-duplicates)."""
    docs = load_table(spark, sf_dir, "documents")
    truth = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.prefix_filter_jaccard_pairs(
            docs, threshold_num=4, threshold_den=5
        ).collect()
    }
    assert truth, "fixture should contain planted near-duplicates"
    assert got == truth


def test_prefix_filter_odd_threshold_randomized(spark):
    """Soundness sweep at the 7/100 threshold — the one whose double
    ceil(0.07·100) rounds UP past the exact integer (7.000…001 → 8)
    and would shorten prefixes below the sound length if the operator
    ever left integer arithmetic.  Seeded random corpus with heavy
    shared blocks exercises many (size, overlap) configurations."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(40):
        length = rng.randint(3, 40)
        toks = [vocab[rng.randrange(len(vocab))] for _ in range(length)]
        rows.append((i, " ".join(toks)))
    # planted exact and near duplicates
    rows.append((100, rows[0][1]))
    rows.append((101, rows[1][1] + " extra tail tokens here"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    truth = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.07).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in dedup.prefix_filter_jaccard_pairs(
            docs, n=2, threshold_num=7, threshold_den=100
        ).collect()
    }
    assert truth, "randomized corpus should produce qualifying pairs"
    assert got == truth


def test_neardup_communities_pair_free_corpus_kept_singletons(spark, tmp_path):
    """ADVICE r12: a corpus with ZERO qualifying near-dup pairs must
    short-circuit to all-kept-singletons (matching the oracle's
    LEFT-JOIN-miss semantics) instead of feeding louvain_refine an
    empty graph (m=0 raises)."""
    from financial_data_stream_processing_engine_spark.plans.llm_queries import (
        pipeline_neardup_communities,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta echo foxtrot golf hotel", "en", "web", 48),
            (2, "one two three four five six seven eight nine ten", "en", "web", 49),
            (3, "red orange yellow green blue indigo violet colors", "en", "web", 49),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = pipeline_neardup_communities(spark, str(tmp_path)).collect()
    assert len(out) == 3
    for r in out:
        assert r.community == r.doc_id
        assert r.n_members == 1
        assert r.rank_in_community == 1
        assert r.kept is True


def test_retrieval_rrf_fusion_matches_arm_recomputation(spark, sf_dir):
    """The fused frame must be exactly RRF over the two arm entries'
    results: same doc set (union of arms), both arm ranks carried
    (NULL where an arm missed), rrf_score bit-equal to the two-term
    fixed-order recomputation, and fused_rank the (score desc,
    doc_id) enumeration."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    fused = {
        r["doc_id"]: r for r in qs["retrieval_rrf_fusion"](spark, sf_dir).collect()
    }
    lex = {
        r["doc_id"]: r["rank"]
        for r in qs["text_bm25_topk"](spark, sf_dir).collect()
    }
    ann_rows = sorted(
        qs["similarity_ivf_topk"](spark, sf_dir).collect(),
        key=lambda r: (-r["cos"], r["vec_id"]),
    )
    ann = {r["vec_id"]: i + 1 for i, r in enumerate(ann_rows)}
    assert set(fused) == set(lex) | set(ann) and fused
    for d, row in fused.items():
        assert row["lex_rank"] == lex.get(d)
        assert row["ann_rank"] == ann.get(d)
        want = (1.0 / (60 + lex[d]) if d in lex else 0.0) + (
            1.0 / (60 + ann[d]) if d in ann else 0.0
        )
        assert row["rrf_score"] == want  # bit-equal: same IEEE op order
    order = sorted(fused.values(), key=lambda r: (-r["rrf_score"], r["doc_id"]))
    assert [r["fused_rank"] for r in order] == list(range(1, len(order) + 1))


def test_bind_let_semantics_match_inline(spark):
    """functions.exprs.bind is an expression-level let: same values as
    the inline spelling (including NULL and empty inputs), it only
    changes HOW OFTEN the bound subtree evaluates (r17 optimization —
    a lambda body re-evaluates outer computed expressions per array
    element, so shingles() was O(len²) per row before binding)."""
    from financial_data_stream_processing_engine_spark.functions.exprs import bind

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a"), (3, ""), (4, None), (5, "x y x y x y")],
        "doc_id long, text string",
    )
    # bind(x, f) == f(x) for a pure f, NULLs included
    toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    inline = df.select(
        "doc_id", F.concat_ws("|", F.slice(toks, 1, 2)).alias("v")
    ).collect()
    bound = df.select(
        "doc_id",
        bind(toks, lambda t: F.concat_ws("|", F.slice(t, 1, 2))).alias("v"),
    ).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, bound))
    # NULL input rides through the body exactly as inline
    null_inline = df.select(F.length(F.col("text")).alias("v")).collect()
    null_bound = df.select(
        bind(F.col("text"), lambda t: F.length(t)).alias("v")
    ).collect()
    assert [r.v for r in null_inline] == [r.v for r in null_bound]


def test_shingles_bound_form_matches_reference(spark):
    """The r17 bind-rewrite of shingles()/ngrams_with_repeats() is
    value-identical to the pre-bind spelling (pinned here as a local
    replica) on edge cases: short docs, repeated tokens, empty text."""
    from financial_data_stream_processing_engine_spark.operators.text import (
        ngrams_with_repeats,
        shingles,
        tokens,
    )

    def shingles_reference(text, n=3):  # the pre-r17 inline spelling
        toks = tokens(text)
        m = F.greatest(F.size(toks) - (n - 1), F.lit(1))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), m),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b"), (3, ""), (4, "x x x x x"), (5, "q")],
        "doc_id long, text string",
    )
    got = df.select("doc_id", shingles("text", 3).alias("s")).collect()
    want = df.select("doc_id", shingles_reference("text", 3).alias("s")).collect()
    assert {r.doc_id: r.s for r in got} == {r.doc_id: r.s for r in want}
    ng = df.select("doc_id", ngrams_with_repeats(F.col("text"), 2).alias("g")).collect()
    for r in ng:
        txt = {1: "a b c d e f", 2: "a b", 3: "", 4: "x x x x x", 5: "q"}[r.doc_id]
        t = txt.split(" ")
        exp = (
            [" ".join(t[i : i + 2]) for i in range(len(t) - 1)]
            if len(t) >= 2
            else [txt]
        )
        assert r.g == exp
