"""CDC-driven IVF index maintenance (operators/similarity.py::
maintain_ivf_index): maintained index == full rebuild, untouched
partitions untouched on disk, emptied cells removed."""

from __future__ import annotations

import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from financial_data_stream_processing_engine_spark.operators import similarity
from financial_data_stream_processing_engine_spark.operators.scale import table_diff


def _corpus(spark):
    # two well-separated directions so cell assignment is stable:
    # cell A vectors ≈ +x, cell B vectors ≈ +y
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, [1.0, 0.01 * i, 0.0, 0.0]))
        else:
            rows.append((i, [0.0, 0.01 * i, 1.0, 0.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _centroids(spark):
    return spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])],
        "centroid_id int, centroid array<float>",
    )


def _snapshot_files(path):
    out = {}
    for p in Path(path).rglob("*.parquet"):
        out[str(p)] = (p.stat().st_size, p.stat().st_mtime_ns)
    return out


def _collect_index(spark, idx):
    corpus, _ = similarity.load_ivf_index(spark, idx)
    return sorted(
        (r.vec_id, tuple(r.embedding), r.cell) for r in corpus.collect()
    )


def test_maintained_equals_rebuilt_and_untouched_files_intact(spark, tmp_path):
    old = _corpus(spark)
    cent = _centroids(spark)
    idx = str(tmp_path / "idx")
    similarity.save_ivf_index(old, cent, idx, vec_col="embedding")
    before = _snapshot_files(f"{idx}/corpus")

    # delta touches ONLY cell 0 (+x vectors): update two, delete one,
    # insert one; cell 1 must keep byte-identical files
    upd = old.filter(F.col("vec_id").isin(0, 2)).select(
        "vec_id", F.transform("embedding", lambda v: v * 2).alias("embedding")
    )
    ins = spark.createDataFrame(
        [(1000, [1.0, 0.5, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    new_v = (
        old.join(upd.select("vec_id"), "vec_id", "left_anti")
        .unionByName(upd)
        .unionByName(ins)
        .where(F.col("vec_id") != 4)
    )
    diff = table_diff(old, new_v, keys=["vec_id"], compare_cols=["embedding"])
    touched = similarity.maintain_ivf_index(spark, idx, diff, cent)
    assert {r.cell for r in touched.collect()} == {0}

    # maintained on-disk index == full rebuild of the new version
    rebuilt = similarity.assign_cells(new_v, cent, vec_col="embedding")
    expect = sorted(
        (r.vec_id, tuple(r.embedding), r.cell) for r in rebuilt.collect()
    )
    assert _collect_index(spark, idx) == expect

    # untouched partition (cell=1) files byte-identical (size + mtime)
    after = _snapshot_files(f"{idx}/corpus")
    before_c1 = {p: v for p, v in before.items() if "cell=1" in p}
    after_c1 = {p: v for p, v in after.items() if "cell=1" in p}
    assert before_c1 == after_c1 and before_c1
    # touched partition actually rewritten
    assert {p for p in before if "cell=0" in p} != {p for p in after if "cell=0" in p} or any(
        before[p] != after[p] for p in before if "cell=0" in p and p in after
    )


def test_emptied_cell_partition_is_removed(spark, tmp_path):
    old = _corpus(spark)
    cent = _centroids(spark)
    idx = str(tmp_path / "idx")
    similarity.save_ivf_index(old, cent, idx, vec_col="embedding")

    # delete EVERY +y vector: cell 1 must vanish from the index
    new_v = old.where(F.col("vec_id") % 2 == 0)
    diff = table_diff(old, new_v, keys=["vec_id"], compare_cols=["embedding"])
    similarity.maintain_ivf_index(spark, idx, diff, cent)

    assert not (Path(idx) / "corpus" / "cell=1").exists()
    got = _collect_index(spark, idx)
    rebuilt = similarity.assign_cells(new_v, cent, vec_col="embedding")
    expect = sorted(
        (r.vec_id, tuple(r.embedding), r.cell) for r in rebuilt.collect()
    )
    assert got == expect


def test_empty_delta_is_a_noop(spark, tmp_path):
    old = _corpus(spark)
    cent = _centroids(spark)
    idx = str(tmp_path / "idx")
    similarity.save_ivf_index(old, cent, idx, vec_col="embedding")
    before = _snapshot_files(f"{idx}/corpus")
    diff = table_diff(old, old, keys=["vec_id"], compare_cols=["embedding"])
    touched = similarity.maintain_ivf_index(spark, idx, diff, cent)
    assert touched.count() == 0
    assert _snapshot_files(f"{idx}/corpus") == before
