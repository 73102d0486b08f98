"""Streaming-vs-batch parity tests (SURVEY.md §5.2 item 4).

Every test drives a REAL StreamingQuery (file/rate source → memory or
foreachBatch sink) and pins its output to the batch combinators on the
same data — the unified-DataFrame guarantee the engine is built on.
"""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from financial_data_stream_processing_engine_spark.operators.core import alerts, moving_average
from financial_data_stream_processing_engine_spark.streaming import sinks, sources, stateful, windows

TICK_SCHEMA = "id string, symbol string, price double, volume long, ts timestamp, source string"


@pytest.fixture(scope="module")
def tick_dir(spark, tmp_path_factory):
    """~240 deterministic ticks across 3 symbols, written as parquet."""
    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(240):
        sym = ["AAA", "BBB", "CCC"][i % 3] if i % 17 else None  # sprinkle NULL keys
        rows.append(
            (
                f"t{i:04d}",
                sym,
                float(50 + (i * 7919) % 100) / 1.0,
                int(i % 50),
                base + dt.timedelta(seconds=13 * i),
                "WebSocketMock",
            )
        )
    df = spark.createDataFrame(rows, TICK_SCHEMA)
    path = str(tmp_path_factory.mktemp("ticks"))
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def _stream(spark, tick_dir):
    return spark.readStream.schema(TICK_SCHEMA).parquet(tick_dir)


def _run_to_memory(df, name, mode="append"):
    q = sinks.memory_sink(df, name, output_mode=mode)
    q.processAllAvailable()
    q.stop()


def test_stateful_row_count_ma_matches_batch(spark, tick_dir):
    out = stateful.streaming_moving_average(_stream(spark, tick_dir), n=5, ttl_ms=None)
    _run_to_memory(out, "ma_stream")
    got = {r.id: r.moving_average for r in spark.table("ma_stream").collect()}

    batch = spark.read.parquet(tick_dir)
    # batch oracle: oldest→newest summation like the streaming deque
    exp_rows = moving_average(batch, n=5, order_by=("ts", "id")).collect()
    exp = {r.id: r.moving_average for r in exp_rows}

    assert set(got) == set(exp)
    for k in exp:
        if exp[k] is None:
            assert got[k] is None, k
        else:
            assert got[k] == pytest.approx(exp[k], rel=1e-12), k
    # NULL-symbol rows passed through with NULL ma
    null_ids = {r.id for r in batch.filter("symbol is null").collect()}
    assert null_ids and all(got[i] is None for i in null_ids)


def test_tumbling_window_matches_batch(spark, tick_dir):
    stream_out = windows.tumbling_stats(
        _stream(spark, tick_dir), key="symbol", value="price", window="10 minutes"
    )
    _run_to_memory(stream_out, "tumble_stream", mode="complete")
    got = {
        (r.win_start, r.symbol): (r.n, r.total, r.lo, r.hi)
        for r in spark.table("tumble_stream").collect()
    }
    batch_out = windows.tumbling_stats(
        spark.read.parquet(tick_dir), key="symbol", value="price", window="10 minutes"
    )
    exp = {
        (r.win_start, r.symbol): (r.n, r.total, r.lo, r.hi)
        for r in batch_out.collect()
    }
    assert got == exp  # decimal-exact sums → bitwise equality


def test_session_window_matches_batch(spark, tick_dir):
    # ticks are 13s apart per stream; per symbol ~39s apart → gap 60s
    # merges everything, gap 20s splits sessions
    stream_out = windows.session_stats(_stream(spark, tick_dir), gap="30 seconds")
    _run_to_memory(stream_out, "session_stream", mode="complete")
    got = sorted(
        ((r.symbol, r.win_start, r.n) for r in spark.table("session_stream").collect()),
        key=repr,
    )
    exp = sorted(
        (
            (r.symbol, r.win_start, r.n)
            for r in windows.session_stats(
                spark.read.parquet(tick_dir), gap="30 seconds"
            ).collect()
        ),
        key=repr,
    )
    assert got == exp


def test_alert_sink_fires_like_batch_filter(spark, tick_dir):
    collected = []
    ma = stateful.streaming_moving_average(_stream(spark, tick_dir), n=5, ttl_ms=None)
    q = sinks.alert_sink(
        ma, on_alert=lambda rows, n_suppressed: collected.extend(rows), threshold=108.0
    )
    q.processAllAvailable()
    q.stop()

    batch_ma = moving_average(spark.read.parquet(tick_dir), n=5, order_by=("ts", "id"))
    expected = alerts(batch_ma, threshold=108.0).count()
    assert len(collected) == expected
    assert all(r.moving_average > 108.0 for r in collected)


def test_rate_source_produces_normalized_ticks(spark):
    ticks = sources.rate_ticks(spark, rows_per_second=50)
    assert ticks.isStreaming
    q = sinks.memory_sink(ticks, "rate_ticks_mem")
    deadline = time.time() + 15
    while time.time() < deadline and spark.table("rate_ticks_mem").count() < 5:
        time.sleep(0.5)
    q.stop()
    rows = spark.table("rate_ticks_mem").collect()
    assert len(rows) >= 5
    assert {r.source for r in rows} == {"WebSocketMock"}
    assert all(r.price > 0 and r.volume >= 0 for r in rows)


def test_csv_replay_cycles_reference_rows(spark):
    ticks = sources.csv_replay_ticks(spark, rows_per_second=20)
    q = sinks.memory_sink(ticks, "csv_ticks_mem")
    deadline = time.time() + 15
    while time.time() < deadline and spark.table("csv_ticks_mem").count() < 6:
        time.sleep(0.5)
    q.stop()
    rows = spark.table("csv_ticks_mem").collect()
    assert len(rows) >= 6
    # the reference's 3 embedded CSV rows, cycled (financial_engine.py:246,:259)
    assert {r.symbol for r in rows} == {"MSFT_mock", "TSLA_mock", "NVDA_mock"}
    assert {r.price for r in rows} == {205.50, 880.10, 550.25}


def test_logging_sink_respects_log_level(spark, tick_dir):
    from financial_data_stream_processing_engine_spark.config import EngineConfig

    lines: list[str] = []
    q = sinks.logging_sink(
        _stream(spark, tick_dir), logger=lines.append, config=EngineConfig(log_level="INFO"),
        name="log_on",
    )
    q.processAllAvailable()
    q.stop()
    assert lines and "rows=240" in lines[0]

    lines2: list[str] = []
    q = sinks.logging_sink(
        _stream(spark, tick_dir), logger=lines2.append,
        config=EngineConfig(log_level="ERROR"), name="log_off",
    )
    q.processAllAvailable()
    q.stop()
    assert lines2 == []


def test_stateful_ma_with_ttl_processes_data(spark, tick_dir):
    """The ProcessingTimeTimeout (TTL) path must process data without
    crashing; it keeps scheduling timeout-check batches, so drive it by
    wall-clock instead of processAllAvailable."""
    out = stateful.streaming_moving_average(
        _stream(spark, tick_dir), n=5, ttl_ms=60_000
    )
    q = sinks.memory_sink(out, "ma_ttl_stream")
    deadline = time.time() + 60
    while time.time() < deadline and spark.table("ma_ttl_stream").count() < 240:
        time.sleep(1)
    n = spark.table("ma_ttl_stream").count()
    q.stop()
    assert n == 240


def test_streaming_macd_matches_batch_fold(spark, tick_dir):
    from financial_data_stream_processing_engine_spark.operators import finance

    stream = _stream(spark, tick_dir).filter("symbol IS NOT NULL")
    out = stateful.streaming_macd(stream, ttl_ms=None)
    _run_to_memory(out, "macd_stream")
    got = {
        r.id: (r.macd, r.macd_signal, r.macd_histogram)
        for r in spark.table("macd_stream").collect()
    }

    batch = spark.read.parquet(tick_dir).filter("symbol IS NOT NULL")
    exp_rows = finance.macd(
        batch, key="symbol", ts_col="ts", price="price", order_by=("ts", "id")
    ).collect()
    exp = {r.id: (r.macd, r.macd_signal, r.macd_histogram) for r in exp_rows}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == exp[k], k  # bitwise: identical op order


def test_streaming_zscore_alerts_matches_batch(spark, tmp_path):
    import datetime as dt

    from financial_data_stream_processing_engine_spark.operators import finance

    base = dt.datetime(2024, 3, 1)
    prices = [100.0 + 0.1 * (i % 5) for i in range(30)]
    prices[25] = 150.0  # planted >3 sigma spike
    rows = [
        (f"{i:04d}", "AAA", p, 1, base + dt.timedelta(seconds=i), "X")
        for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(rows, TICK_SCHEMA)
    path = str(tmp_path / "zticks")
    df.coalesce(1).write.parquet(path)

    out = stateful.streaming_zscore_alerts(_stream(spark, path), n=20, ttl_ms=None)
    _run_to_memory(out, "zscore_stream")
    got = {
        int(r.id): (r.baseline_mean, r.baseline_sd, r.zscore)
        for r in spark.table("zscore_stream").collect()
    }

    batch = finance.zscore_anomalies(
        spark.read.parquet(path).selectExpr(
            "CAST(id AS LONG) AS event_id", "symbol", "ts", "price"
        ),
        n=20,
    ).collect()
    exp = {r.event_id: (r.baseline_mean, r.baseline_sd, r.zscore) for r in batch}
    assert set(got) == set(exp) == {25}
    assert got[25] == exp[25]  # bitwise: Decimal-replicated window sums


def test_logging_sink_count_rides_inner_action(spark, tick_dir):
    """The INFO-level row count comes from an Observation riding the
    epoch's own write — not a separate count() job.  An accumulator
    UDF in the pipeline proves each row is evaluated exactly once: a
    dedicated counting job would re-run the pipeline and double it."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType
    from financial_data_stream_processing_engine_spark.config import EngineConfig

    acc = spark.sparkContext.accumulator(0)

    @F.udf(StringType())
    def tap(v):
        acc.add(1)
        return v

    lines: list[str] = []
    epochs: list[int] = []

    def inner(batch_df, epoch_id):
        batch_df.write.format("noop").mode("overwrite").save()
        epochs.append(epoch_id)

    q = sinks.logging_sink(
        _stream(spark, tick_dir).withColumn("id", tap("id")),
        logger=lines.append,
        config=EngineConfig(log_level="INFO"),
        name="log_obs",
        inner=inner,
    )
    q.processAllAvailable()
    q.stop()
    assert lines and "rows=240" in lines[0]
    assert epochs  # the inner write ran and delivered the observation
    assert acc.value == 240, f"rows evaluated {acc.value}x, expected once each"


def test_streaming_pattern_distance_matches_batch_bitwise(spark, sf_dir):
    """Streamed z-normalized distances equal the batch operator's
    bit-for-bit on the shared top-10 (the three-way parity the
    catalog entry's shared oracle certifies)."""
    from financial_data_stream_processing_engine_spark.plans import streaming_queries as sq
    from financial_data_stream_processing_engine_spark.plans.catalog import QUERIES, load_all

    load_all()
    got = {
        (r.symbol, r.event_id): r.dist
        for r in QUERIES["streaming_pattern_match_topk"].fn(spark, sf_dir).collect()
    }
    want = {
        (r.symbol, r.event_id): r.dist
        for r in QUERIES["fin_pattern_match_topk"].fn(spark, sf_dir).collect()
    }
    assert got == want  # exact float equality — bitwise parity


def test_streaming_lm_gate_equals_batch_scoring(spark):
    """The foreachBatch LM gate must produce EXACTLY the batch
    scorer's frame — per-doc scoring under a static model is
    batching-independent."""
    import __spark_entry__ as entrymod
    from financial_data_stream_processing_engine_spark.io_utils import load_table
    from financial_data_stream_processing_engine_spark.operators.lm import (
        lm_quality_score,
    )

    sf_dir = "/root/testdata/sf0.001"
    streamed = entrymod.queries()["streaming_lm_quality_gate"](spark, sf_dir)
    batch = lm_quality_score(load_table(spark, sf_dir, "documents"))
    cols = ["doc_id", "n_bigrams", "n_unseen_bigrams", "mean_tp", "lm_bucket"]
    s = sorted(map(tuple, streamed.select(*cols).collect()))
    b = sorted(map(tuple, batch.select(*cols).collect()))
    assert s == b and len(s) == 500


def test_streaming_nb_gate_equals_batch_classifier(spark):
    """The foreachBatch NB gate must produce EXACTLY the batch
    classifier's frame — per-doc scoring under the static
    localCheckpoint-ed model is batching-independent."""
    import __spark_entry__ as entrymod
    from financial_data_stream_processing_engine_spark.io_utils import load_table
    from financial_data_stream_processing_engine_spark.operators.lm import (
        nb_lang_classifier,
    )

    sf_dir = "/root/testdata/sf0.001"
    streamed = entrymod.queries()["streaming_nb_gate"](spark, sf_dir)
    batch = nb_lang_classifier(load_table(spark, sf_dir, "documents"))
    cols = [
        "doc_id", "n_tokens", "n_oov_tokens", "mean_delta",
        "nb_pred", "label_bin", "is_holdout",
    ]
    s = sorted(map(tuple, streamed.select(*cols).collect()))
    b = sorted(map(tuple, batch.select(*cols).collect()))
    assert s == b and len(s) == 500


def test_streaming_nb_model_cdc_merge_equals_retrain(spark):
    """The model-CDC gate's ADDITIVE per-batch count merge must equal
    a from-scratch retrain at every model version: rebuild each
    slice's rolling scores batch-side (train on slices ≤ s, score
    slice s) plus the final-model scores, and compare the streamed
    frame EXACTLY.  Slice 2's rolling model IS the final model, so its
    staleness columns must agree identically."""
    import pyspark.sql.functions as F

    import __spark_entry__ as entrymod
    from financial_data_stream_processing_engine_spark.io_utils import load_table
    from financial_data_stream_processing_engine_spark.operators.lm import (
        nb_score,
        nb_train,
    )

    sf_dir = "/root/testdata/sf0.001"
    streamed = entrymod.queries()["streaming_nb_model_cdc"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    fwc, ftot = nb_train(docs)
    want = []
    for s in range(3):
        seen = docs.filter(F.col("doc_id") % 3 <= s)
        batch = docs.filter(F.col("doc_id") % 3 == s)
        wc, tot = nb_train(seen)
        roll = {
            r["doc_id"]: r for r in nb_score(batch, wc, tot).collect()
        }
        fin = {r["doc_id"]: r for r in nb_score(batch, fwc, ftot).collect()}
        for did, r in roll.items():
            f = fin[did]
            want.append(
                (
                    did, s, r["n_tokens"], r["n_oov_tokens"], f["n_oov_tokens"],
                    r["mean_delta"], f["mean_delta"], r["nb_pred"], f["nb_pred"],
                    r["nb_pred"] != f["nb_pred"],
                )
            )
    cols = [
        "doc_id", "model_slice", "n_tokens", "n_oov_roll", "n_oov_final",
        "mean_delta_roll", "mean_delta_final", "pred_roll", "pred_final",
        "pred_flipped",
    ]
    got = sorted(map(tuple, streamed.select(*cols).collect()))
    assert got == sorted(want) and len(got) == 500
    # slice 2's rolling model is the final model: staleness ≡ 0 there,
    # and earlier slices can only have MORE OOV under the smaller vocab
    for row in streamed.collect():
        if row["model_slice"] == 2:
            assert row["mean_delta_roll"] == row["mean_delta_final"]
            assert row["n_oov_roll"] == row["n_oov_final"]
            assert not row["pred_flipped"]
        assert row["n_oov_roll"] >= row["n_oov_final"]


def test_streaming_phash_gate_equals_batch_gate(spark):
    """The streamed pHash gate (per-batch probe against the
    accumulated band index of strictly-earlier batches) must equal the
    batch reconstruction: all Hamming-≤3 pairs (banded retrieval is
    pigeonhole-complete at radius 3), attributed to the later-slice
    side.  The planted perturbation family guarantees real cross-batch
    matches, so the gate must actually fire."""
    import pyspark.sql.functions as F

    import __spark_entry__ as entrymod
    from financial_data_stream_processing_engine_spark.io_utils import load_table
    from financial_data_stream_processing_engine_spark.operators import phash
    from financial_data_stream_processing_engine_spark.plans.llm_queries import (
        _md5_phash_png_generator,
    )
    from financial_data_stream_processing_engine_spark.operators import multimodal

    sf_dir = "/root/testdata/sf0.001"
    streamed = entrymod.queries()["streaming_phash_gate"](spark, sf_dir)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pngs = docs.mapInPandas(
        _md5_phash_png_generator(), schema="doc_id long, payload binary"
    )
    media = multimodal.as_media(
        pngs, id_col="doc_id", payload=F.col("payload"),
        kind="image", mime="image/png",
    )
    ph = {r["media_id"]: r["phash"] for r in phash.phash64(media).collect()}
    pairs = phash.phash_hamming_pairs(
        phash.phash64(media)
    ).collect()
    want: dict[int, list[int]] = {i: [] for i in ph}
    for r in pairs:
        a, b, h = r["id_a"], r["id_b"], r["hamming"]
        # attribute to the later slice; equal slices never gate
        if a % 3 < b % 3:
            want[b].append(h)
        elif b % 3 < a % 3:
            want[a].append(h)
    got = {r["media_id"]: r for r in streamed.collect()}
    assert set(got) == set(ph)
    fired = 0
    for mid, hs in want.items():
        g = got[mid]
        assert g["slice"] == mid % 3
        assert g["phash"] == ph[mid]
        assert g["n_prior_dups"] == len(hs)
        assert g["min_prior_hamming"] == (min(hs) if hs else None)
        assert g["is_near_dup"] == bool(hs)
        fired += bool(hs)
    assert fired > 0, "planted cross-slice near-dups must be recalled"


def test_streaming_unigram_cdc_merge_equals_retrain(spark):
    """The tokenizer-CDC gate's ADDITIVE per-batch (word, freq) merge
    must equal a from-scratch retrain at every version: rebuild each
    slice's rolling segmentation batch-side (train on word counts of
    slices ≤ s, segment slice s) plus the final-model segmentation and
    compare the streamed frame EXACTLY.  Slice 2's rolling state is
    the full corpus, so its drift must be identically zero."""
    import pyspark.sql.functions as F

    import __spark_entry__ as entrymod
    from financial_data_stream_processing_engine_spark.io_utils import load_table
    from financial_data_stream_processing_engine_spark.operators import unigram

    sf_dir = "/root/testdata/sf0.001"
    streamed = entrymod.queries()["streaming_unigram_cdc"](spark, sf_dir)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fvocab, _ = unigram.unigram_train(docs, rounds=1)
    fin = {
        r["doc_id"]: r for r in unigram.unigram_segment(docs, fvocab).collect()
    }
    want = []
    for s in range(3):
        seen = docs.filter(F.col("doc_id") % 3 <= s)
        batch = docs.filter(F.col("doc_id") % 3 == s)
        rvocab, _ = unigram.unigram_train_words(
            unigram.word_freqs(seen), rounds=1
        )
        for r in unigram.unigram_segment(batch, rvocab).collect():
            f = fin[r["doc_id"]]
            want.append(
                (
                    r["doc_id"], s, r["n_words"],
                    r["n_pieces"], r["total_cost"],
                    f["n_pieces"], f["total_cost"],
                    r["n_pieces"] != f["n_pieces"]
                    or r["total_cost"] != f["total_cost"],
                )
            )
    cols = [
        "doc_id", "model_slice", "n_words",
        "n_pieces_roll", "total_cost_roll",
        "n_pieces_final", "total_cost_final", "seg_drift",
    ]
    got = sorted(map(tuple, streamed.select(*cols).collect()))
    assert got == sorted(want) and len(got) == 500
    drifted_early = 0
    for row in streamed.collect():
        if row["model_slice"] == 2:
            assert row["n_pieces_roll"] == row["n_pieces_final"]
            assert row["total_cost_roll"] == row["total_cost_final"]
            assert not row["seg_drift"]
        else:
            drifted_early += bool(row["seg_drift"])
    # value-content certificate: the staleness signal must actually
    # fire — a rolling model trained on a corpus PREFIX segments some
    # early-slice docs differently from the final model
    assert drifted_early > 0


@pytest.fixture(scope="module")
def sparse_docs_dir(spark, tmp_path_factory):
    """An sf_dir whose documents table has an EMPTY doc_id % 3 == 1
    slice — the sparse-corpus shape that used to desynchronize the
    micro-batch slice clock in the CDC gates (ADVICE r14 #1): an empty
    slice either writes an empty feed file (one empty micro-batch) or
    no file at all, and either way the next non-empty batch must not
    trip the out-of-order guard."""
    root = tmp_path_factory.mktemp("sparse_sf")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") % 3 != 1)
    )
    docs.write.mode("overwrite").parquet(str(root / "documents.parquet"))
    return str(root)


def test_streaming_phash_gate_sparse_corpus_empty_slice(spark, sparse_docs_dir):
    """The pHash gate must survive an empty middle slice: slice-2 docs
    still probe the slice-0 index (slice 1 contributed nothing), and
    every surviving doc gets exactly one output row."""
    import __spark_entry__ as entrymod

    got = {
        r["media_id"]: r
        for r in entrymod.queries()["streaming_phash_gate"](
            spark, sparse_docs_dir
        ).collect()
    }
    docs = [
        r["doc_id"]
        for r in spark.read.parquet(
            f"{sparse_docs_dir}/documents.parquet"
        ).select("doc_id").collect()
    ]
    assert set(got) == set(docs) and docs
    fired = 0
    for mid, row in got.items():
        assert row["slice"] == mid % 3 and row["slice"] in (0, 2)
        if row["slice"] == 0:
            assert row["n_prior_dups"] == 0 and not row["is_near_dup"]
        fired += bool(row["is_near_dup"])
    # the planted perturbation family (5j+4 <- 5j) still crosses the
    # surviving slices, so the gate must actually fire
    assert fired > 0


def test_streaming_unigram_cdc_sparse_corpus_empty_slice(spark, sparse_docs_dir):
    """The tokenizer-CDC gate must survive an empty middle slice: the
    state version carries across the gap, slice 2 still merges to the
    full (filtered) corpus, and its drift is identically zero."""
    import __spark_entry__ as entrymod
    from financial_data_stream_processing_engine_spark.operators import unigram

    streamed = entrymod.queries()["streaming_unigram_cdc"](
        spark, sparse_docs_dir
    )
    docs = spark.read.parquet(f"{sparse_docs_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    rows = streamed.collect()
    assert len(rows) == n_docs and n_docs > 0
    assert {r["model_slice"] for r in rows} == {0, 2}
    for r in rows:
        if r["model_slice"] == 2:
            assert r["n_pieces_roll"] == r["n_pieces_final"]
            assert r["total_cost_roll"] == r["total_cost_final"]
            assert not r["seg_drift"]
    # slice-0 rolling scores must equal an independent from-scratch
    # train on slice 0 alone (the merge path saw exactly that state)
    s0 = docs.filter(F.col("doc_id") % 3 == 0)
    v0, _ = unigram.unigram_train_words(unigram.word_freqs(s0), rounds=1)
    want0 = {
        r["doc_id"]: (r["n_pieces"], r["total_cost"])
        for r in unigram.unigram_segment(s0, v0).collect()
    }
    got0 = {
        r["doc_id"]: (r["n_pieces_roll"], r["total_cost_roll"])
        for r in rows
        if r["model_slice"] == 0
    }
    assert got0 == want0


def test_streaming_nb_model_cdc_sparse_corpus_empty_slice(spark, sparse_docs_dir):
    """The NB-model CDC gate shares the slice-clock discipline with the
    pHash/unigram gates and must survive an empty middle slice the same
    way: the state version carries across the gap and slice 2 still
    merges to the full (filtered) corpus, so its rolling scores equal
    the final model's."""
    import __spark_entry__ as entrymod

    streamed = entrymod.queries()["streaming_nb_model_cdc"](
        spark, sparse_docs_dir
    )
    n_docs = (
        spark.read.parquet(f"{sparse_docs_dir}/documents.parquet").count()
    )
    rows = streamed.collect()
    assert len(rows) == n_docs and n_docs > 0
    assert {r["model_slice"] for r in rows} == {0, 2}
    for r in rows:
        if r["model_slice"] == 2:
            assert r["mean_delta_roll"] == r["mean_delta_final"]
            assert r["n_oov_roll"] == r["n_oov_final"]
            assert not r["pred_flipped"]


def test_reconcile_slices_catches_dropped_nonempty_slice(spark):
    """ADVICE r15 #3: the CDC gates' out-of-order guard tolerates
    forward jumps, so a LOST non-empty feed file would be silently
    absorbed as an empty slice — the shared post-stop reconciliation
    is what turns that loss into a loud failure.  Drive the helpers
    directly, the way the gates do (r18: the slice set rides the feed
    writer's own pass as an Observation — CollectMetrics is a pushdown
    barrier, so a sliced write still observes every pre-filter source
    row): a processed-slice set missing a populated slice raises, the
    complete set (and the empty-slice case, where the data itself
    lacks the slice) passes."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from financial_data_stream_processing_engine_spark.plans.streaming_queries import (
        _observed_slice_source,
        _reconcile_slices,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(9)], "doc_id long, text string"
    )

    def observed(df):
        # the gate's feed-writer shape: slice the OBSERVED frame; the
        # first slice action delivers the full pre-filter slice set
        src, obs = _observed_slice_source(df)
        src.filter(F.col("doc_id") % 3 == 0).write.format("noop").mode(
            "overwrite"
        ).save()
        return obs

    # all three slices populated and processed: passes
    _reconcile_slices({0, 1, 2}, observed(docs))
    # slice 1's feed file was lost: the gate saw {0, 2} only — raises
    with _pytest.raises(RuntimeError, match="slice reconciliation failed"):
        _reconcile_slices({0, 2}, observed(docs))
    # genuinely-empty slice 1 (sparse corpus): {0, 2} is complete
    sparse = docs.filter("doc_id % 3 != 1")
    _reconcile_slices({0, 2}, observed(sparse))
    # a phantom processed slice (clock over-advance regression) raises
    with _pytest.raises(RuntimeError, match="slice reconciliation failed"):
        _reconcile_slices({0, 1, 2}, observed(sparse))
