"""Catalog-wide physical-plan anti-pattern ratchet.

The per-entry pins in ``tests/test_plans.py`` lock the scale-shape of
the headline plans; this tool generalizes them into a sweep over the
WHOLE catalog: build every ``queries()`` entry at a small sf dir and
grep its *executed* physical plan for the markers that sink a plan at
100 TB —

* ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan.  The
  engine's rule is zero, anywhere; there is no allowlist tier for it.
* ``CartesianProduct`` — an unconditional all-pairs join.
* ``BroadcastNestedLoopJoin`` — legitimate ONLY when the build side is
  a literal one-row/bounded aggregate frame (a model total, a global
  threshold) cross-joined into a scan; quadratic when it is data-sized.
  Allowed per entry via :data:`ALLOW` with the bounded-build argument.
* ``ArrowEvalPython`` — a scalar pandas_udf.  Not wrong per se (Arrow
  batches, vectorized), but every occurrence must be a deliberate
  choice recorded in :data:`ALLOW`, not an accident.

``MapInPandas``/``FlatMapGroupsInPandas`` are NOT flagged: the codec /
stateful seams are mapInPandas by design and carry their own pins.

The ratchet is two-sided: an entry that trips a marker without an
``ALLOW`` row fails, and an ``ALLOW`` row whose marker no longer
appears is reported STALE so the allowlist only ever shrinks.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
(default sf_dir /root/testdata/sf0.001 — plan shape, not timing, so
the smallest fixture is the right scale).
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

#: plan markers swept for, in report order.
MARKERS = (
    "BatchEvalPython",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "ArrowEvalPython",
)

#: shared justifications
_CENTROIDS = (
    "the broadcast build is the k-centroid / codebook model frame "
    "(ObjectHashAggregate keyed on centroid_id, k a hyperparameter) — "
    "model-cardinality-bounded, never data-sized"
)
_BPE_APPLY = (
    "BPE merge application is per-string iterative (greedy pair "
    "replacement) — Arrow-batched pandas_udf, replica-pinned in tests"
)

#: entry -> {marker: justification}.  BatchEvalPython is deliberately
#: unlistable: a row-at-a-time UDF has no bounded-build defense.
ALLOW: dict[str, dict[str, str]] = {
    # pair-dot product over candidate pairs: Arrow-vectorized
    # pandas_udf with the documented bitwise-equality argument to the
    # aggregate fold it replaces (operators/dedup.py::pair_dot_udf).
    "dedup_embedding_cosine": {
        "ArrowEvalPython": "pair_dot_udf — Arrow pandas_udf, bitwise-pinned",
        "BroadcastNestedLoopJoin": (
            "the DOCUMENTED brute-force all-pairs cosine baseline "
            "(id_a < id_b theta join) — the scale paths are "
            "dedup_embedding_lsh / dedup_semantic"
        ),
    },
    "dedup_semantic": {
        "ArrowEvalPython": "pair_dot_udf on IVF-cell candidates",
        "BroadcastNestedLoopJoin": _CENTROIDS,
    },
    "dedup_semantic_kmeans": {
        "ArrowEvalPython": "pair_dot_udf on IVF-cell candidates",
    },
    "similarity_ivf_topk": {"BroadcastNestedLoopJoin": _CENTROIDS},
    "crossmodal_phash_ivf_agreement": {"BroadcastNestedLoopJoin": _CENTROIDS},
    "similarity_ivf_kmeans_topk": {"BroadcastNestedLoopJoin": _CENTROIDS},
    "similarity_ivfpq_topk": {"BroadcastNestedLoopJoin": _CENTROIDS},
    "retrieval_rrf_fusion": {
        "BroadcastNestedLoopJoin": _CENTROIDS
        + "; plus the 1-row BM25 corpus-stats broadcast and the 1-row "
        "query-vector broadcast of the IVF arm — every BNLJ side here "
        "is bounded (one row or ncells rows) by construction"
    },
    "similarity_multiquery_ivf_topk": {"BroadcastNestedLoopJoin": _CENTROIDS},
    "similarity_recall_report": {
        "BroadcastNestedLoopJoin": _CENTROIDS
        + "; plus the brute-force exact-top-k arm it reports recall against"
    },
    "similarity_cosine_topk": {
        "BroadcastNestedLoopJoin": (
            "the single query vector (unique-key equality filter, one "
            "row) broadcast against the corpus scan — the documented "
            "brute-force baseline; similarity_ivf_* are the scale path"
        )
    },
    "dedup_ngram_jaccard": {
        "BroadcastNestedLoopJoin": (
            "the DOCUMENTED brute-force all-pairs n-gram Jaccard "
            "baseline — dedup_prefix_jaccard (PPJoin) is the scale path"
        )
    },
    "udtf_ngrams": {
        "BatchEvalPythonUDTF": (
            "the Python UDTF lateral-join showcase entry — the UDTF "
            "seam IS the operator under test"
        )
    },
    # deliberate Arrow-vectorized pandas_udf seams: per-string
    # iterative algorithms (BPE merge application, unicodedata NFC)
    # that no built-in expression expresses; all are batch-vectorized,
    # none row-at-a-time
    "text_bpe_tokenize": {"ArrowEvalPython": _BPE_APPLY},
    "text_bpe_train_tokenize": {"ArrowEvalPython": _BPE_APPLY},
    "text_token_counts": {"ArrowEvalPython": _BPE_APPLY},
    "pack_sequences_bpe": {"ArrowEvalPython": _BPE_APPLY},
    "corpus_select_token_budget": {"ArrowEvalPython": _BPE_APPLY},
    "text_unicode_normalize": {
        "ArrowEvalPython": "unicodedata.normalize('NFC') — stdlib-exact, Arrow-batched"
    },
    "dedup_simhash": {
        "ArrowEvalPython": (
            "the 60-bit simhash pack pandas_udf (documented in "
            "operators/dedup.py) — Arrow-batched bit packing"
        )
    },
}


def _depth(line: str) -> int:
    """Column where the node name starts in a plan toString line."""
    i = 0
    while i < len(line) and line[i] in " :+-*(0123456789)":
        i += 1
    return i


def _subtree(lines: list[str], i: int) -> list[str]:
    d = _depth(lines[i])
    out = []
    for j in range(i + 1, len(lines)):
        if _depth(lines[j]) <= d:
            break
        out.append(lines[j])
    return out


#: build-side subtrees that prove a BOUNDED broadcast frame:
#: * a global (keys=[]) aggregate in any physical flavor — exactly one
#:   row (model totals, global thresholds, scalar-subquery rewrites);
#: * a LocalTableScan / Scan ExistingRDD — a driver-created literal
#:   frame (band tables, composition lattices, sketch registers):
#:   every data-sized frame in this engine comes off a parquet scan,
#:   so an ExistingRDD is driver-sized by construction.
_BOUNDED_BUILD = re.compile(
    r"(?:HashAggregate|SortAggregate|ObjectHashAggregate)\(keys=\[\]"
    r"|LocalTableScan"
    r"|Scan ExistingRDD"
)

_RANGE = re.compile(r"Range \((\d+), (\d+),")

_PLAN_ID = re.compile(r"\[plan_id=\d+\]")


def _bounded_lines(lines: list[str]) -> bool:
    for x in lines:
        if _BOUNDED_BUILD.search(x):
            return True
        m = _RANGE.search(x)
        # a literal Range with a small constant extent (an index /
        # salt fan-out table), never a data-sized domain
        if m and int(m.group(2)) - int(m.group(1)) <= 65536:
            return True
    return False


def _reused_build_bounded(lines: list[str], reuse_line: str) -> bool:
    """Resolve a ReusedExchange build side to its ORIGINAL exchange
    and classify THAT subtree.  A reuse is only as bounded as the
    exchange it reuses: an exchange originally built for a
    BroadcastHashJoin is never swept at its own site (BHJ builds are
    legitimate), so taking reuse on faith would let a data-sized BNLJ
    build through unaudited.  The ReusedExchange toString embeds the
    original exchange's ``[plan_id=N]``; find that exchange's own line
    and run the bounded-build rules on its subtree."""
    m = _PLAN_ID.search(reuse_line)
    if not m:
        return False
    pid = m.group(0)
    for k, ln in enumerate(lines):
        if pid in ln and "Exchange" in ln and "ReusedExchange" not in ln:
            return _bounded_lines(_subtree(lines, k))
    return False


def _unbounded_bnlj(plan: str) -> int:
    """BNLJ occurrences whose broadcast build side is NOT a provably
    bounded frame.  Bounded = the BroadcastExchange subtree contains a
    global (keys=[]) aggregate — the one-row model-total / threshold
    crossJoin idiom — so the loop join degenerates to a constant
    append.  Anything else (a data-sized build, a theta condition over
    two scans) counts as unbounded and must be ALLOWed explicitly."""
    lines = plan.splitlines()
    n = 0
    for i, line in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in line:
            continue
        sub = _subtree(lines, i)
        bounded = False
        if sub:
            child_d = min(_depth(s) for s in sub)
            for j, s in enumerate(sub):
                # direct children only — a BroadcastExchange nested in
                # the STREAMED child (a join further down) must not
                # vouch for this BNLJ's build side
                if _depth(s) != child_d:
                    continue
                if "ReusedExchange" in s:
                    bounded = _reused_build_bounded(lines, s)
                    break
                if "BroadcastExchange" in s:
                    bounded = _bounded_lines(_subtree(sub, j))
                    break
        if not bounded:
            n += 1
    return n


def audit_one(plan: str) -> dict[str, int]:
    hits = {m: plan.count(m) for m in MARKERS if m in plan}
    # a Python UDTF node stringifies as BatchEvalPythonUDTF — that is
    # the lateral table-function seam (its own deliberate surface),
    # not a row-at-a-time scalar UDF; report it under its own key
    if "BatchEvalPython" in hits:
        udtf = plan.count("BatchEvalPythonUDTF")
        if udtf:
            hits["BatchEvalPythonUDTF"] = udtf
            if hits["BatchEvalPython"] == udtf:
                del hits["BatchEvalPython"]
            else:
                hits["BatchEvalPython"] -= udtf
    if "BroadcastNestedLoopJoin" in hits:
        unbounded = _unbounded_bnlj(plan)
        if unbounded == 0:
            del hits["BroadcastNestedLoopJoin"]  # all builds are 1-row aggs
        else:
            hits["BroadcastNestedLoopJoin"] = unbounded
    return hits


def main() -> int:
    import os

    args = [a for a in sys.argv[1:]]
    # first arg is the sf dir iff it IS a directory — a slash-count
    # heuristic would silently reinterpret a relative sf dir as a
    # query-name filter and report CLEAN over zero entries
    if args and os.path.isdir(args[0]):
        sf_dir, only = args[0], set(args[1:])
    else:
        sf_dir, only = "/root/testdata/sf0.001", set(args)

    from financial_data_stream_processing_engine_spark.session import get_spark
    from financial_data_stream_processing_engine_spark.plans import catalog

    catalog.load_all()
    unknown = only - set(catalog.QUERIES)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in catalog.QUERIES if not only or n in only]
    violations: list[str] = []
    stale: list[str] = []
    errors: list[str] = []
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            df = catalog.QUERIES[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            errors.append(f"{name}: {type(exc).__name__}: {exc}")
            print(f"! {name:36s} ERROR {type(exc).__name__}", flush=True)
            continue
        hits = audit_one(plan)
        allowed = ALLOW.get(name, {})
        bad = {m: c for m, c in hits.items() if m not in allowed}
        for m in allowed:
            if m not in hits:
                stale.append(f"{name}: ALLOW[{m!r}] no longer in plan")
        mark = "✗" if bad else "✓"
        detail = " ".join(f"{m}×{c}" for m, c in sorted(hits.items()))
        print(f"{mark} {name:36s} [{time.time() - t0:5.1f}s] {detail}", flush=True)
        if bad:
            violations.append(f"{name}: {bad}")

    print(f"\nswept {len(names)} entries in {time.time() - t_all:.0f}s")
    for v in violations:
        print(f"VIOLATION  {v}")
    for s in stale:
        print(f"STALE      {s}")
    for e in errors:
        print(f"ERROR      {e}")
    if violations or errors:
        print("PLAN AUDIT FAILED")
        return 1
    print("PLAN AUDIT CLEAN" + (" (stale allows above)" if stale else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
