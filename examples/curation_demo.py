"""End-to-end pretraining-corpus curation over the fixture tables —
the LLM-data-pipeline story in one runnable script:

  1. model-based quality scoring (bigram-LM mean transition prob)
  2. learned language classification (Naive Bayes, holdout-split)
  3. exact near-dup removal (prefix-filter AllPairs join, min-id
     survivor) + community structure of the near-dup graph (exact-
     integer Louvain refinement scored by Newman modularity — the
     per-community sizes a pipeline caps contributions by)
  4. tokenizer TRAINING on the surviving corpus (Sennrich BPE)
  5. tokenizer-exact token accounting under the learned merges
  6. greedy sequence packing on exact token costs

Every stage is the same operator the verified catalog entries use.

Usage::

    python examples/curation_demo.py --sf-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from financial_data_stream_processing_engine_spark import get_spark
from financial_data_stream_processing_engine_spark.io_utils import load_table
from financial_data_stream_processing_engine_spark.operators import curation, dedup, text
from financial_data_stream_processing_engine_spark.operators.lm import (
    lm_quality_score,
    nb_lang_classifier,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    spark = get_spark("curation-demo", master="local[8]")
    docs = load_table(spark, args.sf_dir, "documents")
    n0 = docs.count()

    # 1. LM quality buckets
    lm = lm_quality_score(docs)
    keep_ids = lm.where(F.col("lm_bucket") != "low").select("doc_id")
    print(f"quality gate: {n0} -> {keep_ids.count()} docs (dropped 'low' bucket)")

    # 2. learned language labels (holdout accuracy printed for honesty)
    nb = nb_lang_classifier(docs)
    hold = nb.where("is_holdout AND nb_pred <> 'und'")
    acc = hold.where("nb_pred = label_bin").count() / max(hold.count(), 1)
    print(f"NB classifier holdout agreement: {acc:.2f} "
          "(fixture labels are token-independent; see entry docstring)")

    # 3. exact near-dup pairs -> min-id survivors
    kept = docs.join(keep_ids, "doc_id")
    pairs = dedup.prefix_filter_jaccard_pairs(kept, threshold_num=4, threshold_den=5)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    surv = kept.join(losers, "doc_id", "left_anti")
    print(f"near-dup removal: {kept.count()} -> {surv.count()} docs "
          f"({pairs.count()} qualifying pairs)")

    # 3b. community structure of the near-dup graph — the signal a
    # pipeline caps per-community contributions by.  This is the
    # REGISTERED pipeline_neardup_communities entry (exact-Jaccard
    # pairs → connected-components seed → exact-integer Louvain
    # refinement → per-community cap), imported rather than inlined —
    # the demo runs exactly what the driver verifies.
    from financial_data_stream_processing_engine_spark.plans.llm_queries import (
        pipeline_neardup_communities,
    )

    comm = pipeline_neardup_communities(spark, args.sf_dir).localCheckpoint()
    clusters = comm.where("n_members > 1")
    sizes = (
        clusters.select("community", "n_members")
        .distinct()
        .orderBy(F.col("n_members").desc())
    )
    top = [r["n_members"] for r in sizes.take(3)]
    capped_out = comm.where("NOT kept").count()
    print(f"near-dup communities: {sizes.count()} (largest {top}), "
          f"{capped_out} docs capped out at 2 per community")

    # 4. learn a tokenizer from the surviving corpus
    merges_df = text.bpe_train_merges(surv, k=10)
    learned = tuple(
        (r["left_tok"], r["right_tok"]) for r in merges_df.orderBy("rank").collect()
    )
    print("learned merges:", " ".join(f"{a}+{b}" for a, b in learned))

    # 5. exact token accounting under the learned vocabulary
    counted = text.bpe_doc_token_counts(surv, id_col="doc_id", merges=learned)
    total = counted.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    print(f"corpus size under learned tokenizer: {total} BPE tokens")

    # 6. pack into fixed-size training sequences on exact costs
    packed = curation.pack_sequences(
        surv.join(counted, "doc_id"),
        id_col="doc_id",
        budget=512,
        n_tokens_col="n_bpe_tokens",
    )
    n_seqs = packed.select("source", "shard", "pack_idx").distinct().count()
    print(f"packed into {n_seqs} sequences of <=512 learned-BPE tokens")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
