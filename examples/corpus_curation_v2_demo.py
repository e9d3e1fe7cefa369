"""Corpus curation v2 — the round-11 operator suite composed into the
published pre-training recipe, start to finish. Runnable as:

    python examples/corpus_curation_v2_demo.py [sf_dir]

Stages (each independently pinned in tests/):
  1. cross-corpus line dedup          (text.dedup_lines — C4/CCNet
                                       boilerplate scrub)
  2. ExactSubstr span removal         (text.scrub_dup_spans — Lee et
                                       al. 2022: repeated 50-token
                                       spans scrubbed BEFORE quality
                                       gating, so boilerplate spans
                                       don't drag good docs under the
                                       gate)
  3. benchmark decontamination        (dedup.decontaminate — 13-gram
                                       eval-overlap removal)
  4. Gopher gate: rules + repetition  (text.gopher_rules +
                                       text.repetition_signals)
  5. quality model: TRAIN then apply  (text.train_quality_model →
                                       apply_quality_model; labels
                                       bootstrapped from the Gopher
                                       verdict, the standard
                                       self-training seed)
  6. token-budget selection           (sampling.select_token_budget —
                                       no global sort)
  7. sequence packing                 (sampling.pack_chunks)
  8. training shards + manifest       (shards.write_webdataset)

Every stage is DataFrame-declared; the training loops hold only
vocab/dims-sized driver state, and the whole pass is deterministic —
a rerun at any scale reproduces identical membership.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from warp_pipe_spark.datapipe.dedup import decontaminate
from warp_pipe_spark.datapipe.sampling import pack_chunks, select_token_budget
from warp_pipe_spark.datapipe.text import (
    apply_quality_model,
    dedup_lines,
    gopher_rules,
    repetition_signals,
    train_quality_model,
)
from warp_pipe_spark.io import read_table
from warp_pipe_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation_v2_demo", cpus=8, shuffle_partitions=8)
    docs = read_table(spark, sf_dir, "documents").filter(
        "text IS NOT NULL"
    )
    n0 = docs.count()

    # 1. boilerplate line scrub (line in >= 3 distinct docs -> removed)
    scrubbed = dedup_lines(docs, min_docs=3).select("doc_id", "text")
    n_scrub = scrubbed.filter(F.length("text") > 0).count()

    # 2. ExactSubstr: scrub every repeated 50-token span (keep one
    # canonical copy), BEFORE any quality gating — the Lee et al.
    # ordering, so boilerplate spans don't sink good documents at the
    # gate. Rewrites text in place, never drops docs.
    from warp_pipe_spark.datapipe.text import scrub_dup_spans

    # localCheckpoint: the scrub's window+aggregate lineage would
    # otherwise be re-executed by every downstream count and by each
    # classifier training iteration (the demo's stages compose into
    # ONE lazy plan) — materialize the stage boundary once.
    span_scrubbed = scrub_dup_spans(scrubbed, n=50).localCheckpoint()
    n_span_tokens = span_scrubbed.agg(
        F.sum("n_removed_tokens").alias("t")
    ).collect()[0]["t"]
    span_scrubbed = span_scrubbed.select("doc_id", "text")

    # 3. decontaminate vs a stand-in eval set (every 50th doc)
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    clean, flagged = decontaminate(
        span_scrubbed.filter(F.col("doc_id") % 50 != 0), bench, n=13
    )
    n_contaminated = flagged.count()

    # 4. Gopher rules + repetition signals gate
    rules = gopher_rules(clean).select("doc_id", "keep")
    rep = repetition_signals(clean).select(
        "doc_id",
        (
            (F.col("dup_line_frac_micro") <= 300000)
            & (F.col("top_2gram_char_frac_micro") <= 600000)
            & (F.col("dup_5gram_char_frac_micro") <= 600000)
        ).alias("rep_keep"),
    )
    gated = (
        clean.join(rules, "doc_id")
        .join(rep, "doc_id")
        .withColumn("gopher_keep", F.col("keep") & F.col("rep_keep"))
    )

    # 5. train the quality classifier on the Gopher verdict, re-apply
    labeled = gated.select(
        "doc_id", "text", F.col("gopher_keep").cast("int").alias("label")
    )
    w, hist = train_quality_model(labeled, dims=512, iters=6, lr=0.02)
    scored = apply_quality_model(gated, w)
    survivors = (
        gated.filter("gopher_keep")
        .join(scored.filter("keep").select("doc_id", "n_tokens"), "doc_id")
    )

    # 6. budgeted selection: top docs by model score under 30k tokens
    budgeted = select_token_budget(
        survivors.join(
            scored.select(
                "doc_id", (F.col("score") * 1000).cast("long").alias("score")
            ),
            "doc_id",
        ).select("doc_id", "text", "score", "n_tokens"),
        budget=30_000,
    )
    picked = budgeted.filter("keep").select("doc_id", "text")
    n_picked = picked.count()

    # 7. pack into 512-token training sequences
    packed = pack_chunks(picked, chunk_tokens=512)
    import pyspark.sql.functions as _F

    n_seq = packed.agg(
        (_F.max("chunk_last") + 1).alias("n")
    ).collect()[0]["n"]

    # 8. package the curated docs as deterministic WebDataset shards
    import tempfile

    from warp_pipe_spark.datapipe.shards import write_webdataset

    shard_dir = tempfile.mkdtemp(prefix="wp_curated_shards_")
    manifest = write_webdataset(picked, shard_dir, n_shards=4).collect()

    print(f"input docs:              {n0}")
    print(f"after line scrub (text): {n_scrub}")
    print(f"span-scrub removed toks: {n_span_tokens}")
    print(f"decontaminated away:     {n_contaminated}")
    print(f"train logloss:           {hist[0][1]:.3f} -> {hist[-1][1]:.3f}")
    print(f"budget-selected docs:    {n_picked}")
    print(f"packed 512-tok seqs:     {n_seq}")
    print(
        f"tar shards:              {len(manifest)} "
        f"({sum(r['n_bytes'] for r in manifest)} bytes) -> {shard_dir}"
    )
    print("curation v2 demo OK")


if __name__ == "__main__":
    main()
