"""Mixture building — the round-14 selection/allocation pair composed
into the published multilingual-pretraining recipe. Runnable as:

    python examples/mixture_pipeline_demo.py [sf_dir]

Stages (each independently pinned in tests/ with a bit-exact DuckDB
replica at three SFs):
  1. DSIR target-likeness selection   (sampling.dsir_select — Xie et
                                       al. 2023: hashed unigram+bigram
                                       importance weights against a
                                       target SAMPLE, Gumbel-top-k
                                       draw ∝ w, hash-derandomized)
  2. UniMax epoch-capped allocation   (sampling.unimax_allocation /
                                       unimax_sample — Chung et al.
                                       2023: equal group shares capped
                                       at max_epochs, materialized as
                                       per-doc n_copies)
  3. training shards + manifest       (shards.write_webdataset)

Plus the serving path: build_dsir_index freezes the ratio table once
and dsir_score_indexed scores a later "crawl snapshot" batch against
it statelessly — the same train/serve split the persisted IVF and
MinHash indexes use.

Everything is DataFrame-declared and hash-derandomized: a rerun at any
scale reproduces identical membership, copies, and shard bytes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import functions as F

from warp_pipe_spark.datapipe.sampling import (
    build_dsir_index,
    dsir_score_indexed,
    dsir_select,
    unimax_sample,
)
from warp_pipe_spark.datapipe.shards import write_webdataset
from warp_pipe_spark.io import read_table
from warp_pipe_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("mixture_demo", cpus=8, shuffle_partitions=8)
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars"
    )
    n_input = docs.count()

    # 1. DSIR: draw the 60% of the corpus that looks most like the
    # target sample (here: one source stands in for "curated wiki")
    target = docs.filter(F.col("source") == "src0").select("doc_id", "text")
    k = int(n_input * 0.6)
    picked = dsir_select(docs, target, k=k).select("doc_id")
    pool = docs.join(picked, "doc_id", "left_semi")

    # 2. UniMax: spend a half-corpus char budget across sources as
    # equally as the 3-epoch cap allows; docs materialize n_copies
    budget = int(
        pool.agg(F.sum("n_chars")).collect()[0][0] // 2
    )
    mixed = unimax_sample(pool, budget=budget, max_epochs=3)
    by_src = {
        r["source"]: (r["n"], r["copies"])
        for r in mixed.groupBy("source")
        .agg(
            F.count("*").alias("n"), F.sum("n_copies").alias("copies")
        )
        .collect()
    }

    # 3. shards
    out = tempfile.mkdtemp(prefix="wp_mixture_demo_")
    manifest = write_webdataset(
        mixed.select("doc_id", "text"), out, n_shards=4
    ).collect()

    # serving path: freeze the ratio table, score a "new snapshot"
    idx = tempfile.mkdtemp(prefix="wp_dsir_idx_")
    build_dsir_index(docs, target, idx)
    snapshot = docs.filter(F.col("doc_id") % 7 == 3).select("doc_id", "text")
    served = dsir_score_indexed(spark, snapshot, idx)
    n_served = served.count()
    top = served.orderBy(F.col("logw_micro").desc()).limit(1).collect()[0]

    print(f"corpus docs:            {n_input}")
    print(f"dsir selected:          {pool.count()} (k={k})")
    print(f"unimax kept:            {mixed.count()} docs over "
          f"{len(by_src)} sources (budget {budget} chars, cap 3 epochs)")
    for s in sorted(by_src):
        n, copies = by_src[s]
        print(f"  {s:8s} docs {n:5d}  loader copies {copies}")
    print(f"shards:                 {len(manifest)} "
          f"({sum(d['n_docs'] for d in manifest)} member docs)")
    print(f"served snapshot scored: {n_served} docs via frozen index "
          f"(top doc {top['doc_id']} logw_micro {top['logw_micro']})")
    print("mixture pipeline demo OK")
    spark.stop()


if __name__ == "__main__":
    main()
