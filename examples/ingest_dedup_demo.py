"""Streaming ingest-dedup demo — REAL Structured Streaming wiring for
the incremental MinHash-LSH index. Runnable as:

    python examples/ingest_dedup_demo.py [sf_dir]

A file-source stream stands in for the ingest bus (swap the reader
format for Kafka and nothing else changes): documents land as JSONL
drops, `readStream` micro-batches them, and `IngestDedupSink`
(foreachBatch) appends each batch's banding rows to the persisted
index and emits the batch's candidate near-dup pairs against
everything ingested so far.

What this demonstrates that the batch queries can't:
  * per-batch cost ∝ batch (the corpus pass is amortized in the index);
  * exactly-once-effect under at-least-once foreachBatch delivery
    (as-of-batch index view + marker + per-batch output overwrite);
  * the final candidate set converges to the one-shot batch LSH run —
    printed side-by-side at the end.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from warp_pipe_spark.datapipe.dedup import minhash_lsh_pairs
from warp_pipe_spark.datapipe.dedup_index import IngestDedupSink
from warp_pipe_spark.io import read_table
from warp_pipe_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ingest_dedup_demo", cpus=8, shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="wp_ingest_demo_")
    drop_dir = os.path.join(work, "drops")
    os.makedirs(drop_dir)

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()

    # three JSONL drops = three micro-batches arriving on the bus
    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    third = (len(rows) + 2) // 3
    for b in range(3):
        with open(os.path.join(drop_dir, f"drop_{b}.jsonl"), "w") as f:
            for r in rows[b * third : (b + 1) * third]:
                f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one drop file per micro-batch
        .json(drop_dir)
    )
    sink = IngestDedupSink(
        spark, os.path.join(work, "index"), os.path.join(work, "out")
    )
    (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    got = {
        tuple(sorted((r["query_id"], r["match_id"])))
        for r in sink.candidates().collect()
    }
    expect = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    print(f"ingested {n} docs in 3 micro-batches")
    print(f"streaming candidates (undirected): {len(got)}")
    print(f"one-shot batch LSH pairs:          {len(expect)}")
    print("converged:", got == expect)

    # --- layer 0: the exact-key bloom gate in front of the MinHash
    # probe (the README "layered dedup gates" recipe). A re-crawl
    # batch arrives: half its keys were already ingested above, half
    # are new. The frozen bloom filter of ingested doc_ids drops the
    # exact re-crawls map-side (zero shuffles) so only genuinely new
    # docs pay the near-dup index probe.
    from warp_pipe_spark.datapipe.bloom import (
        bloom_gate_packed,
        read_bloom,
        write_bloom,
    )

    bloom_dir = os.path.join(work, "bloom")
    write_bloom(
        docs.select(F.col("doc_id").alias("key")), bloom_dir, m_bits=1 << 16
    )
    recrawl = docs.limit(0).unionByName(
        docs.filter(F.col("doc_id") % 2 == 0)  # exact re-crawls
    ).unionByName(
        docs.filter(F.col("doc_id") % 2 == 1).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )  # new docs (fresh ids)
    )
    words, m_bits, k_hashes = read_bloom(spark, bloom_dir)
    gated = bloom_gate_packed(
        recrawl, words, key_col="doc_id", m_bits=m_bits, k_hashes=k_hashes
    )
    novel = gated.filter(~F.col("maybe_member"))
    n_re, n_novel = recrawl.count(), novel.count()
    print(
        f"re-crawl batch: {n_re} docs -> bloom gate passes {n_novel} "
        f"novel to the MinHash probe ({n_re - n_novel} exact re-crawls "
        "dropped map-side, zero shuffles)"
    )
    ok = got == expect and n_novel < n_re
    shutil.rmtree(work, ignore_errors=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
