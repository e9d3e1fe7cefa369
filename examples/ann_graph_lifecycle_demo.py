"""ANN graph-index lifecycle — build, serve, and MAINTAIN a
NN-Descent graph without full rebuilds. Runnable as:

    python examples/ann_graph_lifecycle_demo.py [sf_dir]

Stages (each pinned in tests/test_similarity.py):
  1. build    nn_descent(k_build=2k)   — LSH-seeded, O(n·k²)/iter
  2. serve    graph_search             — batched greedy beam, LSH entry
  3. insert   nn_graph_insert          — O(batch·beam·k), affected-only
  4. delete   nn_graph_delete          — repair from the deleted node's
                                         survivors, O(D·k²)
The point of 3/4: a daily ingest/tombstone batch touches only the
affected neighborhood — at 100 TB the graph is petabyte-scale and the
batch is not, so maintenance cost must not scale with n.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from warp_pipe_spark.datapipe.similarity import (
    graph_search,
    nn_descent,
    nn_graph_delete,
    nn_graph_insert,
)
from warp_pipe_spark.io import read_table
from warp_pipe_spark.session import get_spark


def brute_recall(vecs: dict, edges: dict, ids, k: int) -> float:
    hits = 0
    for q in ids:
        qv = vecs[q]
        sims = sorted(
            (
                (round(float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), 6), -i)
                for i, v in vecs.items()
                if i != q
            ),
            reverse=True,
        )
        want = {-i for _, i in sims[:k]}
        hits += len(want & edges.get(q, set()))
    return hits / (k * len(ids))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ann_lifecycle_demo", cpus=8, shuffle_partitions=8)
    emb = read_table(spark, sf_dir, "embeddings").filter("vec_id < 200")
    k = 10

    old = emb.filter("vec_id % 10 != 0")
    batch = emb.filter("vec_id % 10 = 0")

    # 1. build at serve width 2k (HNSW's M_max > M detour margin)
    graph = nn_descent(old, k=2 * k, iters=2).localCheckpoint()

    # 2. serve a query batch over it
    queries = old.filter("vec_id < 40")
    served = graph_search(graph, old, queries, k=k, hops=3, beam=3 * k)
    n_served = served.count()

    # 3. insert the held-out batch — no rebuild
    grown = nn_graph_insert(graph, old, batch, k=2 * k).localCheckpoint()

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    edges: dict = {}
    for r in grown.filter(F.col("rank") <= k).collect():
        edges.setdefault(r["vec_id"], set()).add(r["nbr_id"])
    new_ids = [r["vec_id"] for r in batch.collect()]
    rec_ins = brute_recall(vecs, edges, new_ids, k)

    # 4. tombstone a slice and repair — survivors keep full-width lists
    dels = emb.filter("vec_id % 20 = 5").select("vec_id")
    del_set = {r["vec_id"] for r in dels.collect()}
    shrunk = nn_graph_delete(grown, emb, dels, k=2 * k).localCheckpoint()
    left = {r["vec_id"] for r in shrunk.collect()} | {
        r["nbr_id"] for r in shrunk.collect()
    }
    assert not (left & del_set)
    n_full = (
        shrunk.groupBy("vec_id")
        .count()
        .filter(F.col("count") == 2 * k)
        .count()
    )
    n_nodes = shrunk.select("vec_id").distinct().count()

    print(f"graph nodes (built):       {old.count()}")
    print(f"served results:            {n_served}")
    print(f"inserted batch:            {len(new_ids)} (recall vs brute: {rec_ins:.3f})")
    print(f"deleted + repaired:        {len(del_set)} removed, "
          f"{n_full}/{n_nodes} nodes at full width after repair")
    print("ann graph lifecycle demo OK")


if __name__ == "__main__":
    main()
