"""Embedding clustering and graph scoring: deterministic Lloyd k-means,
SemDeDup-style intra-cluster near-dedup, and weighted PageRank.

SemDeDup (Abbas et al. 2023) is the scale answer to embedding
near-dedup that LSH doesn't give you: cluster the corpus first (cheap,
k ≪ N centroids), then run exact pairwise cosine ONLY inside each
cluster — the quadratic term is bounded by the largest cluster instead
of N. The k-means here is the from-first-principles DataFrame variant:
centroids live in a k-row DataFrame (never collected to the driver),
assignment is a broadcast join + min_by, and the centroid update is a
posexplode → groupBy(cluster, dim) avg — every stage map-side-partial
and linear in N·dim per iteration.

Determinism (these ops are oracle-replayed in DuckDB): centroid init is
the k smallest vec_ids (not a random sample), distances and centroid
means are rounded to 6 decimals each iteration, and every argmin tie
breaks on the smaller centroid id. Rounding each iteration means both
engines iterate from bit-identical centroids, so IEEE sum-order
differences cannot compound across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp_pipe_spark.datapipe.dedup import cosine_v


def _sqdist(a, b):
    """Elementwise squared L2 distance between two array<double> cols,
    folded JVM-side (zip_with + aggregate — one codegen'd expression,
    sequential fold so the IEEE sum order matches DuckDB's
    list_reduce)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(vecs: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest centroid per vector: broadcast the k-row centroid table,
    fold the distance in-row, min_by on (dist, cid) — no window, one
    groupBy keyed by vec_id that AQE coalesces. Rounded distance +
    cid tie-break keeps the argmin engine-independent."""
    scored = vecs.join(F.broadcast(cent)).select(
        "vec_id",
        "v",
        "cid",
        F.round(_sqdist(F.col("v"), F.col("cv")), 6).alias("dist"),
    )
    return scored.groupBy("vec_id").agg(
        F.min(F.struct("dist", "cid")).alias("best"),
        F.first("v").alias("v"),
    ).select(
        "vec_id", "v", F.col("best.cid").alias("cluster"), F.col("best.dist").alias("dist")
    )


def kmeans_assign(
    embeddings: DataFrame, k: int = 8, iters: int = 2
) -> DataFrame:
    """Deterministic Lloyd k-means over `embeddings(vec_id, embedding)`:
    init = the k smallest vec_ids, `iters` assign/update rounds, then a
    final assignment. Returns (vec_id, cluster, dist).

    Scale: per iteration one broadcast join (k rows) + one
    groupBy(vec_id) + one posexplode→groupBy(cluster, dim) avg over
    N·dim rows — all algebraic aggregates, no collects, no windows.
    k-row centroid frames are localCheckpointed so the loop's lineage
    stays O(1) instead of O(iters)."""
    vecs = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = vecs.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    for _ in range(iters):
        assigned = _assign(vecs, cent)
        dims = assigned.select(
            "cluster", F.posexplode("v").alias("dim", "x")
        )
        cent = (
            dims.groupBy("cluster", "dim")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .select(F.col("cluster").alias("cid"), "cv")
            .localCheckpoint(eager=False)
        )
    return _assign(vecs, cent).select("vec_id", "cluster", "dist")


def semdedup_pairs(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
) -> DataFrame:
    """SemDeDup: k-means partition, then exact cosine pairs ONLY within
    each cluster (vec_a < vec_b, cos >= threshold). Returns
    (cluster, vec_a, vec_b, cos_sim).

    The self-join is keyed by cluster, so its cost is
    sum(|cluster|²) ≈ N²/k — choose k ≈ N/target_cluster_size to bound
    it (auto-sizing like auto_ivf_params applies). A pathological hot
    cluster is visible in the cluster-size histogram before paying the
    join."""
    vecs = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned = kmeans_assign(embeddings, k=k, iters=iters).join(
        vecs, "vec_id"
    )
    a = assigned.select(
        "cluster", F.col("vec_id").alias("vec_a"), F.col("v").alias("va")
    )
    b = assigned.select(
        "cluster", F.col("vec_id").alias("vec_b"), F.col("v").alias("vb")
    )
    return (
        a.join(b, "cluster")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "cluster",
            "vec_a",
            "vec_b",
            F.round(cosine_v(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    round_dp: int = 8,
) -> DataFrame:
    """Weighted PageRank over `edges(src, dst, weight)` with uniform
    dangling-mass redistribution. Returns (node, pr).

    pr_{t+1}(v) = (1-d)/n + d * (Σ_{u→v} pr_t(u)·w(u,v)/out(u)
                                 + dangling_mass_t / n)

    The loop is the standard join-agg shape that scales to web graphs:
    per iteration one join of the rank vector with the edge list keyed
    by src, one groupBy(dst) sum, and a one-row dangling aggregate
    broadcast back. Rank frames are localCheckpointed every iteration
    to cut lineage. Ranks round to `round_dp` each iteration so a
    DuckDB oracle replays bit-for-bit (sum-order noise can't
    compound)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    # edge transition probability, fixed across iterations
    trans = edges.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("out_w")).alias("p")
    ).localCheckpoint(eager=False)
    has_out = out_w.select(F.col("src").alias("node"), F.lit(1).alias("has_out"))
    pr = nodes.select("node", F.lit(round(1.0 / n, round_dp)).alias("pr"))
    for _ in range(iters):
        dang = (
            pr.join(has_out, "node", "left")
            .filter(F.col("has_out").isNull())
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dmass"))
        )
        contrib = (
            pr.join(trans, pr["node"] == trans["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("p")).alias("c"))
        )
        pr = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .join(F.broadcast(dang))
            .select(
                "node",
                F.round(
                    F.lit((1.0 - damping) / n)
                    + damping
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dmass") / n),
                    round_dp,
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return pr
