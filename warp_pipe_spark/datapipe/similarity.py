"""Similarity search over an embedding column (`array<float>`):
brute-force cosine top-k (baseline) and LSH/IVF bucketed variants
(the scale path).

Scale design: top-k never global-sorts — it's a window rank inside each
query partition (shuffle keyed by query_id), and the candidate set is
bounded by broadcast queries (brute force) or bucket co-membership
(LSH/IVF). At 100 TB the brute-force path is a broadcast-join +
per-partition partial top-k; the IVF path prunes to probed cells first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warp_pipe_spark.datapipe.dedup import _cast_double, cosine_v


def topk_cosine(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    n_queries: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest
    other vectors. Output (query_id, neighbor_id, rank, cos_sim).

    queries defaults to the first `n_queries` vec_ids — deterministic.
    The query side is broadcast (small); the big side streams through
    one narrow stage; ranking shuffles only (n_queries × N) scored rows
    keyed by query — AQE coalesces. Ties break by neighbor_id asc on the
    ROUNDED similarity so rank order is engine-independent.
    """
    if queries is None:
        queries = embeddings.filter(F.col("vec_id") < n_queries)
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine_v(F.col("q_emb"), F.col("c_emb")), 6))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def topk_update(
    cached: DataFrame,
    new_vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Incremental EXACT top-k under corpus growth — the EDBT 2020
    incremental-top-k idea (reuse the previous answer; touch only the
    delta) re-expressed for the served-similarity table a CDC-fed
    corpus maintains: when an ingest batch arrives, merge the CACHED
    per-query top-k with scores against ONLY the new vectors and
    re-rank. Exactness argument: old vectors' cosines are unchanged,
    so no old vector outside the cached top-k can enter the new
    top-k — the cached k rows are a sufficient summary of the entire
    old corpus. Per-update cost is |queries|·|batch| scoring + a
    (k+|batch|)-bounded re-rank per query, independent of corpus
    size; applied per micro-batch it keeps a "similar items" table
    exact under ingest without ever rescoring the corpus
    (pytest-pinned equal to a full topk_cosine rebuild, including
    tie order).

    `cached` is topk_cosine-shaped (query_id, neighbor_id, rank,
    cos_sim) — pass None-equivalent (empty) for a cold start.
    Conventions match topk_cosine: query side broadcast, self-matches
    excluded, ties break by neighbor_id asc on the rounded score."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = new_vectors.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
    )
    scored_new = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim", F.round(cosine_v(F.col("q_emb"), F.col("c_emb")), 6)
        )
        .select("query_id", "neighbor_id", "cos_sim")
    )
    merged = cached.select("query_id", "neighbor_id", "cos_sim").unionByName(
        scored_new
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    max_bench: int = 100_000,
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    complement of dedup.decontaminate's exact 13-gram screen
    (paraphrased or lightly-edited eval items share no 13-gram but DO
    sit next to the original in embedding space). For each corpus
    vector whose best cosine against ANY benchmark vector clears
    `threshold`, emit (vec_id, bench_id, cos_sim): the contaminating
    eval item with the highest ROUNDED similarity, ties on the 6 dp
    value broken by smallest bench_id.

    Scale shape — the asymmetry IS the design: benchmarks are small
    (thousands of items) and the corpus is the 100 TB side, so the
    benchmark matrix broadcasts (bounded by `max_bench`, enforced with
    a limit-probe not a full count) and the corpus streams through ONE
    Arrow mapInPandas GEMM pass — zero corpus shuffles. The UDF
    prefilters at threshold − 1e-6 and emits candidate pairs only
    (≈ contamination_rate · |corpus| rows); the exact verdict —
    F.round(cos, 6) >= threshold, HALF_UP like the DuckDB oracle, so
    banker's-rounding np.round never decides a boundary — and the
    per-doc argmax window run JVM-side on that small flagged set
    (embedding_near_dup_pairs' division of labor, dedup.py:808).

    NULL and zero-norm vectors are excluded on BOTH sides (cosine is
    undefined for a directionless vector — the dedup.py:874 contract).

    `benchmark` is (vec_id, embedding); its ids are reported under
    `bench_id_col`. Corpus ids may collide with benchmark ids (a
    leaked eval item flags itself at cos 1.0)."""
    n_b = benchmark.limit(max_bench + 1).count()
    if n_b > max_bench:
        raise ValueError(
            f"benchmark exceeds max_bench={max_bench} rows; the bench "
            "matrix must stay broadcastable — split the benchmark or "
            "raise max_bench explicitly"
        )
    clean = lambda df: df.filter(  # noqa: E731
        F.col("vec_id").isNotNull()
        & F.col("embedding").isNotNull()
        & F.exists("embedding", lambda x: x != 0)
    )
    bench_rows = sorted(
        (r["vec_id"], list(r["embedding"]))
        for r in clean(benchmark).select("vec_id", "embedding").collect()
    )
    spark = corpus.sparkSession
    if not bench_rows:
        return spark.createDataFrame(
            [], f"vec_id long, {bench_id_col} long, cos_sim double"
        )
    ids_b = np.asarray([i for i, _ in bench_rows], dtype=np.int64)
    B = np.stack([np.asarray(v, dtype=np.float64) for _, v in bench_rows])
    nb = np.linalg.norm(B, axis=1)
    bc = spark.sparkContext.broadcast((ids_b, B, nb))
    prefilter = threshold - 1e-6

    def gemm(batches):
        ids_bb, Bb, nbb = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_a = pdf["vec_id"].to_numpy(dtype=np.int64)
            A = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            # dot / (|a|·|b|): the embedding_near_dup_pairs arithmetic
            # shape, which the DuckDB fold replays at 6 dp
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = A @ Bb.T / np.outer(
                    np.linalg.norm(A, axis=1), nbb
                )
            ii, jj = np.nonzero(sims >= prefilter)
            if len(ii) == 0:
                continue
            yield pd.DataFrame(
                {
                    "vec_id": ids_a[ii],
                    bench_id_col: ids_bb[jj],
                    "cos_raw": sims[ii, jj],
                }
            )

    cand = clean(corpus).select(
        "vec_id", _cast_double(F.col("embedding")).alias("embedding")
    ).mapInPandas(
        gemm, f"vec_id long, {bench_id_col} long, cos_raw double"
    )
    flagged = cand.select(
        "vec_id",
        bench_id_col,
        F.round("cos_raw", 6).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col(bench_id_col).asc()
    )
    return (
        flagged.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", bench_id_col, "cos_sim")
    )


def plane_sign(i: int, d: int) -> float:
    """Deterministic ±1 hyperplane component: +1 iff the 32-bit md5
    prefix of "i:d" is even (the same h32 scheme the SQL oracles
    replay). Pure function of (plane, dimension) — no RNG, reproducible
    in any engine."""
    from warp_pipe_spark.datapipe.text import h32_py

    return 1.0 if h32_py(f"{i}:{d}") % 2 == 0 else -1.0


def hyperplane_signatures(
    embeddings: DataFrame, n_planes: int = 16, dim: int | None = None
) -> DataFrame:
    """Random-hyperplane LSH signature: bit i = sign(<v, r_i>) with r_i
    the deterministic ±1 plane from `plane_sign`. Output (vec_id, sig).

    The planes depend only on (i, d): built ONCE on the driver and
    closed over by an Arrow-batched pandas UDF that computes all
    n_planes dots per batch as ONE float64 matmul (V @ R) and packs the
    sign bits. Sign(dot) is what the oracle's sequential list_reduce
    fold produces too — float64 matmul vs sequential fold can only
    disagree within ~1e-12 of zero, and the synthetic embeddings keep
    |dot| > 1e-5. Replaces n_planes interpreted aggregate/zip_with
    folds (~2·n_planes·dim lambda invocations per row) with BLAS.
    """
    from pyspark.sql.functions import arrow_udf
    from pyspark.sql.types import LongType

    if dim is None:
        row = embeddings.select(F.size("embedding").alias("d")).first()
        if row is None:
            raise ValueError(
                "cannot infer embedding dim from an empty DataFrame — "
                "pass dim explicitly"
            )
        dim = row["d"]
    planes = np.array(
        [[plane_sign(i, d) for i in range(n_planes)] for d in range(dim)]
    )
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    # r14: Arrow-native batches — the (n, d) matrix is a zero-copy
    # reshape of the list buffer (see dedup._arrow_list_matrix) instead
    # of a per-row np.asarray+np.stack loop; identical matmul on an
    # identical float64 matrix, so the packed bits cannot differ.
    @arrow_udf(LongType())
    def sig_udf(emb):
        import pyarrow as pa

        from warp_pipe_spark.datapipe.dedup import _arrow_list_matrix

        v = _arrow_list_matrix(emb)
        if v is None:
            rows = [np.asarray(e, dtype=np.float64) for e in emb.to_pandas()]
            if not rows:
                return pa.array([], type=pa.int64())
            v = np.stack(rows)
        bits = (v @ planes) > 0
        return pa.array(bits @ weights, type=pa.int64())

    return embeddings.select("vec_id", sig_udf(F.col("embedding")).alias("sig"))


def auto_lsh_params(
    n_rows: int, n_bands: int = 4, target_bucket: int = 64
) -> tuple[int, int]:
    """Plane count that keeps expected bucket occupancy ≤ target_bucket:
    bits/band = ceil(log2(n_rows / target_bucket)), so the number of
    band buckets grows LINEARLY with the corpus and pairs-per-bucket —
    the quadratic term — stays bounded. With planes fixed (the naive
    setup) a 10× corpus means 10× occupancy and ~100× emitted pairs per
    bucket: measured 45-65× wall-clock at 10× rows in tools/scale_probe
    before this existed. Capped at 15 bits/band so 4 bands fit the
    60-bit signature long."""
    import math

    bits = max(2, math.ceil(math.log2(max(2.0, n_rows / target_bucket))))
    bits = min(bits, 60 // n_bands)
    return n_bands * bits, n_bands


def hyperplane_lsh_pairs(
    embeddings: DataFrame, n_planes: int | None = 16, n_bands: int = 4
) -> DataFrame:
    """Scale path for near-dup: band the signature (n_bands bands ×
    n_planes/n_bands bits), equi-join on (band, band-bits) — candidates
    share a band. Verify candidates with exact cosine downstream
    (dedup.embedding_near_dup_pairs semantics on the candidate set
    only).

    n_planes=None derives (n_planes, n_bands) from the corpus size via
    auto_lsh_params — the configuration that stays linear as the corpus
    grows; pass it at any real scale. The default stays a fixed 16 so
    the oracle-compared queries (and their DuckDB replays) remain
    deterministic at any test SF."""
    if n_planes is None:
        n_planes, n_bands = auto_lsh_params(embeddings.count(), n_bands)
    if n_planes % n_bands != 0:
        # fail loud: truncated division would silently compute (and pay
        # for) the top n_planes % n_bands sign bits without any band
        # ever reading them — the caller gets weaker bucketing than the
        # n_planes they configured, with no error (pq_codes makes the
        # same divisibility demand of dim % m)
        raise ValueError(
            f"n_planes ({n_planes}) must be divisible by n_bands ({n_bands})"
        )
    bits_per_band = n_planes // n_bands
    sig = hyperplane_signatures(embeddings, n_planes)
    bands = sig.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * bits_per_band)
                        .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                        .alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "bk.band", "bk.key")
    from warp_pipe_spark.datapipe.dedup import bucket_pairs

    return bucket_pairs(bands, ["band", "key"], "vec_id", "vec_a", "vec_b")


def nn_descent(
    embeddings: DataFrame,
    k: int = 10,
    iters: int = 3,
    n_planes: int | None = 16,
    n_bands: int = 4,
    k_build: int | None = None,
) -> DataFrame:
    """NN-Descent k-NN-GRAPH construction (Dong et al., WWW 2011) —
    the standard scalable builder for the neighbor graphs HNSW/NSG
    search over, and the missing graph-construction piece between the
    pairwise LSH ops and the IVF index. LSH-SEEDED: the initial graph
    is the hyperplane band-candidate set capped at k_build per node (never
    all-pairs), then each iteration applies the paper's principle —
    a neighbor of my neighbor is probably my neighbor — joining the
    symmetrized graph with itself on the shared endpoint, scoring new
    candidates with exact cosine, and keeping the top k per node.

    Scale shape per iteration: the symmetrized graph is ≤ 2nk edges,
    the neighbor-of-neighbor join yields O(n·k²) candidate rows,
    vectors attach via two hash joins on vec_id, and one k-bounded
    window (WindowGroupLimit pushes the top-k map-side) closes the
    round — nothing ever materializes beyond n·k², and the frame is
    localCheckpointed per iteration (the kmeans/pagerank plan
    discipline). Determinism: hash-derived planes, sims rounded to 6
    places, ties by neighbor id — two runs produce identical graphs.
    Output (vec_id, nbr_id, rank, cos_sim); iters=0 returns the
    LSH-seeded graph (the recall baseline the iteration tests
    improve on).

    k_build (default 2k) is the paper-practice oversizing: the graph
    is BUILT with k_build edges per node and truncated to k on
    return. The wider working graph is what lets candidates propagate
    past local minima — measured on the embedding fixture at k=10,
    3 iterations: build-at-k plateaus at recall 0.84 (0.42 seed)
    while build-at-2k reaches 0.993, for 4x the per-iteration
    candidate volume (n·k_build²).
    """
    if k_build is None:
        k_build = 2 * k
    # Zero-norm embeddings are excluded up front: cosine to a
    # directionless vector is undefined (NaN), and NaN ordering is
    # engine-dependent — Spark's Window orderBy(desc) ranks NaN FIRST
    # (NaN > any double) where np.lexsort places it LAST, so a zero
    # vector would silently change ranks depending on which scoring
    # path ran. The contract (pinned in test_similarity) matches
    # embedding_near_dup_pairs: zero vectors join NULL vectors outside
    # the similarity universe.
    emb = embeddings.select("vec_id", "embedding").filter(
        F.col("embedding").isNotNull()
        & F.exists("embedding", lambda x: x != 0)
    )

    def _score_topk(up: DataFrame, flagged: bool = False) -> DataFrame:
        # r14 rework: hash joins + ONE batched einsum (cosine_v) + one
        # k-bounded window replaces a cogrouped applyInPandas that
        # invoked a scoring function once per vec_id GROUP — ~n Python
        # calls and n tiny Arrow batches per pass dominated the pass at
        # any corpus size, since per-group candidate blocks are only
        # ≤ k_build² rows. The top-k truncation now runs as
        # WindowGroupLimit (partial map-side top-k before the
        # exchange); rounding is identical and ties order by
        # (−cos, nbr_id) exactly as the per-group lexsort did. Outputs
        # verified BIT-identical against the cogroup form at all three
        # testdata SFs for every in-repo (k, iters, k_build) config.
        # SYMMETRY DEDUP: cos(a,b) is BITWISE equal to cos(b,a) —
        # elementwise products commute exactly in IEEE754, the j-order
        # of each row reduction is unchanged, and na·nb == nb·na. So
        # each UNORDERED pair crosses the Python boundary and pays the
        # einsum once (half the dominant cost of the pass).
        #
        # r15 rework: the mirror is ONE conditional array-explode over
        # the scored pair rows instead of a self-UNION (whose two
        # branches re-executed the join+einsum subtree — there is no
        # exchange between them for ReuseExchange to dedup, so every
        # pair paid the Python boundary twice after all) and the
        # directed-candidate restriction is two precomputed boolean
        # FLAGS on `up` (flagged=True) instead of a LEFT SEMI join —
        # the iteration caller derives them in the same aggregation
        # that dedups the pair set, so the semi join's two exchanges
        # (and the second execution of the O(n·k²) candidate subtree
        # it consumed) are gone. flagged=False (the LSH seed, whose
        # banding pairs are symmetric by construction) emits both
        # directions unconditionally. Row set per direction is exactly
        # the old semi-join's — (a,b) survives iff the directed
        # candidate set contained it — so the window input, and the
        # output, are bit-identical (re-verified at all three SFs).
        lo_e = emb.select(
            F.col("vec_id").alias("_lo"), F.col("embedding").alias("_le")
        )
        hi_e = emb.select(
            F.col("vec_id").alias("_hi"), F.col("embedding").alias("_he")
        )
        flag_cols = ["_fwd", "_rev"] if flagged else []
        ps = (
            up.join(hi_e, "_hi")
            .join(lo_e, "_lo")
            .select(
                "_lo",
                "_hi",
                F.round(cosine_v(F.col("_le"), F.col("_he")), 6).alias(
                    "cos_sim"
                ),
                *flag_cols,
            )
        )
        fwd = F.col("_fwd") if flagged else F.lit(True)
        rev = F.col("_rev") if flagged else F.lit(True)
        dirs = F.filter(
            F.array(
                F.when(
                    fwd,
                    F.struct(
                        F.col("_lo").alias("v"), F.col("_hi").alias("n")
                    ),
                ),
                F.when(
                    rev,
                    F.struct(
                        F.col("_hi").alias("v"), F.col("_lo").alias("n")
                    ),
                ),
            ),
            lambda x: x.isNotNull(),
        )
        scored = ps.select(
            F.explode(dirs).alias("_d"), "cos_sim"
        ).select(
            F.col("_d.v").alias("vec_id"),
            F.col("_d.n").alias("nbr_id"),
            "cos_sim",
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("cos_sim").desc(), F.col("nbr_id").asc()
        )
        return (
            scored.withColumn(
                "rank", F.row_number().over(w).cast("int")
            )
            .filter(F.col("rank") <= k_build)
            .select("vec_id", "nbr_id", "rank", "cos_sim")
        )

    # the banding pairs ARE the seed's unordered candidate set
    # (vec_a < vec_b, distinct): the mirror-union + distinct the seed
    # pass used to build — a full shuffle of 2× the pair rows — never
    # needs to exist
    pairs = hyperplane_lsh_pairs(emb, n_planes, n_bands)
    graph = _score_topk(
        pairs.select(
            F.col("vec_a").alias("_lo"), F.col("vec_b").alias("_hi")
        )
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        sym = graph.select("vec_id", "nbr_id").union(
            graph.select(
                F.col("nbr_id").alias("vec_id"),
                F.col("vec_id").alias("nbr_id"),
            )
        )
        non = (
            sym.alias("a")
            .join(
                sym.alias("b"),
                F.col("a.nbr_id") == F.col("b.vec_id"),
            )
            .select(
                F.col("a.vec_id").alias("vec_id"),
                F.col("b.nbr_id").alias("nbr_id"),
            )
            .filter(F.col("vec_id") != F.col("nbr_id"))
        )
        # raw union (duplicates welcome): ONE pair-keyed aggregation
        # both dedups the unordered pair set AND records which
        # direction(s) the raw candidate set contained (r15) — the
        # flags replace the left-semi restriction, so the O(n·k²)
        # candidate subtree is consumed exactly once and the semi
        # join's two exchanges are gone (the r14 shape consumed it
        # twice: distinct + semi probe side).
        cand = non.union(graph.select("vec_id", "nbr_id"))
        up = (
            cand.select(
                F.least("vec_id", "nbr_id").alias("_lo"),
                F.greatest("vec_id", "nbr_id").alias("_hi"),
                (F.col("vec_id") < F.col("nbr_id")).alias("_f"),
            )
            .groupBy("_lo", "_hi")
            .agg(
                F.max("_f").alias("_fwd"),
                F.max(~F.col("_f")).alias("_rev"),
            )
        )
        graph = _score_topk(up, flagged=True).localCheckpoint(eager=True)
    return graph.filter(F.col("rank") <= k)


def graph_search(
    graph: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    hops: int = 3,
    beam: int | None = None,
    n_planes: int = 16,
    n_bands: int = 4,
    checkpoint: bool = True,
) -> DataFrame:
    """Greedy BEAM search over an nn_descent graph — the query-time
    primitive HNSW-style indexes run, batched for Spark: every query
    advances one hop per round instead of one node per step, so a
    million queries traverse together in `hops` joins. Round r: the
    frontier (each query's current best `beam` nodes) joins the graph
    on node id (candidates = frontier × k edges), candidates score
    against their query vector, and best-so-far truncates back to
    `beam` (default 2k, the same oversizing as nn_descent's k_build —
    a beam of exactly k greedy-locks too early). After `hops` rounds
    the top k per query is the answer.

    Entry points: each query's LSH band mates from the corpus (the
    same hyperplane bucketing the graph was seeded with) — no global
    entry node, no sequential warm-up. Per-round cost is
    O(n_queries·beam·k) candidate rows + one k-bounded window; the
    corpus-sized tables are touched only by hash joins on vec_id.
    Output (query_id, neighbor_id, rank, cos_sim) — rank by rounded
    sim, id tie-break, deterministic end to end.

    Pass the WIDE graph: search wants the build-width edge set
    (nn_descent(k=2·k_serve)), not the truncated serve-width one —
    measured on the embedding fixture at k=10/hops=3: recall 0.84
    over the 10-edge graph, 0.988 over the 20-edge graph with
    beam=3k. Same reason HNSW keeps M_max > M: the extra edges are
    the detours greedy search needs.

    `checkpoint` (VERDICT r13 item 5): the frontier appears TWICE in
    each hop's expansion (frontier×edges ∪ frontier), so an
    unmaterialized lineage doubles per hop — localCheckpoint(eager)
    caps that at O(hops) jobs. checkpoint=False keeps one lazy plan
    (Spark's ReusedExchange dedups the twin frontier subtrees only
    partially: the two uses diverge immediately, so the expensive
    scoring joins re-run). MEASURED both ways at sf0.1 — 25-query
    batch, 1950-node k=20 graph, hops=3, warmed session, 3 runs each:
    True 5.2-5.5 s, False 5.5-5.9 s — the barriers NEVER dominate the
    recompute they prevent, even at the smallest realistic batch, so
    every in-repo caller keeps the default. The flag stays because
    the trade flips only in principle (a plan-compile-bound sub-row
    frontier), and because it documents the measurement. Results are
    bit-identical either way — the flag moves barriers, not math."""
    if beam is None:
        beam = 2 * k
    # Same zero-norm contract as nn_descent (they share the NaN
    # hazard: a zero-norm LSH entry point would score NaN and Spark's
    # NaN-first desc ordering would rank it ABOVE every real
    # neighbor): zero vectors sit outside the similarity universe — a
    # zero-norm corpus vector is never a candidate, a zero-norm query
    # returns no rows.
    _nonzero = lambda c: F.col(c).isNotNull() & F.exists(  # noqa: E731
        c, lambda x: x != 0
    )
    emb = embeddings.select("vec_id", "embedding").filter(
        _nonzero("embedding")
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    ).filter(_nonzero("q_emb"))

    # r15: the query vector RIDES THE FRONTIER (`q_emb` column, joined
    # on once at the entry phase) instead of being re-joined every hop
    # — per hop that deletes one join (at scale: a shuffle of the query
    # table per hop; locally: one broadcast build per pinned action).
    # The carried column is beam rows × one vector per query, bounded
    # by the frontier itself, and every row of a query carries the
    # identical vector, so scores cannot change.
    def _score(cand: DataFrame) -> DataFrame:
        c = emb.select(
            F.col("vec_id").alias("_cid"), F.col("embedding").alias("_ce")
        )
        return (
            cand.join(c, cand["neighbor_id"] == c["_cid"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                "q_emb",
                F.round(cosine_v(F.col("q_emb"), F.col("_ce")), 6).alias(
                    "cos_sim"
                ),
            )
        )

    def _truncate(scored: DataFrame, width: int) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= width)
            .select("query_id", "neighbor_id", "q_emb", "rank", "cos_sim")
        )

    # entry points: corpus nodes sharing an LSH band with the query —
    # pass the SAME n_planes/n_bands the graph was seeded with
    # (nn_descent's arguments); a mismatched signature space gives
    # unrelated entry nodes and silently degraded recall
    bits = n_planes // n_bands

    def _bands(df: DataFrame, idcol: str):
        sig = hyperplane_signatures(
            df.select(F.col(idcol).alias("vec_id"), "embedding"), n_planes
        )
        return sig.select(
            F.col("vec_id").alias(idcol),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright(F.col("sig"), b * bits)
                            .bitwiseAND(F.lit((1 << bits) - 1))
                            .alias("key"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("bk"),
        ).select(idcol, "bk.band", "bk.key")

    qb = _bands(
        queries.select(F.col("vec_id").alias("query_id"), "embedding"),
        "query_id",
    )
    cb = _bands(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )
    # the ONLY query-table join: entry rows take their q_emb here and
    # the frontier carries it through every hop (duplicate entry pairs
    # — a query and corpus vector sharing >1 band — are preserved
    # exactly as before: the q join multiplies each row by 1)
    entry = qb.join(cb, ["band", "key"]).select(
        "query_id", "neighbor_id"
    ).join(q, "query_id")
    _pin = (
        (lambda df: df.localCheckpoint(eager=True))
        if checkpoint
        else (lambda df: df)
    )
    frontier = _pin(_truncate(_score(entry), beam))
    edges = graph.select(
        F.col("vec_id").alias("neighbor_id"), F.col("nbr_id")
    )
    for hop in range(hops):
        # r15 hop fusion: the candidate dedup runs as ONE query-keyed
        # aggregation (collect_set over the hop's candidates is exactly
        # the old global distinct, grouped by query) and q_emb rides
        # along via first() — every row of a query carries the
        # identical vector, so first() is deterministic. Per-query set
        # size is bounded by beam·(k_edges+1), so the aggregation
        # buffer is O(beam·k), never corpus-sized. Explode order is
        # irrelevant — the window re-sorts, and neighbors are unique
        # per query — so the hop output is bit-identical.
        expanded = (
            frontier.join(edges, "neighbor_id")
            .select(
                "query_id", F.col("nbr_id").alias("neighbor_id"), "q_emb"
            )
            .union(frontier.select("query_id", "neighbor_id", "q_emb"))
            .groupBy("query_id")
            .agg(
                F.collect_set("neighbor_id").alias("_nbrs"),
                F.first("q_emb").alias("q_emb"),
            )
            .select(
                "query_id", F.explode("_nbrs").alias("neighbor_id"), "q_emb"
            )
        )
        scored = _truncate(_score(expanded), beam)
        # the LAST hop stays unpinned (r15): the pin exists because the
        # frontier feeds the NEXT hop twice (union branches) — the
        # final frontier feeds only the caller's single action, and the
        # previous hop's pin already bounds its recompute, so the
        # barrier (one action + one RDD materialization per run) buys
        # nothing. Callers that fan the result out pin it themselves
        # (nn_graph_insert does).
        frontier = scored if hop == hops - 1 else _pin(scored)
    return frontier.filter(F.col("rank") <= k).select(
        "query_id", "neighbor_id", "rank", "cos_sim"
    )


def nn_graph_insert(
    graph: DataFrame,
    embeddings: DataFrame,
    new_vectors: DataFrame,
    k: int = 10,
    hops: int = 3,
    beam: int | None = None,
    n_planes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """INCREMENTAL insert into an nn_descent graph — the maintenance
    op a served ANN index needs (the FreshDiskANN-style insert path;
    the graph counterpart of update_ivf_index): new vectors join an
    existing k-NN graph WITHOUT a full O(n·k²) rebuild. Returns the
    updated graph over old ∪ new ids, same (vec_id, nbr_id, rank,
    cos_sim) contract and the same width `k` — pass the graph's BUILD
    width (nn_descent's k_build, e.g. 2·k_serve), not the serve
    width, so later searches keep their detour margin.

    Per batch of B inserts against an n-node graph:
      1. graph_search finds each new vector's `beam` approximate
         neighbors among the EXISTING nodes (LSH entry points + greedy
         hops — O(B·beam·k) candidate rows, never touches all n);
      2. forward edges (new→found) and reverse edges (found→new) come
         from those pairs; new↔new candidates are batch LSH band mates
         plus pairs sharing a found neighbor (the NN-Descent
         neighbor-of-neighbor principle applied once, restricted to
         the batch);
      3. only AFFECTED old nodes — those receiving a reverse candidate
         — re-rank their edge lists (existing edges union candidates
         through one k-bounded window); every other node's edges pass
         through BIT-UNCHANGED via an anti-join, so the re-rank cost
         is O(B·beam·k), independent of n. That asymmetry is the whole
         point: at 100 TB the graph is petabyte-scale and a daily
         insert batch is not.

    Determinism matches nn_descent: hash-derived planes, exact-cosine
    scores rounded to 6 places, (−cos, nbr_id) ordering, id
    tie-breaks. Zero-norm and NULL vectors sit outside the similarity
    universe (the family contract). New ids must be disjoint from the
    graph's — colliding ids raise rather than silently merging edge
    lists. Measured on the embedding fixture (k=10, 10% batch into a
    90% graph): inserted-node recall vs brute force 0.975, where a
    full rebuild reads 1.0 — pinned at >=0.9 with the untouched-node
    bit-equality in tests/test_similarity.py."""
    if beam is None:
        beam = 2 * k
    _nonzero = lambda c: F.col(c).isNotNull() & F.exists(  # noqa: E731
        c, lambda x: x != 0
    )
    old_emb = embeddings.select("vec_id", "embedding").filter(
        _nonzero("embedding")
    )
    new_emb = new_vectors.select("vec_id", "embedding").filter(
        _nonzero("embedding")
    )
    # ONE pre-flight job (VERDICT r13 item 5 folded the former
    # limit(1).count() empty probe into the collision check): a left
    # join of the batch against the corpus ids yields the batch size
    # AND the collision count from the same scan — the join shuffle
    # over the corpus ids was the check's whole cost, so the fold
    # halves the eager driver round-trips a streaming caller pays
    # per micro-batch. (Corpus vec_ids are unique by the family
    # contract, so the left join cannot multiply batch rows.)
    stats = (
        new_emb.select("vec_id")
        .join(
            old_emb.select("vec_id").withColumn("_hit", F.lit(1)),
            "vec_id",
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_batch"),
            F.count("_hit").alias("n_collide"),
        )
        .first()
    )
    # an empty batch (or one that is all zero-norm/NULL) is identity:
    # a streaming caller sometimes delivers nothing, and the LSH
    # signature stage cannot infer a dim from zero rows anyway
    if stats["n_batch"] == 0:
        return graph.select("vec_id", "nbr_id", "rank", "cos_sim")
    if stats["n_collide"]:
        raise ValueError(
            f"nn_graph_insert: {stats['n_collide']} new vec_id(s) "
            "already exist in the graph's corpus — inserts must use "
            "fresh ids (re-inserting an id would silently merge two "
            "edge lists; delete-and-reinsert is not supported)"
        )

    # 1. approximate neighbors among EXISTING nodes, `beam` wide.
    # checkpoint stays True deliberately: A/B-measured at sf0.1
    # (25-row batch, 1950-node k=20 graph, warmed, 3 runs each rep)
    # the barrier-free path is SLOWER (5.5-5.9 s vs 5.2-5.5 s) — the
    # twin-frontier recompute exceeds the per-hop barrier cost even
    # at the smallest realistic maintenance batch (VERDICT r13 item 5
    # evaluated; see graph_search's docstring).
    found = graph_search(
        graph, old_emb, new_emb,
        k=beam, hops=hops, beam=beam,
        n_planes=n_planes, n_bands=n_bands,
    ).select(
        F.col("query_id").alias("new_id"),
        F.col("neighbor_id").alias("old_id"),
        "cos_sim",
    ).localCheckpoint(eager=True)

    # 2a. forward (new -> old) and reverse (old -> new): same pair,
    # same rounded score
    fwd = found.select(
        F.col("new_id").alias("vec_id"),
        F.col("old_id").alias("nbr_id"),
        "cos_sim",
    )
    rev = found.select(
        F.col("old_id").alias("vec_id"),
        F.col("new_id").alias("nbr_id"),
        "cos_sim",
    )

    # 2b. new <-> new: batch band mates + pairs sharing a found old
    # neighbor (scored exactly; both routes may surface a pair — the
    # dedup keeps one copy, scores are identical by construction)
    mates = hyperplane_lsh_pairs(new_emb, n_planes, n_bands)
    shared = (
        found.select(F.col("new_id").alias("vec_a"), "old_id")
        .join(
            found.select(F.col("new_id").alias("vec_b"), "old_id"),
            "old_id",
        )
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
    )
    nn_pairs = mates.select("vec_a", "vec_b").union(shared).distinct()
    a = new_emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = new_emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    nn_scored = (
        nn_pairs.join(a, "vec_a")
        .join(b, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_v(F.col("ea"), F.col("eb")), 6).alias("cos_sim"),
        )
    )
    nn_both = nn_scored.select(
        F.col("vec_a").alias("vec_id"), F.col("vec_b").alias("nbr_id"), "cos_sim"
    ).union(
        nn_scored.select(
            F.col("vec_b").alias("vec_id"),
            F.col("vec_a").alias("nbr_id"),
            "cos_sim",
        )
    )

    # 3. re-rank ONLY nodes with at least one candidate edge; everyone
    # else passes through bit-unchanged
    cand = fwd.union(rev).union(nn_both).dropDuplicates(["vec_id", "nbr_id"])
    # bounded by construction: candidate vec_ids are the batch plus at
    # most batch·beam reverse targets, so the affected set broadcasts
    # regardless of graph size (the tombstone analogue in
    # nn_graph_delete stays AQE-decided — a deleted hub can inflate
    # ITS affected set to the hub's whole in-neighborhood)
    affected = F.broadcast(cand.select("vec_id").distinct())
    existing_aff = graph.select("vec_id", "nbr_id", "cos_sim").join(
        affected, "vec_id", "left_semi"
    )
    # a candidate may duplicate an existing edge (a band mate the
    # graph already holds): existing wins the dedup so old scores
    # stay bit-identical. Dedup against the AFFECTED slice, not the
    # full graph — equivalent (a candidate's vec_id is affected or
    # new, and new ids hold no edges) and batch-bounded, where an
    # anti-join against the whole graph would shuffle a
    # petabyte-scale edge table for a tiny insert batch.
    merged = existing_aff.unionByName(
        cand.join(
            existing_aff.select("vec_id", "nbr_id"),
            ["vec_id", "nbr_id"],
            "left_anti",
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("nbr_id").asc()
    )
    reranked = (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "nbr_id", "rank", "cos_sim")
    )
    untouched = graph.select("vec_id", "nbr_id", "rank", "cos_sim").join(
        affected, "vec_id", "left_anti"
    )
    return untouched.unionByName(reranked)


def nn_graph_delete(
    graph: DataFrame,
    embeddings: DataFrame,
    delete_ids: DataFrame,
    k: int = 10,
) -> DataFrame:
    """INCREMENTAL delete from an nn_descent graph — nn_graph_insert's
    counterpart, completing the maintenance pair a served graph index
    needs (the FreshDiskANN delete-with-repair shape): deleted nodes
    leave, and every node that pointed AT one repairs its edge list by
    considering the deleted node's own (surviving) neighbors — the
    NN-Descent neighbor-of-my-neighbor principle applied once, in
    reverse. `delete_ids` is any frame with a vec_id column; deleting
    an id the graph never held is a no-op (idempotent), so replaying a
    tombstone stream is safe.

    Per batch of D deletes: dropping out-edges is a partition-local
    anti-join; AFFECTED nodes (those with an in-edge to a deleted id)
    gain candidate edges deleted_node→its_survivors scored by exact
    cosine — O(in_degree(D)·k) candidate rows — and re-rank through
    ONE k-bounded window; every node touching no deleted id passes
    through BIT-UNCHANGED via an anti-join. Cost is O(D·k²)
    candidates regardless of graph size, the same asymmetry as the
    insert path.

    Determinism matches the family: rounded exact cosine, (−cos,
    nbr_id) ordering, id tie-breaks. A repaired node can end with
    fewer than k edges when the graph region is sparse (the paper
    behavior — repair proposes, the window disposes); ranks stay
    contiguous from 1. Pinned in tests/test_similarity.py: no deleted
    id survives anywhere, untouched nodes bit-equal, idempotent
    no-op, determinism."""
    # the tombstone batch is bounded by construction (it is the
    # DELETE REQUEST, not derived state): broadcast it so every
    # drop/semi/anti against the petabyte-scale edge table is a
    # map-side probe, never a shuffle of the graph
    dels = F.broadcast(delete_ids.select("vec_id").distinct())
    dels_n = dels.select(F.col("vec_id").alias("nbr_id"))

    # edges leaving a deleted node, kept aside as repair material
    del_out = graph.join(dels, "vec_id", "left_semi").select(
        F.col("vec_id").alias("gone"),
        F.col("nbr_id").alias("repair_nbr"),
    )
    # the graph minus deleted nodes' own lists
    kept = graph.join(dels, "vec_id", "left_anti")
    # nodes that must repair: they had an edge to a deleted id
    affected = (
        kept.join(dels_n, "nbr_id", "left_semi")
        .select("vec_id")
        .distinct()
    )
    # surviving edges of affected nodes (deleted targets dropped)
    surviving = (
        kept.join(affected, "vec_id", "left_semi")
        .join(dels_n, "nbr_id", "left_anti")
        .select("vec_id", "nbr_id", "cos_sim")
    )
    # repair candidates: for each lost edge a→d, d's own surviving
    # neighbors become a's candidates (self and already-deleted
    # targets excluded), scored exactly
    lost = kept.join(affected, "vec_id", "left_semi").join(
        dels_n, "nbr_id", "left_semi"
    ).select("vec_id", F.col("nbr_id").alias("gone"))
    cand_ids = (
        lost.join(del_out, "gone")
        .select("vec_id", F.col("repair_nbr").alias("nbr_id"))
        .filter(F.col("vec_id") != F.col("nbr_id"))
        .join(dels_n, "nbr_id", "left_anti")
        .distinct()
        # a candidate the node already holds needs no rescoring (and
        # must not duplicate): existing edges win
        .join(surviving.select("vec_id", "nbr_id"), ["vec_id", "nbr_id"], "left_anti")
    )
    ea = embeddings.select(
        F.col("vec_id"), F.col("embedding").alias("_ea")
    )
    eb = embeddings.select(
        F.col("vec_id").alias("nbr_id"), F.col("embedding").alias("_eb")
    )
    cand = (
        cand_ids.join(ea, "vec_id")
        .join(eb, "nbr_id")
        .select(
            "vec_id",
            "nbr_id",
            F.round(cosine_v(F.col("_ea"), F.col("_eb")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("nbr_id").asc()
    )
    repaired = (
        surviving.unionByName(cand)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "nbr_id", "rank", "cos_sim")
    )
    untouched = kept.join(affected, "vec_id", "left_anti").select(
        "vec_id", "nbr_id", "rank", "cos_sim"
    )
    return untouched.unionByName(repaired)


def pq_codes(
    embeddings: DataFrame, dim: int = 64, m: int = 4, k: int = 4
) -> DataFrame:
    """Product-quantization encoding (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011) — the
    memory side of IVF-PQ: each vector is cut into `m` subspaces and
    each subvector replaced by the id of its nearest codebook entry,
    compressing dim×float64 down to m codes. The codebook here is the
    deterministic stand-in (subvectors of the k lowest-id embeddings)
    with the IDENTICAL execution shape a k-means-trained codebook
    drops into: an m·k-row broadcast, per-row folded subspace
    distances, ONE groupBy(vec_id) computing all m argmins as parallel
    struct-min aggregates. Shuffle rows = N·k with k fixed — linear at
    any corpus size. Rounded distances + code tie-break keep the
    argmin engine-independent (the kmeans contract). Returns
    (vec_id, code_0..code_{m-1}, qerr) with qerr the summed
    subspace quantization error."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    # guard: a dim mismatch would silently slice short subvectors into
    # wrong distances — probe the actual width once (one bounded
    # first() job, the hyperplane_signatures precedent) and fail loud
    row = embeddings.select(F.size("embedding").alias("d")).first()
    if row is not None and row["d"] != dim:
        raise ValueError(
            f"pq_codes: expected dim={dim}, embeddings carry {row['d']}"
        )
    cb = (
        embeddings.orderBy("vec_id")
        .limit(k)
        .select(
            (
                F.row_number().over(Window.orderBy("vec_id")) - 1
            ).alias("code"),
            _cast_double(F.col("embedding")).alias("cv"),
        )
    )
    v = _cast_double(F.col("embedding"))
    dists = [
        F.round(
            F.aggregate(
                F.zip_with(
                    F.slice(v, j * sub + 1, sub),
                    F.slice(F.col("cv"), j * sub + 1, sub),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias(f"d{j}")
        for j in range(m)
    ]
    scored = embeddings.join(F.broadcast(cb)).select("vec_id", "code", *dists)
    mins = [
        F.min(F.struct(F.col(f"d{j}"), F.col("code"))).alias(f"m{j}")
        for j in range(m)
    ]
    agg = scored.groupBy("vec_id").agg(*mins)
    return agg.select(
        "vec_id",
        *[F.col(f"m{j}.code").alias(f"code_{j}") for j in range(m)],
        F.round(
            sum(F.col(f"m{j}.d{j}") for j in range(m)), 6
        ).alias("qerr"),
    )


def pq_adc_topk(
    embeddings: DataFrame,
    dim: int = 64,
    m: int = 4,
    k_cb: int = 4,
    k: int = 5,
    n_queries: int = 5,
) -> DataFrame:
    """Asymmetric Distance Computation over PQ codes (Jégou et al.
    2011 §IV) — the search half of IVF-PQ: approximate top-k where the
    DATABASE side is only its m codes; the full query vector meets the
    codebook once in a per-query lookup table of m·k_cb subspace
    distances, and each candidate's distance is m table lookups summed.

    Shapes: the lookup table is Q·m·k_cb rows (tiny, broadcast); codes
    unpivot to N·m rows, join the broadcast table, ONE groupBy
    (query, vec) sums the lookups, per-query top-k lands as
    WindowGroupLimit. Linear in N for fixed Q — and the scan never
    touches the raw vectors, which is the point: at 100 TB the float
    embeddings stay cold while search runs on the 32× smaller codes.
    Returns (query_id, vec_id, rank, adc_dist); ties break by vec_id,
    the query row itself is excluded."""
    sub = dim // m
    codes = pq_codes(embeddings, dim, m, k_cb)
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        _cast_double(F.col("embedding")).alias("qv"),
    )
    cb = (
        embeddings.orderBy("vec_id")
        .limit(k_cb)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("code"),
            _cast_double(F.col("embedding")).alias("cv"),
        )
    )
    lut = q.crossJoin(cb).select(
        "query_id",
        "code",
        *[
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.slice(F.col("qv"), j * sub + 1, sub),
                        F.slice(F.col("cv"), j * sub + 1, sub),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias(f"d{j}")
            for j in range(m)
        ],
    )
    unpiv = codes.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.col(f"code_{j}") for j in range(m)])
        ).alias("j", "code"),
    )
    joined = unpiv.join(F.broadcast(lut), "code").select(
        "query_id",
        "vec_id",
        # pick subspace j's distance column for this row's j
        F.element_at(
            F.array(*[F.col(f"d{jj}") for jj in range(m)]), F.col("j") + 1
        ).alias("d"),
    )
    summed = (
        joined.filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        summed.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "rank", "adc_dist")
    )


def ivf_candidates(
    embeddings: DataFrame,
    n_queries: int = 10,
    n_centroids: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """The IVF candidate set both search paths prune to: DISTINCT
    (query_id, vec_id) where vec_id's cell is one of query_id's
    n_probe nearest centroids (query row excluded). ONE scoring pass
    computes the centroid ranking for assignment (crank == 1, all
    vectors) and probing (crank <= n_probe, query vectors) — filtering
    by vec_id commutes with the vec_id-partitioned row_number, so the
    set is exactly what the per-path builders derive independently.

    Exists for compositions that run SEVERAL searches over the same
    probe decisions (ann_recall_eval: exact-rerank + two PQ variants):
    measured r15, Catalyst reuses NONE of the separately-built IVF
    subtrees (0 ReusedExchange in the committed r14 plan — the paths
    prune different columns, so the canonical subtrees differ), so the
    composition paid the centroid scoring 6x. Pin this once
    (localCheckpoint) and pass it as `cand=`."""
    cent = _ivf_centroids(embeddings, n_centroids)
    scored = embeddings.crossJoin(F.broadcast(cent)).withColumn(
        "csim", F.round(cosine_v(F.col("embedding"), F.col("cent_emb")), 6)
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("cent_id").asc()
    )
    ranked = scored.withColumn("crank", F.row_number().over(w))
    assign = ranked.filter(F.col("crank") == 1).select("vec_id", "cent_id")
    probes = ranked.filter(
        (F.col("vec_id") < n_queries) & (F.col("crank") <= n_probe)
    ).select(F.col("vec_id").alias("query_id"), "cent_id")
    return (
        probes.join(assign, "cent_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    dim: int = 64,
    m: int = 4,
    k_cb: int = 4,
    k: int = 5,
    n_queries: int = 10,
    n_centroids: int = 10,
    n_probe: int = 3,
    cand: DataFrame | None = None,
) -> DataFrame:
    """FULL IVF-PQ (Jégou et al. 2011) — the composition both halves
    exist for: the IVF coarse quantizer prunes the candidate set to
    the n_probe nearest cells (touching n_probe/n_centroids of the
    corpus) and ADC scores those candidates from their PQ codes alone
    (never re-reading the raw vectors). This is the memory-AND-compute
    shape billion-vector search actually deploys: cold float vectors,
    hot m-byte codes, per-query work ∝ probed-cell population × m
    lookups. Deterministic centroids and codebook keep every decision
    oracle-replayable. Returns (query_id, neighbor_id, rank,
    adc_dist) — rank by ascending quantized distance, vec_id
    tie-break, query row excluded."""
    sub = dim // m
    if cand is None:
        cand = ivf_candidates(embeddings, n_queries, n_centroids, n_probe)
    codes = pq_codes(embeddings, dim, m, k_cb)
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        _cast_double(F.col("embedding")).alias("qv"),
    )
    cb = (
        embeddings.orderBy("vec_id")
        .limit(k_cb)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("code"),
            _cast_double(F.col("embedding")).alias("cv"),
        )
    )
    lut = q.crossJoin(cb).select(
        "query_id",
        "code",
        *[
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.slice(F.col("qv"), j * sub + 1, sub),
                        F.slice(F.col("cv"), j * sub + 1, sub),
                        lambda x, y: (x - y) * (x - y),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias(f"d{j}")
            for j in range(m)
        ],
    )
    unpiv = codes.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.col(f"code_{j}") for j in range(m)])
        ).alias("j", "code"),
    )
    # candidate-restricted: only probed-cell members reach the lookup
    joined = (
        cand.join(unpiv, "vec_id")
        .join(F.broadcast(lut), ["query_id", "code"])
        .select(
            "query_id",
            "vec_id",
            F.element_at(
                F.array(*[F.col(f"d{jj}") for jj in range(m)]), F.col("j") + 1
            ).alias("d"),
        )
    )
    summed = joined.groupBy("query_id", "vec_id").agg(
        F.round(F.sum("d"), 6).alias("adc_dist")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        summed.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            "adc_dist",
        )
    )


def _ivf_centroids(embeddings: DataFrame, n_centroids: int, step: int = 50) -> DataFrame:
    """Deterministic centroids: every `step`-th vec_id, bounded — never
    a bare limit on an unordered scan, so any engine replays the choice."""
    return embeddings.filter(
        (F.col("vec_id") % step == 0) & (F.col("vec_id") < step * n_centroids)
    ).select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_emb"))


def _ivf_assign(embeddings: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest centroid per vector (rounded sim, centroid-id tie-break):
    broadcast-join narrow stage + per-vector top-1 window."""
    scored = embeddings.crossJoin(F.broadcast(cent)).withColumn(
        "csim", F.round(cosine_v(F.col("embedding"), F.col("cent_emb")), 6)
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cent_id").asc())
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .select("vec_id", "embedding", "cent_id")
    )


def auto_ivf_params(n_rows: int) -> int:
    """Centroid count ≈ √N (the standard IVF sizing): centroid
    assignment costs N·√N dots and each probed cell holds ≈ √N rows, so
    BOTH the coarse search and the fine search grow with the square
    root of the corpus instead of one of them growing linearly. A fixed
    cell count (the naive setup) keeps the coarse search constant but
    lets every cell — and the probed fraction's scan cost — grow
    linearly with N."""
    import math

    return max(4, math.ceil(math.sqrt(max(1, n_rows))))


def build_ivf_index(
    embeddings: DataFrame, path: str, n_centroids: int | None = 10
) -> None:
    """Persist an IVF index: `<path>/cells` holds every vector
    partitioned BY ITS CELL (partitionBy(cent_id)), `<path>/centroids`
    the centroid vectors. Searching then reads only the probed cells'
    FILES — IVF's "touch n_probe/n_centroids of the data" realized as
    parquet partition pruning, the property that matters at 100 TB
    (the unprobed 70%+ of the corpus is never opened, not merely
    filtered after a full scan).

    n_centroids=None sizes the index as √N via auto_ivf_params — the
    configuration whose coarse and fine search both grow with √corpus;
    the oracle-compared query pins 10 for deterministic replay."""
    if n_centroids is None:
        n = embeddings.count()
        n_centroids = auto_ivf_params(n)
        # spread the deterministic centroid picks across the id range
        # (the fixed default step=50 would run past max vec_id once
        # n_centroids > N/50 and silently under-fill the codebook)
        cent = _ivf_centroids(embeddings, n_centroids, step=max(1, n // n_centroids))
    else:
        cent = _ivf_centroids(embeddings, n_centroids)
    cent.write.mode("overwrite").parquet(path + "/centroids")
    _ivf_assign(embeddings, cent).write.mode("overwrite").partitionBy(
        "cent_id"
    ).parquet(path + "/cells")


def update_ivf_index(new_embeddings: DataFrame, path: str) -> None:
    """Append an ingest batch to a persisted IVF index: assign each new
    vector to its nearest EXISTING centroid and append into that cell's
    partition dir. Cost ∝ |batch|·k dots + one partitioned append — the
    corpus is never re-read (the IVF twin of
    dedup_index.update_minhash_index). Centroids stay fixed; after
    heavy drift (cells ballooning past the √N balance), rebuild with
    build_ivf_index — the standard IVF maintenance tradeoff."""
    spark = new_embeddings.sparkSession
    cent = spark.read.parquet(path + "/centroids")
    _ivf_assign(new_embeddings, cent).write.mode("append").partitionBy(
        "cent_id"
    ).parquet(path + "/cells")


def ivf_topk_indexed(
    spark,
    queries: DataFrame,
    index_path: str,
    k: int = 5,
    n_probe: int = 3,
    max_probe_collect: int = 100_000,
) -> DataFrame:
    """Search a persisted IVF index: probe the n_probe nearest cells
    per query, then exact top-k inside probed cells only.

    The probed cell-id set (n_queries × n_probe ids — planning
    metadata, not data) is collected and inlined as a LITERAL
    partition predicate, so the cells scan shows
    `PartitionFilters: [cent_id IN (...)]` and unprobed directories
    are never listed. Output (query_id, neighbor_id, rank, cos_sim) —
    identical to ivf_topk_cosine on the same parameters.

    The collect is bounded: what reaches the driver is the DISTINCT
    probed cent_ids, which can never exceed the codebook size — so the
    guard is on n_centroids vs `max_probe_collect` (default 100k — a
    few MB of ints), independent of how many queries are in the batch.
    Beyond that the literal-predicate trick stops being planning
    metadata; use a `probes.join(cells, "cent_id")` plan without the
    partition-pruning inline (same results, full cell listing)."""
    cent = spark.read.parquet(index_path + "/centroids")
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    qscored = q.crossJoin(F.broadcast(cent)).withColumn(
        "csim", F.round(cosine_v(F.col("q_emb"), F.col("cent_emb")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("cent_id").asc()
    )
    probes = (
        qscored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "q_emb", "cent_id")
    )
    n_cells = cent.count()
    if n_cells > max_probe_collect:
        raise ValueError(
            f"ivf_topk_indexed: codebook has {n_cells} centroids, "
            f"exceeding max_probe_collect ({max_probe_collect}); the "
            "driver collect is of distinct probed cent_ids (bounded by "
            "the codebook) — probe via a cent_id join without the "
            "inlined partition predicate instead"
        )
    probed_cells = sorted({r["cent_id"] for r in probes.select("cent_id").distinct().collect()})
    cells = spark.read.parquet(index_path + "/cells").filter(
        F.col("cent_id").isin(probed_cells)
    )
    cands = probes.join(cells, "cent_id").filter(F.col("query_id") != F.col("vec_id"))
    sim = F.round(cosine_v(F.col("q_emb"), F.col("embedding")), 6)
    ranked = cands.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cos_sim")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        ranked.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def ivf_topk_cosine(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    n_centroids: int = 10,
    n_probe: int = 3,
    cand: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: deterministic centroids (every (N//n_centroids)-th
    vector), assign each vector to its nearest centroid, queries probe
    the `n_probe` nearest cells, exact top-k within probed cells.

    At scale: centroid assignment is a broadcast-join narrow stage;
    search touches n_probe/n_centroids of the data — the pruning is the
    point. Output (query_id, neighbor_id, rank, cos_sim).

    Centroid choice is fully deterministic (every `step`-th vec_id,
    bounded, never a bare limit on an unordered scan) so the DuckDB
    oracle can replay the probe decisions exactly."""
    sim = F.round(cosine_v(F.col("q_emb"), F.col("embedding")), 6)
    if cand is not None:
        # precomputed candidate set (a pinned ivf_candidates): attach
        # the query vectors (broadcast — n_queries rows) and the
        # neighbor vectors, score exactly as below. cand is already
        # DISTINCT (query_id, vec_id), so no dedup is needed; each
        # (query, vector) pair exists at most once either way because a
        # vector belongs to exactly one cell.
        q = embeddings.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
        )
        ranked = (
            cand.join(embeddings.select("vec_id", "embedding"), "vec_id")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                sim.alias("cos_sim"),
            )
        )
    else:
        cent = _ivf_centroids(embeddings, n_centroids)
        scored = embeddings.crossJoin(F.broadcast(cent)).withColumn(
            "csim", F.round(cosine_v(F.col("embedding"), F.col("cent_emb")), 6)
        )
        w = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cent_id").asc())
        assign = _ivf_assign(embeddings, cent)
        # queries probe n_probe nearest centroids
        probes = (
            scored.filter(F.col("vec_id") < n_queries)
            .withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n_probe)
            .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"), "cent_id")
        )
        cands = probes.join(assign, "cent_id").filter(
            F.col("query_id") != F.col("vec_id")
        )
        ranked = cands.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("cos_sim")
        ).dropDuplicates(["query_id", "neighbor_id"])
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        ranked.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
