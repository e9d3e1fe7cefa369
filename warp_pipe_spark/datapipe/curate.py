"""End-to-end corpus curation: one composed, deterministic pass from a
raw documents table to WebDataset training shards — the operable form
of the published pre-training recipe (C4/CCNet scrub → benchmark
decontamination → Gopher + classifier gate → mixture/budget selection →
packaging) that examples/corpus_curation_v2_demo.py walks through
stage by stage.

Every stage is DataFrame-declared and per-doc deterministic (hash
thresholds, integer micro-fractions, id tie-breaks), so a rerun on the
same corpus reproduces identical membership and byte-identical shards
— the verifiability contract write_webdataset's manifest hashes pin.

Scale shape: stages compose as joins on doc_id, so Catalyst sees ONE
plan per output action; the only corpus-sized shuffles are the ones
the underlying operators already pay (dedup banding, line-hash counts,
gopher's word agg). The optional stats counts are each one extra
corpus-linear job — skip them (collect_stats=False) on a 100 TB run
where the manifest is the audit artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_survivors(
    docs: DataFrame, max_bucket: int = 1000, keep_best: bool = False
) -> DataFrame:
    """Exact + near-duplicate resolution, returning the SURVIVING
    full document rows: exact-dup group representatives
    (dedup.exact_dedup) minus near-dup cluster non-representatives
    (MinHash-LSH pairs → star-contraction clusters). This is the
    corpus-clean CLI core, factored out so corpus-curate composes the
    identical semantics.

    keep_best elects the highest classifier-scored doc per near-dup
    cluster instead of the min doc_id. The argmax is taken over
    exact-dedup KEEPERS only: exact duplicates score identically, so
    an unrestricted argmax can elect a non-keeper copy that the
    keepers semi-join then deletes — wiping the whole cluster. Ties
    among distinct keepers break to the MIN doc_id (matching
    exact_dedup's representative choice) via max(struct(score, -id)).
    """
    from warp_pipe_spark.datapipe.dedup import (
        connected_components_star,
        exact_dedup,
        minhash_lsh_pairs,
    )

    keepers = exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    pairs = minhash_lsh_pairs(docs, max_bucket=max_bucket)
    clusters = connected_components_star(pairs)
    if keep_best:
        from warp_pipe_spark.datapipe.text import quality_model_score

        scores = quality_model_score(docs).select("doc_id", "score_sum")
        j = clusters.join(keepers, "doc_id", "left_semi").join(
            scores, "doc_id"
        )
        best = F.max(
            F.struct(
                F.col("score_sum").alias("s"),
                (-F.col("doc_id")).alias("nd"),
            )
        )
        kept_per_cluster = j.groupBy("cluster_id").agg(
            (-best["nd"]).alias("doc_id")
        )
        drop = clusters.join(
            kept_per_cluster.select("doc_id"), "doc_id", "left_anti"
        ).select("doc_id")
    else:
        drop = clusters.filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select("doc_id")
    return docs.join(keepers, "doc_id", "left_semi").join(
        drop, "doc_id", "left_anti"
    )


def curate_corpus(
    docs: DataFrame,
    out_dir: str,
    *,
    max_bucket: int = 1000,
    keep_best: bool = False,
    bloom_index: str | None = None,
    min_line_docs: int = 0,
    span_ngrams: int = 0,
    benchmark: DataFrame | None = None,
    dsir_target: DataFrame | None = None,
    dsir_keep: int | None = None,
    alpha: float | None = None,
    group_col: str = "source",
    budget: int | None = None,
    n_shards: int = 8,
    collect_stats: bool = True,
):
    """Raw documents → curated WebDataset shards, one call.

    Stages (each optional stage is OFF unless its knob is set, so the
    default run is dedup → gate → shard):
      0. cross-snapshot exact-key gate    (bloom.bloom_gate_packed
                                           against a previous
                                           snapshot's persisted bloom
                                           index; `bloom_index`
                                           enables)
      1. exact + near dedup               (dedup_survivors)
      2. cross-corpus line scrub          (text.dedup_lines,
                                           min_line_docs >= 2 enables)
      2b. ExactSubstr span removal        (text.scrub_dup_spans at
                                           span_ngrams tokens;
                                           span_ngrams >= 2 enables)
      3. benchmark decontamination        (dedup.decontaminate, 13-gram;
                                           `benchmark` frame enables)
      4. quality gate + PII scrub         (ingest.quality_gate →
                                           text.pii_scrub on survivors)
      5. temperature mixture rebalance    (sampling.temperature_mix;
                                           `alpha` enables, needs
                                           group_col)
      6. token-budget selection           (sampling.select_token_budget
                                           over decile-quantized quality
                                           scores; `budget` enables)
      7. deterministic tar shards         (shards.write_webdataset)

    Returns (manifest_rows, stats): the collected shard manifest
    (shard, n_docs, n_bytes, sha256) and a stage-by-stage count dict
    ({} when collect_stats=False — each count is one corpus pass).
    """
    from warp_pipe_spark.datapipe.ingest import quality_gate
    from warp_pipe_spark.datapipe.shards import write_webdataset
    from warp_pipe_spark.datapipe.text import pii_scrub

    stats: dict[str, int] = {}

    def _n(key: str, df: DataFrame) -> None:
        if collect_stats:
            stats[key] = df.count()

    cur = docs.filter(F.col("text").isNotNull())
    _n("n_input", cur)

    # 0. cross-snapshot exact-key gate: drop docs whose doc_id the
    # previous snapshot's bloom filter already holds, BEFORE paying
    # any downstream stage — the incremental-crawl economy (the 100 TB
    # prior snapshot rides in as an m_bits/8-byte bitmap, zero
    # shuffles on this corpus). The index is a write_bloom directory:
    # m_bits/k_hashes travel with it, never re-supplied (a mismatch
    # silently false-negatives). False positives drop novel docs at
    # the textbook rate — size m_bits at build time for the fp budget;
    # a quarantine-instead-of-drop policy is bloom_gate_verified, for
    # callers that keep the prior key set reachable.
    if bloom_index is not None:
        from warp_pipe_spark.datapipe.bloom import (
            bloom_gate_packed,
            read_bloom,
        )

        words, m_bits, k_hashes = read_bloom(cur.sparkSession, bloom_index)
        cur = (
            bloom_gate_packed(
                cur,
                words,
                key_col="doc_id",
                m_bits=m_bits,
                k_hashes=k_hashes,
            )
            .filter(~F.col("maybe_member"))
            .drop("maybe_member")
        )
        _n("n_after_bloom_gate", cur)

    # 1. exact + near dedup
    cur = dedup_survivors(cur, max_bucket=max_bucket, keep_best=keep_best)
    _n("n_after_dedup", cur)

    # 2. boilerplate line scrub (replaces text, never drops docs)
    if min_line_docs >= 2:
        from warp_pipe_spark.datapipe.text import dedup_lines

        scrubbed = dedup_lines(cur, min_docs=min_line_docs).select(
            "doc_id", "text"
        )
        cur = cur.drop("text").join(scrubbed, "doc_id")
        if collect_stats:
            stats["n_nonempty_after_linescrub"] = cur.filter(
                F.length("text") > 0
            ).count()

    # 2b. ExactSubstr repeated-span removal (rewrites text in place;
    # the paper's ordering: substring dedup before quality gating so
    # boilerplate spans don't drag good documents under the gate)
    if span_ngrams >= 2:
        from warp_pipe_spark.datapipe.text import scrub_dup_spans

        scrubbed = scrub_dup_spans(cur, n=span_ngrams).select(
            "doc_id", "text"
        )
        cur = cur.drop("text").join(scrubbed, "doc_id")
        if collect_stats:
            stats["n_nonempty_after_spanscrub"] = cur.filter(
                F.length("text") > 0
            ).count()

    # 3. benchmark decontamination
    if benchmark is not None:
        from warp_pipe_spark.datapipe.dedup import decontaminate

        cur, flagged = decontaminate(cur, benchmark, n=13)
        _n("n_decontaminated", flagged)

    # 4. Gopher + classifier gate, PII scrub on the survivors
    gate = quality_gate(cur)
    cur = pii_scrub(
        cur.join(gate.filter("keep").select("doc_id"), "doc_id", "left_semi")
    )
    _n("n_after_gate", cur)

    # 4b. DSIR target-likeness selection: keep dsir_keep docs drawn
    # ∝ importance weight against the target sample's hashed-ngram
    # distribution. AFTER the gate (score clean text, not boilerplate),
    # BEFORE the mixture/budget stages (select the target-like pool
    # first, then balance and trim it).
    if dsir_target is not None:
        if dsir_keep is None:
            raise ValueError(
                "dsir_target needs dsir_keep (how many docs to draw)"
            )
        from warp_pipe_spark.datapipe.sampling import dsir_select

        picked = dsir_select(cur, dsir_target, k=dsir_keep).select("doc_id")
        cur = cur.join(picked, "doc_id", "left_semi")
        _n("n_after_dsir", cur)

    # 5. temperature mixture rebalancing (needs a token weight)
    if alpha is not None:
        from warp_pipe_spark.datapipe.sampling import temperature_mix
        from warp_pipe_spark.datapipe.text import _tokens

        if group_col not in cur.columns:
            raise ValueError(
                f"temperature_mix needs group column {group_col!r}; "
                f"available: {cur.columns}"
            )
        weighted = cur.withColumn("n_tokens", F.size(_tokens(F.col("text"))))
        cur = temperature_mix(
            weighted, alpha=alpha, group_col=group_col
        ).drop("n_tokens", "rate_micro")
        _n("n_after_mix", cur)

    # 6. token-budget selection over decile-quantized quality scores
    if budget is not None:
        from warp_pipe_spark.datapipe.sampling import select_token_budget
        from warp_pipe_spark.datapipe.text import quality_scores

        scored = quality_scores(cur).select(
            "doc_id",
            (F.col("quality_score") * 10).cast("long").alias("score"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
        picked = (
            select_token_budget(scored, budget=budget)
            .filter("keep")
            .select("doc_id")
        )
        cur = cur.join(picked, "doc_id", "left_semi")
        _n("n_selected", cur)

    # 7. deterministic shards + manifest
    manifest = sorted(
        write_webdataset(
            cur.select("doc_id", "text"), out_dir, n_shards=n_shards
        ).collect(),
        key=lambda r: r["shard"],
    )
    if collect_stats:
        stats["n_sharded"] = sum(r["n_docs"] for r in manifest)
        stats["n_shards"] = len(manifest)
    return manifest, stats
