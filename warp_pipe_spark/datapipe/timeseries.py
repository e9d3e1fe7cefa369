"""Time-series similarity search over the events log — "which entities
behave alike" — re-expressed in the engine's candidate-pair idiom.

The classic pipeline (PAA/SAX lineage — Lin et al.'s symbolic
discretization, the candidate-then-verify structure the retrieved
EDBT'19 streaming-similarity paper uses; reference has no time-series
operators, so this is part of the driver-mandated analytics surface):

  1. `activity_series` — per-entity fixed-length activity vector:
     event counts (or a value sum) in n_bins equal time buckets over
     the log's span. Integer-exact, one shuffle.
  2. `znorm_series` — per-series z-normalization, rounded to 6 dp
     (Pearson correlation ≡ cosine on z-normed vectors; the module's
     single float step, same libm contract as text.unigram_logppl).
  3. `sax_words` — piecewise aggregate approximation to `segments`
     means, quantized at the standard normal breakpoints into a
     symbol word per entity. Equal words = candidate bucket.
  4. `ts_topk_similar` — exact Pearson top-k per entity: SAX-bucket
     candidate pairs (bucket_pairs: pairs emitted inside posting
     lists, one shuffle) scored exactly, k-bounded per entity by one
     window. brute=True scores ALL pairs instead (the recall oracle /
     small-n path, same pattern as dedup's *_auto twins).

Scale shape: the event log is touched ONCE (the bin groupBy); series
frames are |entities| rows with an n_bins array — every later stage is
entity-sized, never event-sized. The SAX bucket bounds the quadratic
verify exactly the way banded MinHash bounds near-dup pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def activity_series(
    events: DataFrame,
    n_bins: int = 32,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = None,
) -> DataFrame:
    """Per-entity activity vector: count of events (or exact sum of a
    LONG `value_col`) per time bin, n_bins equal buckets spanning
    [min(ts), max(ts)] of the whole log. Returns (entity, series
    array<long>) — integer-exact, so any engine replays it
    bit-for-bit.

    bin = (t − t0)·n_bins // (t1 − t0 + 1) in epoch MICROS — the +1
    keeps the max timestamp in the last bin with pure integer
    arithmetic (no clamp branch); micros · n_bins ≈ 3e14 sits far
    inside BIGINT. Shape: ONE shuffle keyed by (entity, bin), then a
    bounded groupBy(entity) assembles the fixed-length array via a
    bin→count map (collect_list bounded by n_bins per entity — the
    bounded-group contract that bans unbounded posting lists).
    Entities with NULL ids and rows with NULL ts are excluded; bins
    with no events read 0."""
    ev = events.filter(
        F.col(entity_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    span = ev.agg(
        F.min(F.unix_micros(F.col(ts_col))).alias("t0"),
        F.max(F.unix_micros(F.col(ts_col))).alias("t1"),
    )
    measure = (
        F.count(F.lit(1)).cast("long")
        if value_col is None
        else F.sum(F.col(value_col)).cast("long")
    )
    binned = (
        ev.crossJoin(F.broadcast(span))
        .select(
            F.col(entity_col).alias("entity"),
            F.unix_micros(F.col(ts_col)).alias("t"),
            "t0",
            "t1",
            *( [F.col(value_col)] if value_col else [] ),
        )
        # integer `div`, never `/`+cast: double division of the micro
        # product can round a boundary event into the wrong bin
        .withColumn(
            "bin", F.expr(f"((t - t0) * {n_bins}) div (t1 - t0 + 1)")
        )
        .groupBy("entity", "bin")
        .agg(measure.alias("c"))
    )
    idx = F.sequence(F.lit(0), F.lit(n_bins - 1))
    return (
        binned.groupBy("entity")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bin", "c"))
            ).alias("m")
        )
        .select(
            "entity",
            F.transform(
                idx,
                lambda i: F.coalesce(
                    F.col("m")[i.cast("long")], F.lit(0).cast("long")
                ),
            ).alias("series"),
        )
    )


def znorm_series(series: DataFrame) -> DataFrame:
    """z-normalize each entity's series: (x − mean)/std, rounded to
    6 dp (the engine's float-replay contract: one mean, one sqrt per
    SERIES, both IEEE-agreeing across engines at that margin). A
    zero-variance series (a flat entity) normalizes to all-zeros
    rather than NaN — flat entities correlate with nothing. Adds
    `zseries array<double>` to (entity, series)."""
    n = F.size("series")
    mean = F.aggregate(
        "series", F.lit(0).cast("long"), lambda a, x: a + x
    ) / n.cast("double")
    var = (
        F.aggregate(
            F.transform("series", lambda x: (x - mean) * (x - mean)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / n.cast("double")
    )
    std = F.sqrt(var)
    return series.select(
        "entity",
        "series",
        F.when(std == 0.0, F.transform("series", lambda x: F.lit(0.0)))
        .otherwise(
            F.transform(
                "series", lambda x: F.round((x - mean) / std, 6)
            )
        )
        .alias("zseries"),
    )


# standard normal breakpoints for a 4-symbol alphabet (Lin et al.'s
# SAX table): P(X < -0.6745) = P(-0.6745 < X < 0) = ... = 1/4
_SAX4 = (-0.6745, 0.0, 0.6745)


def sax_words(
    zseries: DataFrame, segments: int = 8
) -> DataFrame:
    """SAX word per entity: the z-normed series averages down to
    `segments` PAA means (series length must divide evenly — raise
    otherwise, a silent ragged last segment would desynchronize the
    two engines), each mean quantized at the fixed normal breakpoints
    into a/b/c/d. Equal words bucket similar shapes — the candidate
    generator, exactly LSH banding's role for near-dup. Adds `word`.
    """
    sym = "abcd"

    def seg_mean(s):
        # mean of one segment: aggregate over its slice
        return lambda i: F.aggregate(
            F.slice(F.col("zseries"), i * s + 1, s),
            F.lit(0.0),
            lambda a, x: a + x,
        ) / F.lit(float(s))

    def quantize(m):
        return (
            F.when(m < F.lit(_SAX4[0]), F.lit(sym[0]))
            .when(m < F.lit(_SAX4[1]), F.lit(sym[1]))
            .when(m < F.lit(_SAX4[2]), F.lit(sym[2]))
            .otherwise(F.lit(sym[3]))
        )

    first = zseries.select(F.size("zseries").alias("n")).first()
    if first is None:
        return zseries.withColumn("word", F.lit(None).cast("string"))
    n = first["n"]
    if n % segments != 0:
        raise ValueError(
            f"sax_words: series length {n} not divisible by "
            f"{segments} segments — pick n_bins a multiple of segments"
        )
    s = n // segments
    mk = seg_mean(s)
    return zseries.withColumn(
        "word",
        F.concat(*[quantize(mk(i)) for i in range(segments)]),
    )


def ts_topk_similar(
    events: DataFrame,
    k: int = 3,
    n_bins: int = 32,
    segments: int = 8,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    brute: bool = False,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Top-k most-similar entities by Pearson correlation of their
    activity series (= cosine of the z-normed vectors, scored exactly
    and rounded to 6 dp). Candidates: SAX-word buckets via
    bucket_pairs (pairs emitted inside each posting list — one
    shuffle, no self-equi-join; `max_bucket` is the hot-bucket
    backstop). brute=True scores every pair instead — the recall
    oracle and the honest small-n path; SAX recall vs brute is
    pinned in tests. Output (entity, neighbor, rank, corr),
    symmetric (both directions emitted), ties broken by neighbor id.
    """
    from warp_pipe_spark.datapipe.dedup import bucket_pairs

    # validate BEFORE the checkpoint below pays the full event-log
    # scan: sax_words' own divisibility check fires only after the
    # log has already been aggregated (r14 review finding)
    if not brute and n_bins % segments != 0:
        raise ValueError(
            f"ts_topk_similar: n_bins {n_bins} not divisible by "
            f"{segments} segments — pick n_bins a multiple of segments"
        )
    # the z-normed series frame is |entities| rows of an n_bins array
    # and feeds FOUR consumers (SAX words + both pair sides + the
    # brute cross) — without pinning, each consumer re-derives the
    # whole pipeline INCLUDING the event-log scan (measured: 16
    # parquet scans / 31 exchanges in the unpinned plan; 100 TB of log
    # re-read per consumer). localCheckpoint cuts the lineage to an
    # entity-sized leaf: the log is scanned once, ever.
    z = znorm_series(
        activity_series(events, n_bins, entity_col, ts_col)
    ).localCheckpoint(eager=True)
    if brute:
        a = z.select(F.col("entity").alias("ea"), F.col("zseries").alias("za"))
        b = z.select(F.col("entity").alias("eb"), F.col("zseries").alias("zb"))
        pairs = a.crossJoin(b).filter(F.col("ea") < F.col("eb"))
    else:
        w = sax_words(z, segments).select("entity", "word")
        cand = bucket_pairs(
            w, ["word"], "entity", "ea", "eb", max_bucket=max_bucket
        )
        a = z.select(F.col("entity").alias("ea"), F.col("zseries").alias("za"))
        b = z.select(F.col("entity").alias("eb"), F.col("zseries").alias("zb"))
        pairs = cand.join(a, "ea").join(b, "eb")
    n = F.size("za").cast("double")
    corr = F.round(
        F.aggregate(
            F.zip_with("za", "zb", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / n,
        6,
    )
    scored = pairs.select("ea", "eb", corr.alias("corr"))
    # mirror via one array-explode over the scored rows, NOT a
    # self-union (r15): the union's two branches re-executed the
    # candidate join + correlation subtree — there is no exchange
    # between them for ReuseExchange to dedup, so every pair paid the
    # scoring twice (the same defect nn_descent's mirror had). Row
    # multiset is identical: each scored (ea, eb) emits exactly the
    # two directed rows the union emitted.
    both = scored.select(
        F.explode(
            F.array(
                F.struct(F.col("ea"), F.col("eb")),
                F.struct(
                    F.col("eb").alias("ea"), F.col("ea").alias("eb")
                ),
            )
        ).alias("_d"),
        "corr",
    ).select("_d.ea", "_d.eb", "corr")
    wnd = Window.partitionBy("ea").orderBy(
        F.col("corr").desc(), F.col("eb").asc()
    )
    return (
        both.withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= k)
        .select(
            F.col("ea").alias("entity"),
            F.col("eb").alias("neighbor"),
            "rank",
            "corr",
        )
    )
