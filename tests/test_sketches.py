"""KMV distinct-count sketch, exact percentiles, and frame-sampling —
the round-1 additions to the analytics surface (driver queries
events_kmv_distinct / events_percentiles / multimodal_frame_sample)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from pyspark.sql import functions as F


def test_kmv_small_cardinality_is_exact(spark, sf_dir):
    # sf0.001 has fewer distinct users than k=64, so the sketch must
    # fall back to the exact count (textbook KMV small-N branch).
    row = entrymod.queries()["events_kmv_distinct"](spark, sf_dir).first()
    assert row.k_actual == row.exact_distinct
    assert row.est_distinct == row.exact_distinct
    assert row.kth_hash > 0


def test_kmv_estimates_when_saturated(spark, sf_dir):
    # Force saturation with k << N by replaying the same shape inline
    # at k=4: the estimate must be within a loose multiplicative band
    # of the exact count (KMV error ~ 1/sqrt(k); band is generous).
    from warp_pipe_spark.datapipe.text import h60
    from warp_pipe_spark.io import read_table

    ev = read_table(spark, sf_dir, "events")
    k = 4
    kmv = (
        ev.select(h60(F.col("user_id").cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    agg = kmv.agg(F.count("*").alias("k_actual"), F.max("h").alias("kth")).first()
    exact = ev.select("user_id").distinct().count()
    assert agg.k_actual == k
    est = (k - 1) * 2.0**60 / agg.kth
    assert exact / 6 <= est <= exact * 6


def test_percentiles_monotonic_and_bounded(spark, sf_dir):
    rows = entrymod.queries()["events_percentiles"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p50 <= r.p90 <= r.p99
        assert r.n > 0


def test_frame_sample_counts_match_duration(spark, sf_dir):
    # duration_ms = doc_id*40 + 1000 at 1s sampling → duration//1000 + 1
    # frames, first at 0, last at the greatest multiple <= duration.
    fs = entrymod.queries()["multimodal_frame_sample"](spark, sf_dir)
    g = fs.groupBy("media_id").agg(
        F.count("*").alias("n"), F.min("frame_ts_ms").alias("lo"), F.max("frame_ts_ms").alias("hi")
    )
    for r in g.collect():
        dur = r.media_id * 40 + 1000
        assert r.n == dur // 1000 + 1
        assert r.lo == 0
        assert r.hi == (dur // 1000) * 1000
    # only videos (doc_id % 3 == 2) expand
    ids = [r.media_id for r in fs.select("media_id").distinct().collect()]
    assert ids and all(i % 3 == 2 for i in ids)


def test_hll_registers_merge_by_max(spark, sf_dir):
    """The property that makes HLL the 100 TB cardinality sketch:
    registers of the union == pairwise max of per-split registers.
    Also sanity: estimate from registers lands within a loose band of
    the exact distinct count (p=6 → ~13% standard error; band x2)."""
    from warp_pipe_spark.datapipe.text import h60
    from warp_pipe_spark.io import read_table

    mask = (1 << 54) - 1

    def regs(df):
        h = df.select(h60(F.col("user_id").cast("string")).alias("h"))
        w = F.col("h").bitwiseAND(F.lit(mask))
        rho = F.when(w == 0, F.lit(55)).otherwise(
            F.lit(55) - F.length(F.expr(f"bin(h & {mask})"))
        )
        out = (
            h.select(
                F.shiftright("h", 54).cast("long").alias("bucket"),
                rho.cast("long").alias("rho"),
            )
            .groupBy("bucket")
            .agg(F.max("rho").alias("register"))
        )
        return {r["bucket"]: r["register"] for r in out.collect()}

    ev = read_table(spark, sf_dir, "events")
    a, b = ev.filter("event_id % 2 = 0"), ev.filter("event_id % 2 = 1")
    merged = {}
    for d in (regs(a), regs(b)):
        for k, v in d.items():
            merged[k] = max(merged.get(k, 0), v)
    assert merged == regs(ev)

    m = 64
    raw = (m * m) / sum(2.0 ** -merged.get(j, 0) for j in range(m)) * 0.709
    exact = ev.select("user_id").distinct().count()
    nz = sum(1 for v in merged.values() if v > 0)
    if nz < m:  # linear-counting small-range correction
        import math
        raw = m * math.log(m / (m - nz))
    assert 0.5 * exact <= raw <= 2.0 * exact, (raw, exact)


def test_cms_registers_merge_by_add_and_point_estimate(spark, sf_dir):
    """CMS invariants: split counters sum to the union's counters
    (merge-by-ADD), and the point estimate min_d(counter[d][h_d(x)])
    upper-bounds and here EQUALS the true count (5 distinct types over
    4x64 cells → no collisions expected; >= always holds)."""
    from warp_pipe_spark.io import read_table

    qs = entrymod.queries()

    def regs(pred):
        import __spark_entry__ as e
        from warp_pipe_spark.datapipe.text import h60

        ev = read_table(spark, sf_dir, "events").filter(pred).select("event_type")
        salted = ev.select(
            "event_type",
            F.explode(F.array(*[F.lit(d) for d in range(4)])).alias("d"),
        )
        col_j = F.pmod(
            h60(F.concat(F.col("d").cast("string"), F.lit("|"), F.col("event_type"))),
            F.lit(64),
        )
        out = (
            salted.select(F.col("d").alias("d"), col_j.alias("j"))
            .groupBy("d", "j")
            .agg(F.count("*").alias("counter"))
        )
        return {(r["d"], r["j"]): r["counter"] for r in out.collect()}

    whole = {(r["d"], r["j"]): r["counter"]
             for r in qs["events_cms_registers"](spark, sf_dir).collect()}
    merged = {}
    for part in (regs("event_id % 2 = 0"), regs("event_id % 2 = 1")):
        for k, v in part.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == whole

    # point estimate per event_type vs true counts
    from warp_pipe_spark.datapipe.text import h60 as _h60
    ev = read_table(spark, sf_dir, "events")
    true = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    import hashlib
    for et, n in true.items():
        est = min(
            whole.get((d, int(hashlib.md5(f"{d}|{et}".encode()).hexdigest()[:15], 16) % 64), 0)
            for d in range(4)
        )
        assert est >= n
        assert est == n  # no collisions at this cardinality
