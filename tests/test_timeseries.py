"""Time-series similarity over the events log: integer-exact series
building (DuckDB bit-exact), the z-norm/SAX float contract, and the
SAX-bucketed Pearson top-k against its brute-force oracle."""

import duckdb
import pyspark.sql.functions as F

from warp_pipe_spark.datapipe.timeseries import (
    activity_series,
    sax_words,
    ts_topk_similar,
    znorm_series,
)
from warp_pipe_spark.io import read_table

SF = "/root/testdata/sf0.001"


def _events(spark):
    return read_table(spark, SF, "events")


def test_activity_series_matches_duckdb_bit_for_bit(spark):
    """The binning is exact integer arithmetic in epoch micros — the
    DuckDB replica (// floor division) reproduces every (entity, bin)
    count and the zero-filled fixed-length layout."""
    N = 32
    got = {
        r["entity"]: r["series"]
        for r in activity_series(_events(spark), n_bins=N).collect()
    }
    rows = duckdb.sql(f"""
    WITH ev AS (
      SELECT user_id AS entity, epoch_us(ts) AS t
      FROM read_parquet('{SF}/events.parquet')
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    span AS (SELECT min(t) AS t0, max(t) AS t1 FROM ev),
    b AS (
      SELECT entity,
             CAST(((t - t0) * {N}) // (t1 - t0 + 1) AS BIGINT) AS bin,
             count(*) AS c
      FROM ev, span GROUP BY entity, bin
    )
    SELECT entity, bin, c FROM b
    """).fetchall()
    want: dict = {}
    for e, b, c in rows:
        want.setdefault(e, [0] * N)[b] = c
    assert got == want
    assert all(len(s) == N for s in got.values())


def test_activity_series_value_sum(spark):
    """value_col switches the measure from count to an exact LONG sum
    per bin (totals match a plain groupBy sum)."""
    ev = _events(spark).withColumn("v", (F.col("event_id") % 5).cast("long"))
    out = activity_series(ev, n_bins=8, value_col="v").collect()
    got_tot = {
        r["entity"]: sum(r["series"]) for r in out
    }
    want_tot = {
        r["user_id"]: r["s"]
        for r in ev.filter(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        )
        .groupBy("user_id")
        .agg(F.sum("v").alias("s"))
        .collect()
    }
    assert got_tot == want_tot


def test_znorm_and_sax_contract(spark):
    """Hand fixture: a flat series z-norms to all zeros (no NaN); a
    known up-down pattern yields the expected SAX word; non-divisible
    segments raise instead of silently ragging the last segment."""
    import pytest

    s = spark.createDataFrame(
        [
            (1, [0, 0, 0, 0, 10, 10, 10, 10]),  # step up: low then high
            (2, [5, 5, 5, 5, 5, 5, 5, 5]),      # flat
        ],
        "entity LONG, series array<long>",
    )
    z = {r["entity"]: r["zseries"] for r in znorm_series(s).collect()}
    assert z[2] == [0.0] * 8
    assert all(x < 0 for x in z[1][:4]) and all(x > 0 for x in z[1][4:])

    w = {
        r["entity"]: r["word"]
        for r in sax_words(znorm_series(s), segments=4).collect()
    }
    # step series: two low segments (-1.0 < -0.6745 -> 'a'), two high
    assert w[1] == "aadd"
    assert w[2] == "cccc"  # zeros fall in [0, 0.6745) -> 'c'

    with pytest.raises(ValueError, match="not divisible"):
        sax_words(znorm_series(s), segments=3)


def test_ts_topk_brute_finds_planted_twins(spark):
    """Plant two users with identical event times and one
    anti-correlated user: the twins must be each other's rank-1 with
    corr 1.0; the anti-correlated user must score negatively against
    them; reruns are identical."""
    rows = []
    base = 1_700_000_000_000_000  # epoch micros
    hour = 3_600_000_000
    eid = 0
    for u, hours in (
        (1, [0, 1, 2, 3, 4, 5, 6, 7]),
        (2, [0, 1, 2, 3, 4, 5, 6, 7]),        # twin of 1
        (3, [24, 25, 26, 27, 28, 29, 30, 31]),  # active only late
    ):
        for h in hours:
            for _ in (0, 1):
                rows.append((eid, u, (base + h * hour) // 1000))
                eid += 1
    ev = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ms LONG"
    ).select(
        "event_id",
        "user_id",
        F.timestamp_millis(F.col("ms")).alias("ts"),
    )
    top = ts_topk_similar(ev, k=2, n_bins=32, brute=True)
    got = {
        (r["entity"], r["rank"]): (r["neighbor"], r["corr"])
        for r in top.collect()
    }
    assert got[(1, 1)] == (2, 1.0)
    assert got[(2, 1)] == (1, 1.0)
    assert got[(1, 2)][0] == 3 and got[(1, 2)][1] < 0
    again = {
        (r["entity"], r["rank"]): (r["neighbor"], r["corr"])
        for r in ts_topk_similar(ev, k=2, n_bins=32, brute=True).collect()
    }
    assert again == got


def test_sax_candidates_recall_vs_brute(spark):
    """SAX buckets must recover planted structure: three behavioral
    archetypes (morning / evening / uniform), five users each — every
    user's brute-force rank-1 twin shares its archetype, and the
    SAX-bucketed path finds the SAME rank-1 with the SAME exact score
    (recall 1.0 on structured series; precision is 1 by construction
    since every candidate is exact-scored). On pure-noise series SAX
    honestly buckets nothing — structure is the candidate signal,
    exactly like shingle-rarity for near-dup."""
    rows = []
    base = 1_700_000_000_000_000
    hour = 3_600_000_000
    eid = 0
    # 32 hours of activity; archetypes concentrate mass differently
    arch_hours = {
        0: list(range(0, 8)) * 3,          # morning-heavy
        1: list(range(24, 32)) * 3,        # evening-heavy
        2: list(range(0, 32, 2)),          # uniform spread
    }
    for u in range(15):
        arch = u % 3
        for i, h in enumerate(arch_hours[arch]):
            # small per-user jitter WITHIN the hour keeps users
            # distinct without moving mass across bins
            rows.append((eid, u, (base + h * hour + (u * 7 + i) * 1_000_000) // 1000))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ms LONG"
    ).select(
        "event_id", "user_id",
        F.timestamp_millis(F.col("ms")).alias("ts"),
    )

    brute = {
        r["entity"]: (r["neighbor"], r["corr"])
        for r in ts_topk_similar(ev, k=1, n_bins=32, brute=True).collect()
        if r["rank"] == 1
    }
    sax = {
        r["entity"]: (r["neighbor"], r["corr"])
        for r in ts_topk_similar(ev, k=1, n_bins=32).collect()
        if r["rank"] == 1
    }
    assert len(brute) == 15
    # every brute rank-1 twin shares the archetype
    assert all(n % 3 == e % 3 for e, (n, _) in brute.items())
    # SAX finds the identical rank-1 (same neighbor, same exact score)
    assert sax == brute

    # pure-noise fixture: the real sf0.001 events are uniform random
    # per user — SAX words are all distinct and the candidate set is
    # EMPTY (no fabricated pairs on unstructured data)
    noise = ts_topk_similar(_events(spark), k=1)
    assert noise.count() == 0
