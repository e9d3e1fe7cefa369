"""Time-series similarity over the events log: integer-exact series
building (DuckDB bit-exact), the z-norm/SAX float contract, and the
SAX-bucketed Pearson top-k against its brute-force oracle."""

import duckdb
import pytest
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


def _ts_oracle_sql(sf_dir: str, n_bins: int, segments: int, k: int) -> str:
    """Registration-grade DuckDB replica of ts_topk_similar (the r12+
    queue pattern — pre-validated here, spliced into oracle_sql() when
    a registry slot opens). Float contract: every fold is left-assoc
    in index order with an explicit 0.0 init (list_reduce over a
    0.0-prepended list ≡ Spark's F.aggregate), ONE sqrt per series,
    round(x, 6) on both engines; the series themselves are
    integer-exact. Precondition (pinned by the callers' params): no
    SAX bucket within max_bucket of the hot-bucket backstop, so
    drop_hot_buckets is a no-op and the plain word-equijoin replays
    bucket_pairs exactly."""
    n, s = n_bins, n_bins // segments
    assert s * segments == n_bins

    def fold(terms):
        return (
            "list_reduce([0.0, "
            + ", ".join(terms)
            + "], (acc, x) -> acc + x)"
        )

    var_terms = [
        f"(series[{i}] - mu) * (series[{i}] - mu)" for i in range(1, n + 1)
    ]
    z_items = ", ".join(
        f"round((series[{i}] - mu) / sd, 6)" for i in range(1, n + 1)
    )
    zeros = ", ".join("0.0" for _ in range(n))
    seg_means = ", ".join(
        fold([f"zs[{j * s + i}]" for i in range(1, s + 1)]) + f" / {float(s)} AS m{j}"
        for j in range(segments)
    )
    word = " || ".join(
        f"(CASE WHEN m{j} < -0.6745 THEN 'a' WHEN m{j} < 0.0 THEN 'b' "
        f"WHEN m{j} < 0.6745 THEN 'c' ELSE 'd' END)"
        for j in range(segments)
    )
    dot = fold([f"za[{i}] * zb[{i}]" for i in range(1, n + 1)])
    return f"""
    WITH ev AS (
      SELECT user_id AS entity, epoch_us(ts) AS t
      FROM read_parquet('{sf_dir}/events.parquet')
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    span AS (SELECT min(t) AS t0, max(t) AS t1 FROM ev),
    b AS (
      SELECT entity,
             CAST(((t - t0) * {n}) // (t1 - t0 + 1) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS c
      FROM ev, span GROUP BY entity, bin
    ),
    grid AS (
      SELECT e.entity, g.i
      FROM (SELECT DISTINCT entity FROM ev) e
      CROSS JOIN range({n}) g(i)
    ),
    ser AS (
      SELECT grid.entity, list(COALESCE(b.c, 0) ORDER BY grid.i) AS series
      FROM grid LEFT JOIN b ON b.entity = grid.entity AND b.bin = grid.i
      GROUP BY grid.entity
    ),
    m AS (
      SELECT entity, series,
             CAST(list_sum(series) AS BIGINT) / {float(n)} AS mu
      FROM ser
    ),
    v AS (
      SELECT entity, series, mu,
             sqrt({fold(var_terms)} / {float(n)}) AS sd
      FROM m
    ),
    z AS (
      SELECT entity,
             CASE WHEN sd = 0 THEN [{zeros}] ELSE [{z_items}] END AS zs
      FROM v
    ),
    sm AS (SELECT entity, zs, {seg_means} FROM z),
    w AS (SELECT entity, zs, {word} AS word FROM sm),
    cand AS (
      SELECT w1.entity AS ea, w1.zs AS za, w2.entity AS eb, w2.zs AS zb
      FROM w w1 JOIN w w2
        ON w1.word = w2.word AND w1.entity < w2.entity
    ),
    scored AS (
      SELECT ea, eb, round({dot} / {float(n)}, 6) AS corr FROM cand
    ),
    sym AS (
      SELECT ea, eb, corr FROM scored
      UNION ALL
      SELECT eb AS ea, ea AS eb, corr FROM scored
    ),
    ranked AS (
      SELECT ea, eb, corr,
             row_number() OVER (PARTITION BY ea
                                ORDER BY corr DESC, eb ASC) AS rnk
      FROM sym
    )
    SELECT ea AS entity, eb AS neighbor, CAST(rnk AS BIGINT) AS rank, corr
    FROM ranked WHERE rnk <= {k}
    """


def test_ts_topk_matches_duckdb_bit_for_bit(spark, sf_dir):
    """Pre-validation of the queued registration oracle: the full
    SAX-bucketed Pearson top-k — integer-exact series, 6 dp z-norm,
    PAA quantization, word-bucket candidates, exact left-assoc dot
    products, ties by neighbor — replays bit-for-bit in DuckDB on the
    real sf0.001 events, at BOTH the registration parameterization
    (segments=4) and the coarser segments=2."""
    for segments in (2, 4):
        got = sorted(
            (r["entity"], r["neighbor"], r["rank"], r["corr"])
            for r in ts_topk_similar(
                _events(spark), k=3, n_bins=32, segments=segments
            ).collect()
        )
        want = sorted(
            (e, nb, int(rk), c)
            for e, nb, rk, c in duckdb.sql(
                _ts_oracle_sql(SF, 32, segments, 3)
            ).fetchall()
        )
        assert len(got) > 0, f"segments={segments} yielded no candidates"
        assert got == want, f"segments={segments}"


@pytest.mark.soak
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
