"""profile_table: the dataset-card generator — exact counts/min/max,
KMV distinct estimates, validation, and the DuckDB bit-for-bit
replica on real data."""

import duckdb
import pytest
from pyspark.sql import functions as F

from warp_pipe_spark.datapipe.profile import profile_table

SF = "/root/testdata/sf0.001"


def test_profile_hand_fixture(spark):
    """Small table, fully checkable by hand: counts, nulls, the exact
    micro-fraction, small-cardinality-exact distinct, typed min/max
    routing (numeric vs string), determinism."""
    df = spark.createDataFrame(
        [
            (1, "a", 2.5),
            (2, "b", -1.0),
            (3, None, None),
            (4, "a", 0.0),
        ],
        "id LONG, s STRING, x DOUBLE",
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"id", "s", "x"}
    for r in rows.values():
        assert r["n_rows"] == 4
    assert rows["id"]["n_null"] == 0 and rows["id"]["null_micro"] == 0
    assert rows["s"]["n_null"] == 1 and rows["s"]["null_micro"] == 250_000
    assert rows["x"]["n_null"] == 1
    # below-k cardinalities are exact
    assert rows["id"]["distinct_est"] == 4
    assert rows["s"]["distinct_est"] == 2
    assert rows["x"]["distinct_est"] == 3
    # typed min/max routing
    assert rows["id"]["min_num"] == 1.0 and rows["id"]["max_num"] == 4.0
    assert rows["x"]["min_num"] == -1.0 and rows["x"]["max_num"] == 2.5
    assert rows["id"]["min_str"] is None
    assert rows["s"]["min_str"] == "a" and rows["s"]["max_str"] == "b"
    assert rows["s"]["min_num"] is None

    again = {r["column"]: r for r in profile_table(df).collect()}
    assert again == rows


def test_profile_validation_and_edges(spark):
    df = spark.createDataFrame(
        [(1, [1, 2])], "id LONG, arr ARRAY<LONG>"
    )
    with pytest.raises(ValueError, match="no such column"):
        profile_table(df, columns=["nope"])
    with pytest.raises(ValueError, match="complex-typed"):
        profile_table(df, columns=["arr"])
    # default column set silently skips the complex column
    assert [r["column"] for r in profile_table(df).collect()] == ["id"]
    # empty table: zero rows, zero micro, zero distinct — no div crash
    empty = df.filter("id < 0")
    r = profile_table(empty, columns=["id"]).collect()[0]
    assert (r["n_rows"], r["n_null"], r["null_micro"], r["distinct_est"]) == (
        0, 0, 0, 0,
    )


def test_profile_kmv_estimate_tracks_truth(spark):
    """Above-k cardinalities: the KMV estimate must land within the
    textbook relative error (~1/sqrt(k-1) ≈ 12.6% at k=64; allow 3σ)
    of the true distinct count — deterministic, so this is a fixed
    number, not a flaky bound."""
    df = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("v").cast("long")
    )
    r = profile_table(df, columns=["v"]).collect()[0]
    assert abs(r["distinct_est"] - 1000) <= 0.38 * 1000


def test_profile_matches_duckdb_bit_for_bit(spark):
    """Queued-oracle pre-validation on the real documents table
    (doc_id, source, text): counts, micro-fractions, min/max, and the
    KMV branch must replay exactly — h60 via md5, floor((k-1)·2^60 /
    kth) double arithmetic, integer `div` micro."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    got = sorted(map(tuple, profile_table(docs, k=64).collect()))

    h60 = "('0x' || substr(md5(CAST({x} AS VARCHAR)), 1, 15))::BIGINT"

    def col_sql(c: str, numeric: bool) -> str:
        mn = (
            f"min({c}::DOUBLE) AS min_num, max({c}::DOUBLE) AS max_num, "
            "NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str"
            if numeric
            else "NULL::DOUBLE AS min_num, NULL::DOUBLE AS max_num, "
            f"min({c}) AS min_str, max({c}) AS max_str"
        )
        return f"""
    SELECT '{c}' AS column,
           count(*) AS n_rows,
           count(*) FILTER ({c} IS NULL) AS n_null,
           CAST((count(*) FILTER ({c} IS NULL)) * 1000000 // count(*) AS BIGINT)
             AS null_micro,
           (SELECT CASE WHEN count(*) < 64 THEN count(*)
                        ELSE CAST(floor(63 * power(2.0, 60) / max(h)) AS BIGINT)
                   END
            FROM (SELECT DISTINCT {h60.format(x=c)} AS h
                  FROM t WHERE {c} IS NOT NULL
                  ORDER BY h LIMIT 64)) AS distinct_est,
           {mn}
    FROM t"""

    sql = (
        f"WITH t AS (SELECT doc_id, source, text FROM "
        f"read_parquet('{SF}/documents.parquet'))\n"
        + "\nUNION ALL\n".join(
            [
                col_sql("doc_id", True),
                col_sql("source", False),
                col_sql("text", False),
            ]
        )
    )
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want
