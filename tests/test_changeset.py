"""Changeset model semantics — mirrors changeset.go:14-81 behaviors."""

from pyspark.sql import functions as F

from warp_pipe_spark.changeset import CHANGESET_SCHEMA, column_value, normalize_kind


def test_normalize_kind_lowercases_and_blanks_unknown(spark):
    # changeset.go:21-33: lenient lower-casing; unknown kinds → ""
    df = spark.createDataFrame(
        [("INSERT",), ("Update",), ("delete",), ("TRUNCATE",), ("",), (None,)],
        ["kind"],
    )
    out = [r["k"] for r in df.select(normalize_kind("kind").alias("k")).collect()]
    assert out == ["insert", "update", "delete", "", "", ""]


def test_column_value_first_match_and_missing(spark):
    # changeset.go:46-54: first match by name; missing → nil (NULL here)
    rows = [
        (
            1,
            [
                {"column": "id", "value": "7", "type": "integer"},
                {"column": "name", "value": "han", "type": "text"},
                {"column": "name", "value": "dup", "type": "text"},
            ],
        )
    ]
    df = spark.createDataFrame(rows, "id LONG, new_values ARRAY<STRUCT<column:STRING,value:STRING,type:STRING>>")
    got = df.select(
        column_value("new_values", "name").alias("name"),
        column_value("new_values", "nope").alias("nope"),
    ).collect()[0]
    assert got["name"] == "han"  # first match wins
    assert got["nope"] is None


def test_changeset_schema_shape():
    names = [f.name for f in CHANGESET_SCHEMA.fields]
    assert names == ["id", "kind", "schema", "table", "timestamp", "new_values", "old_values"]
