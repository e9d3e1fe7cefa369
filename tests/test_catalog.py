"""Catalog metadata ops (S12, A4/G4, A5) on synthetic catalogs."""

from warp_pipe_spark.catalog import (
    generate_tables_list,
    primary_key_map,
    primary_keys,
    sequence_sync_values,
)


def _catalog(spark):
    rows = [
        ("public", "users"),
        ("public", "pets"),
        ("public", "internal_tmp"),
        ("audit", "changesets"),
    ]
    return spark.createDataFrame(rows, ["schema_name", "table_name"])


def test_generate_tables_list_include_exclude(spark):
    cat = _catalog(spark)
    out = generate_tables_list(cat, ["public"], exclude=["internal_tmp"])
    assert {r["table_name"] for r in out.collect()} == {"users", "pets"}
    only = generate_tables_list(cat, ["public"], include=["users"])
    assert {r["table_name"] for r in only.collect()} == {"users"}


def test_primary_keys_ordinal_order_and_composite(spark):
    rows = [
        ("lineitem", "l_linenumber", 2),
        ("lineitem", "l_orderkey", 1),
        ("users", "id", 1),
    ]
    cons = spark.createDataFrame(rows, ["table_name", "column_name", "ordinal_position"])
    pks = {r["table_name"]: list(r["pk_columns"]) for r in primary_keys(cons).collect()}
    assert pks["lineitem"] == ["l_orderkey", "l_linenumber"]  # ordinal order kept
    assert primary_key_map(cons)["users"] == ["id"]


def test_sequence_sync_values(spark):
    df = spark.createDataFrame([(1, 10), (5, 2)], ["id", "other"])
    assert sequence_sync_values(df, ["id"]) == {"id": 5}
    assert sequence_sync_values(df, []) == {}


def test_primary_keys_split_by_schema(spark):
    """Two schemas each holding `users` with DIFFERENT PKs must not
    merge into one bogus composite key."""
    from warp_pipe_spark.catalog import primary_keys

    rows = [
        ("public", "users", "id", 1),
        ("audit", "users", "audit_id", 1),
    ]
    df = spark.createDataFrame(
        rows,
        "table_schema STRING, table_name STRING, column_name STRING, "
        "ordinal_position LONG",
    )
    got = {
        (r["table_schema"], r["table_name"]): list(r["pk_columns"])
        for r in primary_keys(df).collect()
    }
    assert got == {
        ("public", "users"): ["id"],
        ("audit", "users"): ["audit_id"],
    }


def test_sequence_sync_values_casts_strings_and_drops_null(spark):
    """Map-form decoded state keeps values as strings: max('10','9')
    is '9' lexicographically — the sync must cast first. NULL maxes
    (no rows) drop out instead of becoming None entries, and columns
    absent from the frame are skipped, not an analysis error."""
    from warp_pipe_spark.catalog import sequence_sync_values

    df = spark.createDataFrame(
        [("10", None), ("9", None)], "id STRING, empty_col LONG"
    )
    got = sequence_sync_values(df, ["id", "empty_col", "missing_col"])
    assert got == {"id": 10}
