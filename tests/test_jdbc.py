"""JDBC adapter shapes (connection-free: no Postgres in container)."""

from warp_pipe_spark.jdbc import (
    audit_reader,
    keyset_query,
    primary_keys_query,
    setup_ddl,
    tables_list_query,
    teardown_ddl,
)


def test_keyset_query_is_offset_free():
    q = keyset_query("warp_pipe.changesets", 12345, limit=500)
    assert "OFFSET" not in q
    assert "id > 12345" in q and "ORDER BY id" in q and "LIMIT 500" in q


def test_audit_reader_partitioned(spark):
    reader = audit_reader(spark, "jdbc:postgresql://example/db", upper_id=1000, num_partitions=8)
    # configured, not connected
    assert reader is not None


def test_ddl_roundtrip_text():
    stmts = setup_ddl()
    assert any("CREATE TABLE" in s and "changesets" in s for s in stmts)
    assert sum("CREATE INDEX" in s for s in stmts) == 3
    assert "DROP SCHEMA" in teardown_ddl()[0]


def test_catalog_queries_mention_information_schema():
    assert "information_schema.tables" in tables_list_query(["public"])
    q = primary_keys_query(["public", "sales"])
    assert "PRIMARY KEY" in q and "'sales'" in q


def test_version_gate_matches_reference():
    """axon_schema.go:22-50: only 9.x with x<5 is rejected (ON CONFLICT
    support boundary)."""
    import pytest as _pytest

    from warp_pipe_spark.jdbc import check_target_version

    for ok in ("9.5", "9.6.24", "10.1", "11", "16.2"):
        check_target_version(ok)
    for bad in ("9.4", "9.4.26", "9.0"):
        with _pytest.raises(ValueError, match="Unsupported Version"):
            check_target_version(bad)


def test_pk_query_joins_on_table_name_too():
    """Constraint names are unique per TABLE, not per schema: without
    tc.table_name = kcu.table_name, table a's PRIMARY KEY row
    cross-matches a same-named constraint on table b and the PK map
    corrupts replay's fold key."""
    from warp_pipe_spark.jdbc import primary_keys_query

    q = primary_keys_query(["public"])
    assert "tc.table_name = kcu.table_name" in q
    assert "kcu.table_schema" in q  # schema surfaces for multi-schema PKs


def test_keyset_query_limit_zero_and_none():
    from warp_pipe_spark.jdbc import keyset_query

    assert keyset_query("t", 5, limit=0).endswith("LIMIT 0")
    assert "LIMIT" not in keyset_query("t", 5, limit=None)


def test_audit_reader_requires_upper_bound():
    """JDBC bounds are stride-only: a defaulted (lower, lower+1) range
    silently collapses the backfill to one task streaming the whole
    table — the exact failure the partitioned reader replaces."""
    import pytest as _pytest

    from warp_pipe_spark.jdbc import audit_reader

    with _pytest.raises(ValueError, match="upper_id"):
        audit_reader(None, "jdbc:postgresql://example/db")


def test_version_gate_prerelease_strings():
    from warp_pipe_spark.jdbc import check_target_version

    check_target_version("9.5beta1")  # 9.5 prerelease is supported
    check_target_version("10beta1")  # leading digit run parses
    import pytest as _pytest

    with _pytest.raises(ValueError, match="Unsupported"):
        check_target_version("9.4.26")
    with _pytest.raises(ValueError, match="unparseable"):
        check_target_version("devel")


def test_snapshot_jdbc_options_pin_the_parallel_bootstrap_recipe():
    """The 100 TB bootstrap shape: every JDBC partition attaches the
    SAME exported snapshot via sessionInitStatement (pg_dump --jobs
    mechanism), so N concurrent range scans observe exactly the slot's
    consistent point."""
    import pytest as _pytest

    from warp_pipe_spark.jdbc import snapshot_jdbc_options

    opts = snapshot_jdbc_options(
        "public.orders", "00000003-0000001B-1",
        partition_column="o_orderkey",
        lower_bound=1, upper_bound=6_000_000, num_partitions=64,
    )
    assert opts["dbtable"] == "public.orders"
    assert opts["sessionInitStatement"] == (
        "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ; "
        "SET TRANSACTION SNAPSHOT '00000003-0000001B-1'"
    )
    assert (opts["partitionColumn"], opts["lowerBound"],
            opts["upperBound"], opts["numPartitions"]) == (
        "o_orderkey", "1", "6000000", "64")
    # unpartitioned (single-connection) variant omits the range keys
    small = snapshot_jdbc_options("public.nation", "s1")
    assert "partitionColumn" not in small
    # half-specified ranges fail loudly (Spark would too, later+worse)
    with _pytest.raises(ValueError, match="requires"):
        snapshot_jdbc_options("t", "s", partition_column="id")


def test_slot_lag_query_pins_the_monitoring_sql():
    from warp_pipe_spark.jdbc import slot_lag_query

    q = slot_lag_query()
    assert "pg_replication_slots" in q and "WHERE" not in q
    assert "retained_wal_bytes" in q and "confirm_lag_bytes" in q
    one = slot_lag_query("wp_slot")
    assert "WHERE slot_name = 'wp_slot'" in one
