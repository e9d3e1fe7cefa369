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
