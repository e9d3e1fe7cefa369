"""Whitelist/ignore pattern grammar + precedence — warp_pipe.go:97-144,
config.go:29-31 (ignore wins)."""

import pytest

from warp_pipe_spark.filters import ignore_tables, whitelist_tables


@pytest.fixture()
def cs(spark):
    rows = [
        ("public", "users"),
        ("public", "pets"),
        ("audit", "users"),
        ("sales", "orders"),
    ]
    return spark.createDataFrame(rows, ["schema_name", "table_name"])


def _tables(df):
    return sorted((r[0], r[1]) for r in df.collect())


def test_schema_dot_table(cs):
    assert _tables(whitelist_tables(cs, ["public.users"])) == [("public", "users")]


def test_schema_dot_star(cs):
    assert _tables(whitelist_tables(cs, ["public.*"])) == [
        ("public", "pets"),
        ("public", "users"),
    ]


def test_bare_table_matches_any_schema(cs):
    assert _tables(whitelist_tables(cs, ["users"])) == [
        ("audit", "users"),
        ("public", "users"),
    ]


def test_ignore_wins_over_whitelist(cs):
    # stage order: whitelist then ignore (warp_pipe.go:95-144)
    out = ignore_tables(whitelist_tables(cs, ["public.*"]), ["pets"])
    assert _tables(out) == [("public", "users")]


def test_empty_patterns_are_noops(cs):
    assert _tables(whitelist_tables(cs, [])) == _tables(cs)
    assert _tables(ignore_tables(cs, [])) == _tables(cs)


def test_ignore_keeps_null_schema_rows(spark):
    """A NULL schema/table row MATCHES no pattern, so ignore must keep
    it: under three-valued logic ~(schema = 'x') is NULL for a NULL
    schema and a bare filter would silently drop the row — turning the
    drop-only-matches contract into drop-matches-and-malformed.
    Whitelist keeps its natural semantics (a NULL row fails to match
    and is excluded)."""
    rows = [
        ("public", "users"),
        (None, "users"),
        ("public", None),
    ]
    df = spark.createDataFrame(rows, "schema_name STRING, table_name STRING")
    kept = ignore_tables(df, ["audit.users"]).collect()
    assert sorted([(r[0], r[1]) for r in kept], key=str) == sorted(rows, key=str)
    # matching rows still drop, NULL rows still survive
    kept2 = {(r[0], r[1]) for r in ignore_tables(df, ["public.users"]).collect()}
    assert kept2 == {(None, "users"), ("public", None)}
    # whitelist: NULL rows do not match, hence excluded
    wl = {(r[0], r[1]) for r in whitelist_tables(df, ["public.users"]).collect()}
    assert wl == {("public", "users")}
