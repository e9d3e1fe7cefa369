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
