"""A5/A6 sequence-sync execution: discovery parsing, statement
emission from applied state, mock-JDBC execution order — pinned to the
reference's demo fixture schema (scripts/sql/create_fixture_schema.sql:
users.id SERIAL, pets.id SERIAL; axon_schema.go:99-221)."""

import pytest

from warp_pipe_spark.axon import Axon
from warp_pipe_spark.sequences import (
    column_sequences,
    column_sequences_query,
    column_setval_statements,
    orphan_sequence_names,
    orphan_sequences_query,
    orphan_setval_statements,
    parse_sequence_default,
    setval_statement,
)

# information_schema rows a Postgres source returns for the demo fixture
FIXTURE_DISCOVERY = [
    ("users", "id", "nextval('users_id_seq'::regclass)"),
    ("pets", "id", "nextval('pets_id_seq'::regclass)"),
]


class MockTarget:
    """Records statements like a JDBC cursor would execute them."""

    def __init__(self):
        self.executed = []

    def __call__(self, stmt):
        self.executed.append(stmt)


def test_parse_sequence_default():
    assert parse_sequence_default("nextval('users_id_seq'::regclass)") == "users_id_seq"
    assert parse_sequence_default("nextval('s1')") == "s1"
    assert parse_sequence_default("42") is None
    assert parse_sequence_default("now()") is None


def test_discovery_queries_match_reference_predicates():
    q = column_sequences_query()
    assert "column_default LIKE 'nextval(%'" in q
    assert "table_schema = 'public'" in q
    assert "information_schema.sequences" in orphan_sequences_query()


def test_column_sequences_and_orphans():
    seq_map = column_sequences(FIXTURE_DISCOVERY)
    assert seq_map == {
        ("users", "id"): "users_id_seq",
        ("pets", "id"): "pets_id_seq",
    }
    # a sequence not attached to any column is an orphan
    all_seqs = ["users_id_seq", "pets_id_seq", "audit_seq"]
    assert orphan_sequence_names(all_seqs, seq_map) == ["audit_seq"]


@pytest.fixture()
def fixture_state(spark):
    # applied final state for the demo fixture: 3 users, 2 pets
    rows = [
        ("users", 1),
        ("users", 2),
        ("users", 7),
        ("pets", 1),
        ("pets", 3),
    ]
    return spark.createDataFrame(rows, "table_name STRING, id LONG")


def test_column_setvals_are_one_agg_per_table(fixture_state):
    stmts = column_setval_statements(
        fixture_state, column_sequences(FIXTURE_DISCOVERY)
    )
    # exact statements, deterministic order (tables sorted)
    assert stmts == [
        "SELECT setval('pets_id_seq', 3, true)",
        "SELECT setval('users_id_seq', 7, true)",
    ]


def test_column_setvals_skip_absent_tables(spark):
    state = spark.createDataFrame([("users", 5)], "table_name STRING, id LONG")
    stmts = column_setval_statements(state, column_sequences(FIXTURE_DISCOVERY))
    assert stmts == ["SELECT setval('users_id_seq', 5, true)"]  # no pets rows → no stmt


def test_axon_sync_sequences_executes_against_mock_target(fixture_state):
    target = MockTarget()
    executed = Axon(fixture_state.sparkSession).sync_sequences(
        fixture_state,
        column_sequences(FIXTURE_DISCOVERY),
        target,
        orphan_last_values={"audit_seq": 991},  # A6: source last_value verbatim
    )
    want = [
        "SELECT setval('pets_id_seq', 3, true)",
        "SELECT setval('users_id_seq', 7, true)",
        "SELECT setval('audit_seq', 991, true)",
    ]
    assert executed == want
    assert target.executed == want  # actually ran, in order


def test_setval_statement_shape_matches_reference_call():
    # axon_schema.go:148-156: setval(seq, val, is_called=true)
    assert setval_statement("s", 9) == "SELECT setval('s', 9, true)"
    assert orphan_setval_statements({"b": 2, "a": 1}) == [
        "SELECT setval('a', 1, true)",
        "SELECT setval('b', 2, true)",
    ]


def test_column_setvals_skip_undiscovered_state_columns(spark):
    """A discovered serial column whose table never applied a changeset
    is absent from the wide state schema: the sync must skip it, not
    abort every other table's setval with UNRESOLVED_COLUMN. String
    state casts before max (lexicographic '9' > '10' would
    under-advance the sequence)."""
    from warp_pipe_spark.sequences import column_setval_statements

    state = spark.createDataFrame(
        [("users", "10"), ("users", "9")], "table_name STRING, id STRING"
    )
    seq_map = {
        ("users", "id"): "users_id_seq",
        ("orders", "order_num"): "orders_order_num_seq",  # absent column
    }
    stmts = column_setval_statements(state, seq_map)
    assert stmts == ["SELECT setval('users_id_seq', 10, true)"]
