"""MERGE-adapter state sink (VERDICT r2 item 7): the Delta/Iceberg
twin of ParquetStateSink, proven against the in-memory executor —
same KeysetPoller contract, same replay oracle, pinned MERGE text."""

import pytest

from warp_pipe_spark.apply import replay
from warp_pipe_spark.merge_sink import (
    InMemoryMergeExecutor,
    MergeStateSink,
    batch_winners,
    merge_statement,
)

SCHEMA = "id LONG, action STRING, table_name STRING, pk LONG, val STRING"

LOG = [
    (1, "INSERT", "users", 1, "a"),
    (2, "INSERT", "users", 2, "b"),
    (3, "INSERT", "pets", 1, "rex"),
    (4, "UPDATE", "users", 2, "b2"),
    (5, "DELETE", "users", 1, None),
    (6, "INSERT", "users", 3, "c"),
    (7, "UPDATE", "pets", 1, "rex2"),
]


def _state(sink):
    return {
        (r["table_name"], r["pk"], r["val"]) for r in sink.read_state().collect()
    }


def _oracle(spark, rows):
    return {
        (r["table_name"], r["pk"], r["val"])
        for r in replay(spark.createDataFrame(rows, SCHEMA), ["pk"]).collect()
    }


def test_merge_sink_converges_to_replay_oracle(spark):
    sink = MergeStateSink(spark, InMemoryMergeExecutor(spark), pk_cols=["pk"])
    sink.apply_batch(spark.createDataFrame(LOG[:3], SCHEMA), 0)
    sink.apply_batch(spark.createDataFrame(LOG[3:], SCHEMA), 1)
    assert _state(sink) == _oracle(spark, LOG)
    assert _state(sink) == {
        ("users", 2, "b2"),
        ("users", 3, "c"),
        ("pets", 1, "rex2"),
    }


def test_merge_sink_redelivery_is_noop(spark):
    # at-least-once transport: re-applying a batch must not change state
    sink = MergeStateSink(spark, InMemoryMergeExecutor(spark), pk_cols=["pk"])
    sink.apply_batch(spark.createDataFrame(LOG[:5], SCHEMA), 0)
    before = _state(sink)
    sink.apply_batch(spark.createDataFrame(LOG[:5], SCHEMA), 0)  # redelivered
    assert _state(sink) == before == _oracle(spark, LOG[:5])


def test_merge_sink_update_before_insert_upserts(spark):
    # axon_sql.go:92-103: an UPDATE for an absent pk inserts the row
    sink = MergeStateSink(spark, InMemoryMergeExecutor(spark), pk_cols=["pk"])
    sink.apply_batch(
        spark.createDataFrame([(10, "UPDATE", "users", 9, "ghost")], SCHEMA), 0
    )
    assert _state(sink) == {("users", 9, "ghost")}


def test_merge_sink_drives_keyset_poller(spark, tmp_path):
    # the same poller drain contract ParquetStateSink satisfies
    from warp_pipe_spark.streaming import KeysetPoller, parquet_keyset_fetch

    audit = str(tmp_path / "audit")
    spark.createDataFrame(LOG, SCHEMA).coalesce(1).write.parquet(audit)
    sink = MergeStateSink(spark, InMemoryMergeExecutor(spark), pk_cols=["pk"])
    poller = KeysetPoller(
        spark, parquet_keyset_fetch(audit), sink, str(tmp_path / "off.json"), limit=3
    )
    assert poller.run_until_drained() == len(LOG)
    assert _state(sink) == _oracle(spark, LOG)


def test_batch_winners_one_row_per_key_keeps_tombstones(spark):
    w = batch_winners(spark.createDataFrame(LOG, SCHEMA), ["pk"])
    rows = {((r["table_name"], r["pk"]), (r["id"], r["action"])) for r in w.collect()}
    # exactly one row per (table, pk); deletes kept as tombstones
    assert dict(rows) == {
        ("users", 1): (5, "DELETE"),
        ("users", 2): (4, "UPDATE"),
        ("users", 3): (6, "INSERT"),
        ("pets", 1): (7, "UPDATE"),
    }


def test_merge_statement_pinned():
    sql = merge_statement("users", "src", ["pk"], ["val"])
    assert sql == (
        "MERGE INTO users t\n"
        "USING src s\n"
        "  ON t.pk <=> s.pk\n"
        "WHEN MATCHED AND s.action IN ('delete', 'DELETE') AND s.id >= t.id"
        " THEN DELETE\n"
        "WHEN MATCHED AND s.id > t.id THEN UPDATE SET t.id = s.id, t.val = s.val\n"
        "WHEN NOT MATCHED AND (s.action IS NULL OR s.action"
        " NOT IN ('delete', 'DELETE')) THEN INSERT (pk, id, val)"
        " VALUES (s.pk, s.id, s.val)"
    )


def test_delta_executor_raises_cleanly_without_library(spark):
    from warp_pipe_spark.merge_sink import DeltaMergeExecutor

    try:
        import delta  # noqa: F401

        pytest.skip("delta-spark installed; constructor path not applicable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="delta-spark"):
        DeltaMergeExecutor(spark, lambda t: f"/tmp/{t}")


class _RecordingSqlSpark:
    """spark.sql recorder for pinning the sink-driven MERGE text."""

    def __init__(self):
        self.stmts = []
        self.dropped_views = []
        rec = self

        class _Catalog:
            def dropTempView(self, name):
                rec.dropped_views.append(name)

        self.catalog = _Catalog()

    def sql(self, stmt):
        self.stmts.append(stmt)


def test_sql_executor_excludes_routing_and_kind_columns(spark):
    # ADVICE r4: table_name must not leak into UPDATE SET / INSERT —
    # per-entity targets carry entity state (pk, id, payload) only
    from warp_pipe_spark.merge_sink import SqlMergeExecutor

    rec = _RecordingSqlSpark()
    sink = MergeStateSink(spark, SqlMergeExecutor(rec), pk_cols=["pk"])
    sink.apply_batch(spark.createDataFrame(LOG[:2], SCHEMA), 0)
    [stmt] = rec.stmts
    assert "MERGE INTO users t" in stmt
    assert "t.table_name" not in stmt and "s.table_name" not in stmt
    assert "t.action" not in stmt.split("WHEN MATCHED AND")[0]
    assert "UPDATE SET t.id = s.id, t.val = s.val" in stmt
    assert "INSERT (pk, id, val) VALUES (s.pk, s.id, s.val)" in stmt


class _FakeMergeBuilder:
    def __init__(self, calls):
        self.calls = calls

    def _rec(self, name, *args):
        self.calls.append((name, *args))
        return self

    def whenMatchedDelete(self, cond):
        return self._rec("whenMatchedDelete", cond)

    def whenMatchedUpdate(self, cond, set_):
        return self._rec("whenMatchedUpdate", cond, set_)

    def whenNotMatchedInsert(self, cond, values):
        return self._rec("whenNotMatchedInsert", cond, values)

    def execute(self):
        self.calls.append(("execute",))


class _FakeDeltaTable:
    calls = []

    @classmethod
    def forPath(cls, spark, path):
        cls.calls.append(("forPath", path))
        return cls()

    def alias(self, a):
        _FakeDeltaTable.calls.append(("alias", a))
        return self

    def merge(self, src, cond):
        _FakeDeltaTable.calls.append(("merge", cond))
        return _FakeMergeBuilder(_FakeDeltaTable.calls)


def test_delta_executor_builder_chain_recorded(spark, monkeypatch):
    """VERDICT r4 item 4: prove the DeltaMergeExecutor contract without
    delta-spark by faking delta.tables and recording the builder chain.
    The call sequence and condition strings must mirror the SQL path:
    id-guarded delete/update, kind-guarded insert, no routing/kind
    columns in the set/values maps."""
    import sys
    import types

    from warp_pipe_spark.merge_sink import DeltaMergeExecutor

    _FakeDeltaTable.calls = []
    fake_tables = types.ModuleType("delta.tables")
    fake_tables.DeltaTable = _FakeDeltaTable
    fake_delta = types.ModuleType("delta")
    fake_delta.tables = fake_tables
    monkeypatch.setitem(sys.modules, "delta", fake_delta)
    monkeypatch.setitem(sys.modules, "delta.tables", fake_tables)

    ex = DeltaMergeExecutor(spark, lambda t: f"/data/{t}")
    sink = MergeStateSink(spark, ex, pk_cols=["pk"])
    sink.apply_batch(spark.createDataFrame(LOG[:2], SCHEMA), 0)

    assert _FakeDeltaTable.calls == [
        ("forPath", "/data/users"),
        ("alias", "t"),
        ("merge", "t.pk <=> s.pk"),
        (
            "whenMatchedDelete",
            "s.action IN ('delete', 'DELETE') AND s.id >= t.id",
        ),
        ("whenMatchedUpdate", "s.id > t.id", {"id": "s.id", "val": "s.val"}),
        (
            "whenNotMatchedInsert",
            "s.action IS NULL OR s.action NOT IN ('delete', 'DELETE')",
            {"pk": "s.pk", "id": "s.id", "val": "s.val"},
        ),
        ("execute",),
    ]


class _RecordingEvolveSpark(_RecordingSqlSpark):
    """Recorder with a catalog: .table() serves the target's current
    columns so the executor can diff schemas."""

    def __init__(self, target_columns):
        super().__init__()
        self._cols = list(target_columns)

    def table(self, name):
        cols = self._cols

        class _T:
            columns = cols

        return _T()


def test_sql_executor_evolves_target_schema(spark):
    """A winners frame carrying a payload column the target lacks must
    emit ALTER TABLE ADD COLUMNS (typed from the winners schema)
    BEFORE the MERGE, and the MERGE must then write the column."""
    from warp_pipe_spark.merge_sink import SqlMergeExecutor

    rec = _RecordingEvolveSpark(["pk", "id", "val"])
    sink = MergeStateSink(
        spark, SqlMergeExecutor(rec, evolve_schema=True), pk_cols=["pk"]
    )
    evolved = spark.createDataFrame(
        [(1, "INSERT", "users", 1, "a", "e@x.com")], SCHEMA + ", email STRING"
    )
    sink.apply_batch(evolved, 0)
    alter, merge = rec.stmts
    assert alter == "ALTER TABLE users ADD COLUMNS (email string)"
    assert "t.email = s.email" in merge
    assert "INSERT (pk, id, val, email)" in merge


def test_sql_executor_no_alter_when_schema_matches(spark):
    from warp_pipe_spark.merge_sink import SqlMergeExecutor

    rec = _RecordingEvolveSpark(["pk", "id", "val"])
    sink = MergeStateSink(
        spark, SqlMergeExecutor(rec, evolve_schema=True), pk_cols=["pk"]
    )
    sink.apply_batch(spark.createDataFrame(LOG[:2], SCHEMA), 0)
    assert len(rec.stmts) == 1 and rec.stmts[0].startswith("MERGE INTO")


def test_sql_executor_default_does_not_touch_catalog(spark):
    # evolution is opt-in: the default path must never call .table()
    # (the plain _RecordingSqlSpark has no table() — an evolution probe
    # would AttributeError)
    from warp_pipe_spark.merge_sink import SqlMergeExecutor

    rec = _RecordingSqlSpark()
    sink = MergeStateSink(spark, SqlMergeExecutor(rec), pk_cols=["pk"])
    sink.apply_batch(spark.createDataFrame(LOG[:2], SCHEMA), 0)
    assert len(rec.stmts) == 1


def test_inmemory_executor_additive_schema_evolution(spark):
    """The test twin carries the same additive contract as the real
    executors: a later batch adding `email` evolves the state (old
    rows NULL); an UPDATE from the narrow old schema still applies."""
    sink = MergeStateSink(spark, InMemoryMergeExecutor(spark), pk_cols=["pk"])
    sink.apply_batch(spark.createDataFrame(LOG[:2], SCHEMA), 0)
    evolved = spark.createDataFrame(
        [
            (10, "INSERT", "users", 5, "e", "e@x.com"),
            (11, "UPDATE", "users", 2, "b9", "b@x.com"),
        ],
        SCHEMA + ", email STRING",
    )
    sink.apply_batch(evolved, 1)
    got = {
        (r["pk"], r["val"], r["email"]) for r in sink.read_state().collect()
    }
    assert got == {
        (1, "a", None),
        (2, "b9", "b@x.com"),
        (5, "e", "e@x.com"),
    }


def test_inmemory_executor_narrowing_update_preserves_target_cols(spark):
    """The narrowing direction of the additive contract: an UPDATE
    arriving from the OLD (narrow) schema must preserve the target
    row's values for columns the winners lack — MERGE's UPDATE SET
    only touches the source's value columns, so a null-fill here would
    diverge from SqlMergeExecutor."""
    sink = MergeStateSink(spark, InMemoryMergeExecutor(spark), pk_cols=["pk"])
    wide = spark.createDataFrame(
        [(10, "INSERT", "users", 5, "e", "e@x.com")],
        SCHEMA + ", email STRING",
    )
    sink.apply_batch(wide, 0)
    narrow = spark.createDataFrame(
        [(11, "UPDATE", "users", 5, "e2")], SCHEMA
    )
    sink.apply_batch(narrow, 1)
    got = {
        (r["pk"], r["val"], r["email"]) for r in sink.read_state().collect()
    }
    # val updated from the narrow source; email kept from the target,
    # NOT nulled
    assert got == {(5, "e2", "e@x.com")}


def test_delta_executor_evolve_sets_automerge_conf_scoped(spark, monkeypatch):
    """evolve_schema=True enables Delta's autoMerge conf ONLY for the
    duration of the merge: the session-global switch must be visible at
    execute() time and restored afterwards, so evolution never leaks
    into other Delta merges on the shared session (including executors
    constructed with evolve_schema=False)."""
    import sys
    import types

    from warp_pipe_spark.merge_sink import DeltaMergeExecutor

    key = "spark.databricks.delta.schema.autoMerge.enabled"
    seen_at_execute = []

    class _ConfProbeBuilder(_FakeMergeBuilder):
        def execute(self):
            seen_at_execute.append(spark.conf.get(key, None))
            super().execute()

    class _ConfProbeDeltaTable(_FakeDeltaTable):
        def merge(self, src, cond):
            _FakeDeltaTable.calls.append(("merge", cond))
            return _ConfProbeBuilder(_FakeDeltaTable.calls)

    _FakeDeltaTable.calls = []
    fake_tables = types.ModuleType("delta.tables")
    fake_tables.DeltaTable = _ConfProbeDeltaTable
    fake_delta = types.ModuleType("delta")
    fake_delta.tables = fake_tables
    monkeypatch.setitem(sys.modules, "delta", fake_delta)
    monkeypatch.setitem(sys.modules, "delta.tables", fake_tables)

    assert spark.conf.get(key, None) is None
    ex = DeltaMergeExecutor(spark, lambda t: f"/data/{t}", evolve_schema=True)
    sink = MergeStateSink(spark, ex, pk_cols=["pk"])
    sink.apply_batch(spark.createDataFrame(LOG[:2], SCHEMA), 0)
    assert seen_at_execute == ["true"]  # enabled while merging...
    assert spark.conf.get(key, None) is None  # ...and restored after

    # a pre-existing explicit value is restored, not clobbered
    spark.conf.set(key, "false")
    try:
        sink.apply_batch(spark.createDataFrame(LOG[:2], SCHEMA), 1)
        assert seen_at_execute[-1] == "true"
        assert spark.conf.get(key) == "false"
    finally:
        spark.conf.unset(key)


def test_null_kind_row_inserts_in_every_executor_path(spark):
    """A NULL-kind row is not provably a delete: replay keeps it, so
    the MERGE sinks must too — the SQL text, the Delta condition, and
    the in-memory twin all take the NULL-safe insert arm."""
    from warp_pipe_spark.merge_sink import merge_statement

    assert "IS NULL OR" in merge_statement("u", "s", ["pk"], ["val"])

    sink = MergeStateSink(spark, InMemoryMergeExecutor(spark), pk_cols=["pk"])
    rows = [(1, None, "users", 1, "ghost"), (2, "INSERT", "users", 2, "b")]
    sink.apply_batch(spark.createDataFrame(rows, SCHEMA), 0)
    got = {(r["pk"], r["val"]) for r in sink.read_state().collect()}
    assert got == {(1, "ghost"), (2, "b")}


def test_merge_statement_ansi_dialect():
    """The ansi dialect differs from spark in exactly one spot: the
    null-safe key equality spelling. Everything else is byte-equal."""
    import pytest as _pytest

    spark_sql = merge_statement("users", "src", ["pk"], ["val"])
    ansi_sql = merge_statement("users", "src", ["pk"], ["val"], dialect="ansi")
    assert "t.pk <=> s.pk" in spark_sql
    assert "t.pk IS NOT DISTINCT FROM s.pk" in ansi_sql
    # ansi also drops the alias prefix on UPDATE SET targets (PG 15
    # rejects 'SET t.id = ...'); spark keeps it
    assert "UPDATE SET t.id = s.id, t.val = s.val" in spark_sql
    assert "UPDATE SET id = s.id, val = s.val" in ansi_sql
    assert spark_sql.replace(
        "t.pk <=> s.pk", "t.pk IS NOT DISTINCT FROM s.pk"
    ).replace(
        "UPDATE SET t.id = s.id, t.val = s.val",
        "UPDATE SET id = s.id, val = s.val",
    ) == ansi_sql
    with _pytest.raises(ValueError):
        merge_statement("users", "src", ["pk"], ["val"], dialect="mysql")


# -- truncate changesets (VERDICT r10 item 3): never an upsert ------------

TRUNC_LOG = [
    (1, "insert", "users", 1, "a"),
    (2, "insert", "users", 2, "b"),
    (3, "insert", "pets", 1, "rex"),
    (4, "truncate", "users", None, None),
    (5, "insert", "users", 3, "c"),
]


def test_merge_sink_truncate_default_raises_never_upserts(spark):
    """on_truncate='error' (the default): a truncate in the batch fails
    loudly instead of folding into the MERGE as an upsert-shaped row."""
    sink = MergeStateSink(spark, InMemoryMergeExecutor(spark), pk_cols=["pk"])
    with pytest.raises(ValueError, match="truncate changeset"):
        sink.apply_batch(spark.createDataFrame(TRUNC_LOG, SCHEMA), 0)


def test_merge_sink_truncate_clear_applies_table_clear(spark):
    """on_truncate='clear': prior state for the table is cleared up to
    the truncate id; post-truncate rows and other tables survive; no
    truncate row ever lands in state."""
    sink = MergeStateSink(
        spark, InMemoryMergeExecutor(spark), pk_cols=["pk"],
        on_truncate="clear",
    )
    sink.apply_batch(spark.createDataFrame(TRUNC_LOG[:3], SCHEMA), 0)
    sink.apply_batch(spark.createDataFrame(TRUNC_LOG[3:], SCHEMA), 1)
    assert _state(sink) == {("pets", 1, "rex"), ("users", 3, "c")}


def test_merge_sink_truncate_clear_redelivery_noop(spark):
    """The clear is id-guarded: replaying the truncate batch must not
    delete rows merged after the truncate (exactly-once observable
    state, same contract as the MERGE conditions)."""
    sink = MergeStateSink(
        spark, InMemoryMergeExecutor(spark), pk_cols=["pk"],
        on_truncate="clear",
    )
    b = spark.createDataFrame(TRUNC_LOG, SCHEMA)
    sink.apply_batch(b, 0)
    before = _state(sink)
    sink.apply_batch(b, 0)  # redelivered
    assert _state(sink) == before == {("pets", 1, "rex"), ("users", 3, "c")}


def test_sql_executor_truncate_clear_emits_id_guarded_delete(spark):
    from warp_pipe_spark.merge_sink import SqlMergeExecutor

    rec = _RecordingSqlSpark()
    sink = MergeStateSink(
        spark, SqlMergeExecutor(rec), pk_cols=["pk"], on_truncate="clear"
    )
    sink.apply_batch(spark.createDataFrame(TRUNC_LOG, SCHEMA), 0)
    deletes = [s for s in rec.stmts if s.startswith("DELETE FROM")]
    assert deletes == ["DELETE FROM users WHERE id <= 4"]
    # the post-truncate insert still merges
    assert any("MERGE INTO users t" in s for s in rec.stmts)
    assert any("MERGE INTO pets t" in s for s in rec.stmts)


def test_on_truncate_unchecked_skips_the_scan(spark):
    """'unchecked' is the explicit opt-out for truncate-free sources:
    no per-batch truncate detection job runs (review finding — the
    scan cost bought nothing on audit/wal2json-v1 streams), and a
    truncate row reaching such a sink folds like any other unknown
    kind instead of raising."""
    from warp_pipe_spark.merge_sink import InMemoryMergeExecutor, MergeStateSink

    ex = InMemoryMergeExecutor(spark)
    sink = MergeStateSink(
        spark, ex, pk_cols=["pk"], on_truncate="unchecked"
    )
    batch = spark.createDataFrame(
        [
            (1, "INSERT", "t", 1, "a"),
            (2, "truncate", "t", None, None),
        ],
        "id LONG, action STRING, table_name STRING, pk LONG, val STRING",
    )
    sink.apply_batch(batch, 0)
    # the insert landed; the truncate neither raised nor cleared
    vals = [r["val"] for r in ex.tables["t"].collect() if r["val"]]
    assert vals == ["a"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unchecked"):
        MergeStateSink(spark, ex, pk_cols=["pk"], on_truncate="bogus")
