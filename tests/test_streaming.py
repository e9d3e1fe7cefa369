"""Structured Streaming capture → apply: drop-dir source, foreachBatch
merge sink, availableNow drain (A8), idempotent restart."""

import pytest

from warp_pipe_spark.apply import replay
from warp_pipe_spark.streaming import ParquetStateSink, apply_stream, changeset_stream

SCHEMA = "id LONG, action STRING, table_name STRING, pk LONG, val STRING"

BATCH1 = [
    (1, "INSERT", "users", 1, "a"),
    (2, "INSERT", "users", 2, "b"),
]
BATCH2 = [
    (3, "DELETE", "users", 1, "a"),
    (4, "UPDATE", "users", 2, "b2"),
    (5, "INSERT", "users", 3, "c"),
]


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    return (
        str(tmp_path / "drop"),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )


def _run(spark, drop, state, ckpt):
    from pyspark.sql import types as T

    schema = T.StructType.fromDDL(SCHEMA)
    stream = changeset_stream(spark, drop, schema=schema)
    sink = ParquetStateSink(spark, state, pk_cols=["pk"])
    q = apply_stream(stream, sink, ckpt, available_now=True)
    q.awaitTermination(120)
    return sink


def test_stream_apply_matches_batch_replay(spark, dirs):
    drop, state, ckpt = dirs
    _write(spark, BATCH1, drop)
    _write(spark, BATCH2, drop)
    sink = _run(spark, drop, state, ckpt)
    got = {(r["pk"], r["val"]) for r in sink.read_state().collect()}

    full = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    want = {(r["pk"], r["val"]) for r in replay(full, ["pk"]).collect()}
    assert got == want == {(2, "b2"), (3, "c")}


def test_incremental_restart_resumes_from_checkpoint(spark, dirs):
    drop, state, ckpt = dirs
    _write(spark, BATCH1, drop)
    sink = _run(spark, drop, state, ckpt)
    assert {r["pk"] for r in sink.read_state().collect()} == {1, 2}

    # new files arrive; restarting with the same checkpoint processes
    # ONLY the new batch (StartFrom semantics) and converges
    _write(spark, BATCH2, drop)
    sink = _run(spark, drop, state, ckpt)
    got = {(r["pk"], r["val"]) for r in sink.read_state().collect()}
    assert got == {(2, "b2"), (3, "c")}


def test_dedup_stream_drops_redeliveries(spark, tmp_path):
    """At-least-once redelivery (same changeset id in later files) is
    collapsed to one row inside the watermark horizon."""
    import datetime as dt

    from warp_pipe_spark.streaming import dedup_stream

    drop = str(tmp_path / "drop_dd")
    schema = "id LONG, ts TIMESTAMP, action STRING, pk LONG"
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows1 = [(1, t0, "INSERT", 1), (2, t0, "INSERT", 2)]
    # file 2 redelivers id=2 (restart replay) plus a new id=3
    rows2 = [(2, t0, "INSERT", 2), (3, t0, "UPDATE", 1)]
    for rows in (rows1, rows2):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(drop)

    from pyspark.sql import types as T

    stream = changeset_stream(spark, drop, schema=T.StructType.fromDDL(schema))
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.id for r in spark.sql("SELECT id FROM dedup_out").collect()}
    n = spark.sql("SELECT count(*) AS n FROM dedup_out").first().n
    assert got == {1, 2, 3}
    assert n == 3


# --- versioned-pointer sink guarantees --------------------------------


MULTI = [
    (1, "INSERT", "users", 1, "a"),
    (2, "INSERT", "pets", 1, "rex"),
    (3, "INSERT", "pets", 2, "ada"),
]
USERS_ONLY = [
    (4, "UPDATE", "users", 1, "a2"),
]


def _mk_sink(spark, tmp_path):
    return ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"])


def test_sink_untouched_tables_not_rewritten(spark, tmp_path):
    """Per-batch write cost is O(touched tables): a users-only batch
    must not rewrite (or even re-version) the pets state files."""
    import os

    sink = _mk_sink(spark, tmp_path)
    sink.apply_batch(spark.createDataFrame(MULTI, SCHEMA), batch_id=0)
    pets_rel = sink._read_pointer()["pets"]
    pets_dir = os.path.join(sink.state_dir, pets_rel)
    before = {f: os.path.getmtime(os.path.join(pets_dir, f)) for f in os.listdir(pets_dir)}

    sink.apply_batch(spark.createDataFrame(USERS_ONLY, SCHEMA), batch_id=1)

    assert sink._read_pointer()["pets"] == pets_rel  # same version dir
    after = {f: os.path.getmtime(os.path.join(pets_dir, f)) for f in os.listdir(pets_dir)}
    assert after == before  # bytes untouched
    assert sink._read_pointer()["users"].endswith("v_1")
    got = {(r["table_name"], r["pk"], r["val"]) for r in sink.read_state().collect()}
    assert got == {("users", 1, "a2"), ("pets", 1, "rex"), ("pets", 2, "ada")}


def test_sink_steady_batch_work_independent_of_backlog_width(spark, tmp_path):
    """O(touched) bound, the backlog-width axis (VERDICT r9 #7): the
    state dirs READ and the pointer entries REWRITTEN by a fixed narrow
    batch are identical before and after DOUBLING the number of
    committed (untouched) tables — steady micro-batch cost follows the
    touched set, not total state. tools/scale_probe.py --fanout
    measures the same invariant as wall clock at 16→32 tables; this
    pins the structural fact that makes the measurement hold."""
    sink = _mk_sink(spark, tmp_path)
    seed1 = [(i, "INSERT", f"t{i % 4}", i, "x") for i in range(8)]
    sink.apply_batch(spark.createDataFrame(seed1, SCHEMA), batch_id=0)

    reads: list[list[str]] = []
    orig_read = sink._read_tables

    def spy(rels, **kw):
        reads.append(sorted(rels))
        return orig_read(rels, **kw)

    sink._read_tables = spy

    def narrow(batch_id, id_base):
        batch = [
            (id_base, "UPDATE", "t0", 0, "u"),
            (id_base + 1, "UPDATE", "t1", 1, "u"),
        ]
        p0 = sink._read_pointer()
        reads.clear()
        sink.apply_batch(spark.createDataFrame(batch, SCHEMA), batch_id)
        p1 = sink._read_pointer()
        rewritten = {k for k in p1 if p1[k] != p0.get(k)}
        tables_read = {
            rel.split("/")[1] for call in reads for rel in call
        }
        return rewritten, tables_read

    rewritten_a, read_a = narrow(1, 100)

    # double the backlog: 4 more tables that the narrow batch never touches
    seed2 = [(200 + i, "INSERT", f"t{4 + i % 4}", i, "x") for i in range(8)]
    sink.apply_batch(spark.createDataFrame(seed2, SCHEMA), batch_id=2)
    assert len(sink._read_pointer()) == 8

    rewritten_b, read_b = narrow(3, 300)

    assert rewritten_a == rewritten_b == {"t0", "t1"}
    assert read_a == read_b == {"t0", "t1"}
    got = {
        (r["table_name"], r["pk"], r["val"])
        for r in orig_read(sorted(sink._read_pointer().values())).collect()
        if r["table_name"] in ("t0", "t1") and r["pk"] in (0, 1)
    }
    assert got == {("t0", 0, "u"), ("t1", 1, "u")}


def test_sink_crash_before_pointer_commit_keeps_old_state(spark, tmp_path):
    """Version dirs written but pointer NOT swapped (crash window) →
    readers still see the previous committed state; replaying the batch
    converges."""
    sink = _mk_sink(spark, tmp_path)
    b0 = spark.createDataFrame(MULTI, SCHEMA)
    sink.apply_batch(b0, batch_id=0)

    b1 = spark.createDataFrame(USERS_ONLY, SCHEMA)
    # simulate the crash: batch-1 data dirs get written, then the
    # process dies AT the commit point — the pointer swap never happens
    real_commit = sink._commit_pointer
    sink._commit_pointer = lambda *a, **kw: (_ for _ in ()).throw(OSError("crash"))
    with pytest.raises(OSError):
        sink.apply_batch(b1, batch_id=1)
    sink._commit_pointer = real_commit

    got = {(r["pk"], r["val"]) for r in sink.read_state().filter("table_name='users'").collect()}
    assert got == {(1, "a")}  # pre-crash state, not a torn mix

    # checkpoint replay of the same batch converges (idempotent)
    sink.apply_batch(b1, batch_id=1)
    got = {(r["pk"], r["val"]) for r in sink.read_state().filter("table_name='users'").collect()}
    assert got == {(1, "a2")}


def test_sink_corrupt_pointer_raises_not_resets(spark, tmp_path):
    """A damaged pointer must raise StateCorruptError — never be
    silently treated as 'no state' (which would reset to the current
    batch only)."""
    import pytest as _pytest

    from warp_pipe_spark.streaming import StateCorruptError

    sink = _mk_sink(spark, tmp_path)
    sink.apply_batch(spark.createDataFrame(MULTI, SCHEMA), batch_id=0)

    with open(sink._pointer_path(), "w") as f:
        f.write("{not json")
    with _pytest.raises(StateCorruptError):
        sink.read_state()

    # missing pointer with data present is also corruption, not fresh
    import os

    os.remove(sink._pointer_path())
    with _pytest.raises(StateCorruptError):
        sink.read_state()


def test_sink_fresh_dir_is_none_not_error(spark, tmp_path):
    assert _mk_sink(spark, tmp_path).read_state() is None


def test_sink_crash_during_first_batch_recovers_on_replay(spark, tmp_path):
    """Dying INSIDE the very first micro-batch (version dirs written,
    the batch's pointer never committed) must leave a recoverable sink:
    an empty pointer is committed before any data dir exists, so a
    restart sees valid empty state — not data-without-pointer, which
    _read_pointer rightly treats as corruption and which would wedge
    every redelivery behind StateCorruptError forever."""
    sink = _mk_sink(spark, tmp_path)
    b0 = spark.createDataFrame(MULTI, SCHEMA)
    real_commit = sink._commit_pointer

    def crash_on_batch_commit(tables, batch_id, **kw):
        if tables:  # let the pre-write empty commit through
            raise OSError("crash at first batch's commit point")
        real_commit(tables, batch_id, **kw)

    sink._commit_pointer = crash_on_batch_commit
    with pytest.raises(OSError):
        sink.apply_batch(b0, batch_id=0)
    sink._commit_pointer = real_commit

    # restart: state reads as empty (not corrupt), replay converges
    assert sink.read_state() is None
    sink.apply_batch(b0, batch_id=0)
    got = {(r["table_name"], r["pk"], r["val"]) for r in sink.read_state().collect()}
    assert got == {("users", 1, "a"), ("pets", 1, "rex"), ("pets", 2, "ada")}


def test_sink_null_table_rows_skipped_not_poison_pill(spark, tmp_path):
    """Decoders emit null-struct rows for malformed input lines; a
    NULL table_name row cannot be applied to any table. It must be
    skipped (dead-lettering is the pipeline stage's job), not crash
    the batch — an unhandled TypeError here becomes a poison-pill
    batch that fails identically on every at-least-once redelivery."""
    sink = _mk_sink(spark, tmp_path)
    rows = MULTI + [(9, "INSERT", None, 9, "ghost")]
    sink.apply_batch(spark.createDataFrame(rows, SCHEMA), batch_id=0)
    got = {(r["table_name"], r["pk"], r["val"]) for r in sink.read_state().collect()}
    assert got == {("users", 1, "a"), ("pets", 1, "rex"), ("pets", 2, "ada")}

    # a batch that is ONLY unroutable rows is a clean no-op
    sink.apply_batch(
        spark.createDataFrame([(10, "INSERT", None, 10, "x")], SCHEMA),
        batch_id=1,
    )
    assert sink.read_state().count() == 3


# --- keyset poll loop (S2 tail: JDBC push→poll translation) -----------


def test_keyset_poller_drains_in_bounded_rounds(spark, tmp_path):
    from warp_pipe_spark.streaming import KeysetPoller, parquet_keyset_fetch

    audit = str(tmp_path / "audit")
    _write(spark, BATCH1 + BATCH2, audit)  # ids 1..5
    sink = ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"])
    poller = KeysetPoller(
        spark, parquet_keyset_fetch(audit), sink, str(tmp_path / "off.json"), limit=2
    )
    n = poller.run_until_drained()
    assert n == 5 and poller.committed_offset() == 5
    got = {(r["pk"], r["val"]) for r in sink.read_state().collect()}
    full = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    want = {(r["pk"], r["val"]) for r in replay(full, ["pk"]).collect()}
    assert got == want == {(2, "b2"), (3, "c")}


def test_keyset_poller_kill_restart_resumes_from_offset(spark, tmp_path):
    """Kill the poller mid-stream; a NEW poller instance on the same
    offset file resumes strictly after the committed id and converges;
    late-arriving audit files are picked up by later rounds."""
    from warp_pipe_spark.streaming import KeysetPoller, parquet_keyset_fetch

    audit = str(tmp_path / "audit")
    _write(spark, BATCH1, audit)  # ids 1,2
    mk = lambda: KeysetPoller(  # noqa: E731
        spark,
        parquet_keyset_fetch(audit),
        ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"]),
        str(tmp_path / "off.json"),
        limit=1,
    )
    a = mk()
    assert a.poll_once() == 1  # applies id=1 only, then "dies"
    assert a.committed_offset() == 1

    b = mk()  # restart: fresh instance, durable offset
    assert b.run_until_drained() == 1  # id=2 only — no re-fetch of id=1
    _write(spark, BATCH2, audit)  # ids 3..5 arrive later
    assert b.run_until_drained() == 3
    got = {(r["pk"], r["val"]) for r in b.sink.read_state().collect()}
    assert got == {(2, "b2"), (3, "c")}


def test_keyset_poller_crash_before_offset_commit_redelivers_once_effect(
    spark, tmp_path
):
    """Crash in the window between sink commit and offset commit: the
    restarted poller re-fetches the same slice (at-least-once), and the
    LWW sink absorbs the redelivery — final state identical, offset
    catches up."""
    from warp_pipe_spark.streaming import KeysetPoller, parquet_keyset_fetch

    audit = str(tmp_path / "audit")
    _write(spark, BATCH1 + BATCH2, audit)
    sink = ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"])
    poller = KeysetPoller(
        spark, parquet_keyset_fetch(audit), sink, str(tmp_path / "off.json"), limit=3
    )
    real_commit = poller._commit_offset
    poller._commit_offset = lambda last_id: (_ for _ in ()).throw(OSError("crash"))
    with pytest.raises(OSError):
        poller.poll_once()  # sink applied ids 1..3, offset NOT committed
    poller._commit_offset = real_commit
    assert poller.committed_offset() == 0

    assert poller.run_until_drained() == 5  # ids 1..3 redelivered + 4,5
    assert poller.committed_offset() == 5
    got = {(r["pk"], r["val"]) for r in sink.read_state().collect()}
    assert got == {(2, "b2"), (3, "c")}


def test_keyset_poller_start_from_id_skips_history(spark, tmp_path):
    from warp_pipe_spark.streaming import KeysetPoller, parquet_keyset_fetch

    audit = str(tmp_path / "audit")
    _write(spark, BATCH1 + BATCH2, audit)
    sink = ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"])
    poller = KeysetPoller(
        spark,
        parquet_keyset_fetch(audit),
        sink,
        str(tmp_path / "off.json"),
        start_from_id=3,
        limit=10,
    )
    assert poller.run_until_drained() == 2  # ids 4,5 only
    got = {(r["pk"], r["val"], r["action"]) for r in sink.read_state().collect()}
    assert got == {(2, "b2", "UPDATE"), (3, "c", "INSERT")}


def test_keyset_poller_corrupt_offset_raises_not_restarts(spark, tmp_path):
    """A damaged offset file must raise StateCorruptError — silently
    falling back to start_from_id would re-deliver the entire history
    (correct but a full-backlog replay) without telling anyone."""
    from warp_pipe_spark.streaming import (
        KeysetPoller,
        StateCorruptError,
        parquet_keyset_fetch,
    )

    audit = str(tmp_path / "audit")
    _write(spark, BATCH1, audit)
    sink = ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"])
    poller = KeysetPoller(
        spark, parquet_keyset_fetch(audit), sink, str(tmp_path / "off.json")
    )
    poller.run_until_drained()

    with open(poller.offset_path, "w") as f:
        f.write("{broken")
    with pytest.raises(StateCorruptError):
        poller.poll_once()


# --- pk-hash-bucketed state (VERDICT r2 item 2) -----------------------


def test_bucketed_sink_rewrites_only_touched_bucket(spark, tmp_path):
    """With n_buckets=B, an update to one pk rewrites exactly the one
    bucket dir that pk hashes into — the single-hot-table workload no
    longer degenerates to O(table state) per micro-batch."""
    import os

    B = 8
    sink = ParquetStateSink(
        spark, str(tmp_path / "state"), pk_cols=["pk"], n_buckets=B
    )
    seed = [(i, "INSERT", "users", i, f"v{i}") for i in range(1, 33)]
    sink.apply_batch(spark.createDataFrame(seed, SCHEMA), batch_id=0)
    p0 = sink._read_pointer()
    assert all("#b" in k for k in p0)
    assert len(p0) > 1  # 32 pks spread over several buckets

    sink.apply_batch(
        spark.createDataFrame([(100, "UPDATE", "users", 7, "v7b")], SCHEMA),
        batch_id=1,
    )
    p1 = sink._read_pointer()
    changed = {k for k in p1 if p1[k] != p0.get(k)}
    assert len(changed) == 1  # exactly one bucket re-versioned
    assert "/v_1/" in p1[changed.pop()]
    # untouched bucket dirs survive byte-identical paths
    got = {(r["pk"], r["val"]) for r in sink.read_state().collect()}
    assert got == {(i, f"v{i}") for i in range(1, 33) if i != 7} | {(7, "v7b")}


def test_bucketed_sink_delete_empties_bucket_cleanly(spark, tmp_path):
    """Deleting every row in a bucket must leave NO pointer entry for
    it (a version dir with zero parquet files is unreadable on restart)
    and the remaining state must read back intact."""
    B = 4
    sink = ParquetStateSink(
        spark, str(tmp_path / "state"), pk_cols=["pk"], n_buckets=B
    )
    seed = [(i, "INSERT", "users", i, f"v{i}") for i in range(1, 17)]
    sink.apply_batch(spark.createDataFrame(seed, SCHEMA), batch_id=0)
    p0 = sink._read_pointer()
    # delete every pk that landed in one bucket
    target_key = sorted(p0)[0]
    victims = [
        row["pk"] for row in sink._read_tables([p0[target_key]]).collect()
    ]
    assert victims
    dels = [(100 + j, "DELETE", "users", pk, None) for j, pk in enumerate(victims)]
    sink.apply_batch(spark.createDataFrame(dels, SCHEMA), batch_id=1)
    p1 = sink._read_pointer()
    assert target_key not in p1  # emptied bucket: pointer entry dropped
    survivors = {(i, f"v{i}") for i in range(1, 17) if i not in victims}
    assert {(r["pk"], r["val"]) for r in sink.read_state().collect()} == survivors
    # a fresh sink instance reads the committed state without error
    re_read = ParquetStateSink(
        spark, str(tmp_path / "state"), pk_cols=["pk"], n_buckets=B
    ).read_state()
    assert {(r["pk"], r["val"]) for r in re_read.collect()} == survivors


def test_bucketed_sink_layout_is_fixed_at_first_commit(spark, tmp_path):
    from warp_pipe_spark.streaming import StateCorruptError

    sink = ParquetStateSink(
        spark, str(tmp_path / "state"), pk_cols=["pk"], n_buckets=4
    )
    sink.apply_batch(spark.createDataFrame(MULTI, SCHEMA), batch_id=0)
    other = ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"])
    with pytest.raises(StateCorruptError, match="n_buckets"):
        other.read_state()


def test_bucketed_sink_rejects_zero_buckets(spark, tmp_path):
    # ADVICE r4: n_buckets=0 would round-trip through the pointer as
    # falsy and spuriously StateCorruptError against its own state
    with pytest.raises(ValueError, match="n_buckets"):
        ParquetStateSink(
            spark, str(tmp_path / "state"), pk_cols=["pk"], n_buckets=0
        )


@pytest.mark.soak
def test_keyset_poller_tails_while_writer_appends(spark, tmp_path):
    """True reader-vs-writer race (VERDICT r2 item 4): the poller tails
    the audit dir WHILE a concurrent writer keeps appending changeset
    files. Neither side coordinates; when the writer finishes, a final
    drain must converge to the batch replay oracle over everything
    written — no skipped ids, no stuck offset, no torn state."""
    import threading

    from warp_pipe_spark.streaming import KeysetPoller, parquet_keyset_fetch

    audit = str(tmp_path / "audit")
    # id layout: INSERT pk at id=k, every 3rd pk UPDATEd, every 5th
    # DELETEd — enough kind mix that a lost slice would change state
    all_rows = []
    nxt = 1
    for pk in range(1, 31):
        all_rows.append((nxt, "INSERT", "users", pk, f"v{pk}")); nxt += 1
    for pk in range(3, 31, 3):
        all_rows.append((nxt, "UPDATE", "users", pk, f"v{pk}u")); nxt += 1
    for pk in range(5, 31, 5):
        all_rows.append((nxt, "DELETE", "users", pk, None)); nxt += 1

    _write(spark, all_rows[:4], audit)  # seed so the first poll sees data
    poller = KeysetPoller(
        spark,
        parquet_keyset_fetch(audit),
        ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"]),
        str(tmp_path / "off.json"),
        limit=7,
    )

    written = threading.Event()
    errs: list[BaseException] = []

    def writer():
        try:
            for i in range(4, len(all_rows), 4):
                _write(spark, all_rows[i : i + 4], audit)
        except BaseException as e:  # surface into the main thread
            errs.append(e)
        finally:
            written.set()

    t = threading.Thread(target=writer)
    t.start()
    applied = 0
    while not written.is_set():  # tail live against the growing log
        applied += poller.poll_once()
    t.join()
    assert not errs, errs
    applied += poller.run_until_drained()  # A8 drain after writer stops

    assert applied == len(all_rows)
    assert poller.committed_offset() == len(all_rows)
    got = {(r["pk"], r["val"]) for r in poller.sink.read_state().collect()}
    want = {
        (r["pk"], r["val"])
        for r in replay(spark.createDataFrame(all_rows, SCHEMA), ["pk"]).collect()
    }
    assert got == want


def test_keyset_poller_with_bucketed_sink_converges(spark, tmp_path):
    """The poller contract holds unchanged over the bucketed sink: the
    drain converges to batch replay while per-batch writes stay
    bucket-granular."""
    from warp_pipe_spark.streaming import KeysetPoller, parquet_keyset_fetch

    audit = str(tmp_path / "audit")
    rows = [(i, "INSERT", "users", i % 10, f"v{i}") for i in range(1, 41)]
    _write(spark, rows, audit)
    sink = ParquetStateSink(
        spark, str(tmp_path / "state"), pk_cols=["pk"], n_buckets=4
    )
    poller = KeysetPoller(
        spark, parquet_keyset_fetch(audit), sink, str(tmp_path / "off.json"), limit=15
    )
    assert poller.run_until_drained() == 40
    got = {(r["pk"], r["val"]) for r in sink.read_state().collect()}
    want = {
        (r["pk"], r["val"])
        for r in replay(spark.createDataFrame(rows, SCHEMA), ["pk"]).collect()
    }
    assert got == want
    assert all("#b" in k for k in sink._read_pointer())


def test_sink_time_travel_asof(spark, tmp_path):
    """retain_history=True: superseded version dirs are kept, every
    commit lands in the pointer log, and read_state_asof(N) returns the
    exact state after batch N — Delta-style time travel on CDC state."""
    sink = ParquetStateSink(
        spark, str(tmp_path / "state"), pk_cols=["pk"], retain_history=True
    )
    sink.apply_batch(spark.createDataFrame(BATCH1, SCHEMA), batch_id=0)
    sink.apply_batch(spark.createDataFrame(BATCH2, SCHEMA), batch_id=1)
    sink.apply_batch(
        spark.createDataFrame([(6, "INSERT", "users", 4, "d")], SCHEMA), batch_id=2
    )

    def rows(df):
        return {(r["pk"], r["val"]) for r in df.collect()}

    assert rows(sink.read_state_asof(0)) == {(1, "a"), (2, "b")}
    assert rows(sink.read_state_asof(1)) == {(2, "b2"), (3, "c")}
    assert rows(sink.read_state_asof(2)) == {(2, "b2"), (3, "c"), (4, "d")}
    # asof between commits resolves to the last commit <= N
    assert rows(sink.read_state_asof(99)) == rows(sink.read_state())
    assert sink.read_state_asof(-1) is None


def test_sink_default_still_garbage_collects(spark, tmp_path):
    """Without retain_history the superseded v_0 dir is deleted at the
    batch-1 commit, and read_state_asof refuses (the history it would
    need was never kept)."""
    import os

    import pytest as _pytest

    sink = ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"])
    sink.apply_batch(spark.createDataFrame(BATCH1, SCHEMA), batch_id=0)
    v0 = os.path.join(sink.state_dir, sink._read_pointer()["users"])
    sink.apply_batch(spark.createDataFrame(BATCH2, SCHEMA), batch_id=1)
    assert not os.path.exists(v0)
    with _pytest.raises(ValueError):
        sink.read_state_asof(0)


def test_sink_vacuum_history_bounds_storage(spark, tmp_path):
    """vacuum_history(keep_last=2): older as-of reads disappear, newer
    ones survive, shared (untouched-table) version dirs are preserved,
    and the current state is untouched."""
    import os

    sink = ParquetStateSink(
        spark, str(tmp_path / "state"), pk_cols=["pk"], retain_history=True
    )
    sink.apply_batch(spark.createDataFrame(BATCH1, SCHEMA), batch_id=0)
    sink.apply_batch(spark.createDataFrame(BATCH2, SCHEMA), batch_id=1)
    sink.apply_batch(
        spark.createDataFrame([(6, "INSERT", "users", 4, "d")], SCHEMA), batch_id=2
    )
    v0 = os.path.join(sink.state_dir, "tables/users/v_0")
    assert os.path.isdir(v0)

    n = sink.vacuum_history(keep_last=2)
    assert n == 1 and not os.path.exists(v0)
    # asof(0) now resolves to nothing older than the kept window
    assert sink.read_state_asof(0) is None
    assert {(r["pk"], r["val"]) for r in sink.read_state_asof(1).collect()} == {
        (2, "b2"),
        (3, "c"),
    }
    assert {(r["pk"], r["val"]) for r in sink.read_state().collect()} == {
        (2, "b2"),
        (3, "c"),
        (4, "d"),
    }
    # idempotent: nothing more to drop
    assert sink.vacuum_history(keep_last=2) == 0


def test_sink_additive_schema_evolution_new_column(spark, tmp_path):
    """A source-side ALTER TABLE ADD COLUMN mid-stream: batch 1 lacks
    `email`, batch 2 carries it. The sink must merge (pre-evolution
    rows read NULL), the mixed-version multi-path read must surface
    the new column (mergeSchema), and a fresh sink over the same dir
    must see the evolved state after restart."""
    sink = _mk_sink(spark, tmp_path)
    sink.apply_batch(spark.createDataFrame(BATCH1, SCHEMA), batch_id=0)
    evolved = spark.createDataFrame(
        [(10, "INSERT", "users", 5, "e", "e@x.com")],
        SCHEMA + ", email STRING",
    )
    sink.apply_batch(evolved, batch_id=1)

    got = {
        (r["pk"], r["val"], r["email"]) for r in sink.read_state().collect()
    }
    assert got == {(1, "a", None), (2, "b", None), (5, "e", "e@x.com")}

    # restart: a fresh sink instance reads the same evolved state
    sink2 = _mk_sink(spark, tmp_path)
    assert {
        (r["pk"], r["email"]) for r in sink2.read_state().collect()
    } == {(1, None), (2, None), (5, "e@x.com")}


def test_sink_schema_evolution_dropped_column_keeps_state_data(spark, tmp_path):
    """The reverse direction: a batch that no longer carries `val`
    must not silently drop the column from state — old rows keep their
    values, the new row reads NULL, and an UPDATE from the narrow
    schema nulls only ITS row (its version is the LWW winner)."""
    sink = _mk_sink(spark, tmp_path)
    sink.apply_batch(spark.createDataFrame(BATCH1, SCHEMA), batch_id=0)
    narrow = spark.createDataFrame(
        [(11, "INSERT", "users", 6), (12, "UPDATE", "users", 2)],
        "id LONG, action STRING, table_name STRING, pk LONG",
    )
    sink.apply_batch(narrow, batch_id=1)
    got = {(r["pk"], r["val"]) for r in sink.read_state().collect()}
    assert got == {(1, "a"), (2, None), (6, None)}


def test_bucketed_sink_truncate_clears_all_buckets(spark, tmp_path):
    """truncate_kinds opt-in: a `truncate` changeset (pgoutput source)
    clears EVERY committed bucket of its table — including buckets no
    batch row hashes into — drops emptied pointer entries, leaves other
    tables untouched, and keeps post-truncate rows. Without the opt-in
    the sink's O(touched) contract is unchanged."""
    from warp_pipe_spark.apply import TRUNCATE_KINDS

    B = 8
    sink = ParquetStateSink(
        spark, str(tmp_path / "state"), pk_cols=["pk"], n_buckets=B,
        truncate_kinds=TRUNCATE_KINDS,
    )
    seed = [(i, "INSERT", "users", i, f"v{i}") for i in range(1, 33)] + [
        (100, "INSERT", "pets", 1, "rex")
    ]
    sink.apply_batch(spark.createDataFrame(seed, SCHEMA), batch_id=0)
    assert sink.read_state().count() == 33

    batch = [
        (200, "truncate", "users", None, None),
        (201, "INSERT", "users", 50, "survivor"),
    ]
    sink.apply_batch(spark.createDataFrame(batch, SCHEMA), batch_id=1)
    got = {
        (r["table_name"], r["pk"], r["val"])
        for r in sink.read_state().collect()
    }
    assert got == {("pets", 1, "rex"), ("users", 50, "survivor")}
    # emptied buckets lost their pointer entries; no truncate row in state
    p = sink._read_pointer()
    users_keys = [k for k in p if k.startswith("users#b")]
    assert len(users_keys) == 1  # only the survivor's bucket remains
    # redelivery of the truncate batch converges to the same state
    sink.apply_batch(spark.createDataFrame(batch, SCHEMA), batch_id=1)
    got2 = {
        (r["table_name"], r["pk"], r["val"])
        for r in sink.read_state().collect()
    }
    assert got2 == got


def test_streamed_truncate_clears_state_through_wal2json_stream(spark, tmp_path):
    """The round's truncate semantics wired END-TO-END through the
    STREAMING path: pgoutput-shaped drop-dir docs (insert batch, then a
    truncate + post-truncate insert) flow through wal2json_stream into
    a truncate-aware ParquetStateSink — the table clears mid-stream and
    only the post-truncate row survives."""
    import json as _json

    from pyspark.sql import functions as F

    from warp_pipe_spark.apply import TRUNCATE_KINDS
    from warp_pipe_spark.changeset import column_value
    from warp_pipe_spark.streaming import wal2json_stream

    def doc(changes, nextlsn):
        return _json.dumps({"change": changes, "nextlsn": nextlsn})

    def ch(cid, kind, pk=None, val=None):
        cols = (
            {"columnnames": ["id", "val"], "columntypes": ["bigint", "text"],
             "columnvalues": [str(pk), val]}
            if kind != "truncate"
            else {"columnnames": [], "columntypes": [], "columnvalues": []}
        )
        return {"id": cid, "kind": kind, "schema": "public",
                "table": "users", **cols}

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "lr_01.jsonl").write_text(
        doc([ch(1, "insert", 1, "a"), ch(2, "insert", 2, "b")], "0/1000") + "\n"
    )
    (drop / "lr_02.jsonl").write_text(
        doc([ch(3, "truncate"), ch(4, "insert", 3, "c")], "0/2000") + "\n"
    )

    decoded = wal2json_stream(spark, str(drop), max_files_per_trigger=1)
    typed = decoded.select(
        "id",
        F.col("kind").alias("action"),
        F.col("table").alias("table_name"),
        column_value("new_values", "id").cast("long").alias("pk"),
        column_value("new_values", "val").alias("val"),
    )
    sink = ParquetStateSink(
        spark, str(tmp_path / "state"), pk_cols=["pk"],
        truncate_kinds=TRUNCATE_KINDS,
    )
    q = (
        typed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["pk"], r["val"])
        for r in sink.read_state().select("pk", "val").collect()
    }
    assert got == {(3, "c")}


def test_sink_single_write_handles_escaped_table_names(spark, tmp_path):
    """r14 single-write path: table names containing characters Spark
    escapes in partition dirs (%XX), plus the empty string (which Spark
    writes under __HIVE_DEFAULT_PARTITION__), must round-trip through
    the staging partitionBy + rename into the same per-table version
    dirs the per-table writer produced."""
    weird = ["users", "a/b:c", "x=y", "100%", ""]
    rows = [(i + 1, "INSERT", t, i + 1, f"v{i}") for i, t in enumerate(weird)]
    sink = ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"])
    sink.apply_batch(spark.createDataFrame(rows, SCHEMA), batch_id=0)
    pointer = sink._read_pointer()
    assert set(pointer) == set(weird)
    got = {
        (r["table_name"], r["pk"], r["val"])
        for r in sink.read_state().collect()
    }
    assert got == {(t, i + 1, f"v{i}") for i, t in enumerate(weird)}
    # second batch touches a subset: untouched weird-name tables keep
    # their version dirs, touched ones re-version
    sink.apply_batch(
        spark.createDataFrame([(10, "UPDATE", "a/b:c", 2, "v1b")], SCHEMA),
        batch_id=1,
    )
    p1 = sink._read_pointer()
    assert p1["a/b:c"].endswith("v_1")
    assert p1["users"] == pointer["users"]
    assert {
        (r["table_name"], r["val"])
        for r in sink.read_state().filter("pk = 2").collect()
    } == {("a/b:c", "v1b")}


def test_batch_stats_matches_apply_batch_derivation(spark, tmp_path):
    """batch_stats' one-job (touched, max_id, n) must agree with what
    apply_batch derives itself — including NULL-table rows, which count
    toward the offset watermark but never into the touched set — and
    feeding the hint back must produce the identical committed state."""
    rows = [
        (1, "INSERT", "users", 1, "a"),
        (7, "INSERT", None, 9, "poison"),  # null-table: offset-only
        (3, "INSERT", "pets", 1, "rex"),
        (5, "UPDATE", "users", 1, "a2"),
    ]
    batch = spark.createDataFrame(rows, SCHEMA)
    plain = ParquetStateSink(spark, str(tmp_path / "plain"), pk_cols=["pk"])
    hinted = ParquetStateSink(spark, str(tmp_path / "hinted"), pk_cols=["pk"])
    touched, mx, n = hinted.batch_stats(batch)
    assert touched == [("pets", None), ("users", None)]
    assert (mx, n) == (7, 4)
    plain.apply_batch(batch, batch_id=0)
    hinted.apply_batch(batch, batch_id=0, touched=touched)
    as_set = lambda s: {  # noqa: E731
        (r["table_name"], r["pk"], r["id"], r["val"])
        for r in s.read_state().collect()
    }
    assert as_set(plain) == as_set(hinted)
    assert plain._read_pointer() == hinted._read_pointer()
    # bucketed sinks key the touched set by (table, bucket)
    b = ParquetStateSink(
        spark, str(tmp_path / "bucketed"), pk_cols=["pk"], n_buckets=4
    )
    touched_b, mx_b, n_b = b.batch_stats(batch)
    assert (mx_b, n_b) == (7, 4)
    assert all(t in ("pets", "users") and 0 <= bk < 4 for t, bk in touched_b)
    b.apply_batch(batch, batch_id=0, touched=touched_b)
    assert {
        (r["table_name"], r["pk"]) for r in b.read_state().collect()
    } == {("users", 1), ("pets", 1)}


def test_redelivered_batch_never_unlinks_committed_dirs(spark, tmp_path):
    """ADVICE r14: a redelivered batch_id must NEVER delete the version
    dir the committed pointer references before the new pointer lands —
    a crash in that window used to leave the pointer referencing
    deleted dirs. Now the redelivery writes a `.r<n>`-suffixed dir and
    the committed dir survives until after the commit point."""
    sink = _mk_sink(spark, tmp_path)
    b = spark.createDataFrame(USERS_ONLY, SCHEMA)
    sink.apply_batch(b, batch_id=1)
    committed_rel = sink._read_pointer()["users"]
    committed_dir = str(tmp_path / "state" / committed_rel)
    import os

    assert os.path.isdir(committed_dir)

    # redeliver the same batch_id, but crash AT the commit point: the
    # previously committed dir must still exist and be readable
    real_commit = sink._commit_pointer
    sink._commit_pointer = lambda *a, **kw: (_ for _ in ()).throw(
        OSError("crash")
    )
    with pytest.raises(OSError):
        sink.apply_batch(b, batch_id=1)
    sink._commit_pointer = real_commit
    assert os.path.isdir(committed_dir), (
        "redelivery deleted the committed version dir pre-commit"
    )
    assert {
        (r["pk"], r["val"]) for r in sink.read_state().collect()
    } == {(1, "a2")}

    # the completed redelivery converges; its dir is the suffixed one
    # and the superseded canonical dir is swept after the commit
    sink.apply_batch(b, batch_id=1)
    rel2 = sink._read_pointer()["users"]
    assert rel2 != committed_rel and rel2.startswith(committed_rel)
    assert {
        (r["pk"], r["val"]) for r in sink.read_state().collect()
    } == {(1, "a2")}
    assert not os.path.isdir(committed_dir)  # garbage only POST-commit


def test_orphan_version_dir_is_reclaimed_not_suffixed(spark, tmp_path):
    """A colliding version dir that NO committed pointer references is
    an orphan of a delivery that died pre-commit: it is cleared and the
    canonical name reused (no unbounded .rN growth from crash loops)."""
    import os

    sink = _mk_sink(spark, tmp_path)
    sink.apply_batch(spark.createDataFrame(MULTI, SCHEMA), batch_id=0)
    orphan = tmp_path / "state" / "tables" / "users" / "v_1"
    os.makedirs(orphan)
    (orphan / "garbage.parquet").write_bytes(b"not parquet")
    sink.apply_batch(spark.createDataFrame(USERS_ONLY, SCHEMA), batch_id=1)
    assert sink._read_pointer()["users"] == "tables/users/v_1"
    assert {
        (r["pk"], r["val"])
        for r in sink.read_state().filter("table_name='users'").collect()
    } == {(1, "a2")}


def test_redelivery_with_history_preserves_asof_reads(spark, tmp_path):
    """retain_history: every logged pointer stays readable across a
    redelivery — the suffixed dir keeps history entries valid."""
    sink = ParquetStateSink(
        spark, str(tmp_path / "state"), pk_cols=["pk"], retain_history=True
    )
    sink.apply_batch(spark.createDataFrame(MULTI, SCHEMA), batch_id=0)
    sink.apply_batch(spark.createDataFrame(USERS_ONLY, SCHEMA), batch_id=1)
    # redeliver batch 1 (offset-commit crash shape)
    sink.apply_batch(spark.createDataFrame(USERS_ONLY, SCHEMA), batch_id=1)
    asof0 = {
        (r["table_name"], r["pk"], r["val"])
        for r in sink.read_state_asof(0).collect()
    }
    assert ("users", 1, "a") in asof0
    assert {
        (r["pk"], r["val"])
        for r in sink.read_state().filter("table_name='users'").collect()
    } == {(1, "a2")}


def test_marker_table_name_rejected_loudly(spark, tmp_path):
    """ADVICE r14: a table literally named __HIVE_DEFAULT_PARTITION__
    would collide with Spark's marker for the empty-string table and be
    filed under the wrong pointer key — both batch_stats and
    apply_batch must reject it up front."""
    sink = _mk_sink(spark, tmp_path)
    rows = [(1, "INSERT", "__HIVE_DEFAULT_PARTITION__", 1, "x")]
    batch = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(ValueError, match="default-partition marker"):
        sink.batch_stats(batch)
    with pytest.raises(ValueError, match="default-partition marker"):
        sink.apply_batch(batch, batch_id=0)


def test_state_sink_abc_default_batch_stats(spark):
    """The StateSink base class (VERDICT r14 #9): every sink inherits a
    batch_stats returning (None, max_id, n) so the poller's fast path
    can never AttributeError again; MergeStateSink uses the default."""
    from warp_pipe_spark.merge_sink import InMemoryMergeExecutor, MergeStateSink
    from warp_pipe_spark.streaming import StateSink

    sink = MergeStateSink(spark, InMemoryMergeExecutor(spark))
    assert isinstance(sink, StateSink)
    batch = spark.createDataFrame(MULTI, SCHEMA)
    touched, mx, n = sink.batch_stats(batch)
    assert touched is None and (mx, n) == (3, 3)
    empty = spark.createDataFrame([], SCHEMA)
    touched, mx, n = sink.batch_stats(empty)
    assert touched is None and mx is None and n == 0
