"""Live-Postgres integration for the logical-replication client.

Everything in test_lr_client.py runs against a wire-level fake
walsender; THIS module runs the identical client code against a REAL
wal2json-enabled Postgres when one is provided, and skips cleanly
otherwise — it closes the one environmental gap in the §2 coverage
(lr_listener parity) the moment an environment supplies a server.

Opt in with::

    WP_LIVE_PG_DSN=postgresql://user@host:5432/dbname \
        python -m pytest tests/test_live_pg.py -q

Server requirements (also in README): ``wal_level=logical``, the
wal2json output plugin installed, trust auth for the given user/host
(LRClient implements AuthenticationOk only — no password flows), and
the user holding REPLICATION plus CREATE on the database. The tests
create and drop their own uniquely-named slot and table; nothing else
on the server is touched.

A server WITHOUT wal2json.so still runs the whole wire suite with the
stock plugin: add ``WP_LIVE_PG_PLUGIN=test_decoding``. First recorded
green run (round 10, PostgreSQL 15.18 in this container, initdb +
``wal_level=logical`` + trust on 127.0.0.1:54329): 3 passed
(identify_system, slot lifecycle, test_decoding tail end-to-end with
delivered-LSN confirmation), 1 skipped (the wal2json payload decode —
plugin binary absent; its byte shape stays pinned by the golden
fake-walsender tests).

No driver dependency: DML runs over a second replication=database
connection's simple-query path (``LRClient._simple_query``) — since
PostgreSQL 10 a logical walsender connection accepts plain SQL, which
is the public behavior pg_basebackup and subscribers rely on.
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse

import pytest

from warp_pipe_spark.lr_client import LRClient, tail_to_drop_dir

pytestmark = pytest.mark.skipif(
    not os.environ.get("WP_LIVE_PG_DSN"),
    reason=(
        "live-Postgres integration is environment-gated: set "
        "WP_LIVE_PG_DSN=postgresql://user@host:port/dbname to run"
    ),
)


def _client(slot: str) -> LRClient:
    u = urllib.parse.urlsplit(os.environ["WP_LIVE_PG_DSN"])
    if u.scheme not in ("postgresql", "postgres"):
        raise ValueError(f"WP_LIVE_PG_DSN must be a postgresql:// URL, got {u.scheme!r}")
    return LRClient(
        host=u.hostname or "localhost",
        port=u.port or 5432,
        dbname=(u.path or "/postgres").lstrip("/") or "postgres",
        user=u.username or "postgres",
        slot=slot,
        status_interval_s=1.0,
        plugin=_PLUGIN,
    )


#: Output plugin for the live slots. The wire path under test —
#: startup, IDENTIFY_SYSTEM, slot lifecycle, CopyBoth, XLogData,
#: delivered-LSN confirmation, idle-timeout drain, teardown — is
#: plugin-independent; only the PAYLOAD SHAPE differs. A server
#: without wal2json.so (it is an out-of-tree contrib module) can
#: still run the whole suite with the stock `test_decoding` plugin:
#: set WP_LIVE_PG_PLUGIN=test_decoding. The wal2json payload-decode
#: assertions then skip (that byte shape stays pinned by the golden
#: fake-walsender tests in test_lr_client.py) and the text-payload
#: twin below runs instead.
_PLUGIN = os.environ.get("WP_LIVE_PG_PLUGIN", "wal2json")


@pytest.fixture()
def live(tmp_path):
    """Two connected sessions against the live server: `ctl` for SQL
    DDL/DML (simple-query path), `rep` owning a unique throwaway slot.
    Teardown drops both the slot and the work table even on failure."""
    uniq = f"wp_live_{os.getpid()}_{int(time.time())}"
    ctl = _client(uniq + "_ctl")
    rep = _client(uniq)
    ctl.connect()
    rep.connect()
    tbl = f"wp_live_tbl_{os.getpid()}"
    try:
        yield ctl, rep, tbl
    finally:
        try:
            ctl._simple_query(f"DROP TABLE IF EXISTS {tbl}")
        except Exception:
            pass
        try:
            rep.drop_slot()
        except Exception:
            # the rep session may be desynchronized (an idle-timeout
            # drain abandons CopyBoth mid-stream): closing it releases
            # the slot's active claim, then ctl can drop it. The
            # server-side walsender releases the claim ASYNCHRONOUSLY
            # after the close, so a single immediate drop can fail
            # with "slot is in use" — retry briefly rather than
            # leaking a slot (which retains WAL indefinitely) on a
            # failed run (ADVICE r8).
            try:
                rep.close()
            except Exception:
                pass
            for attempt in range(5):
                try:
                    ctl._simple_query(
                        f"DROP_REPLICATION_SLOT {rep.slot} WAIT"
                    )
                    break
                except Exception:
                    # WAIT needs PG13+; older servers reject the
                    # keyword — fall back to the bare drop on the
                    # next lines, and sleep between attempts so the
                    # walsender has time to release the claim
                    try:
                        ctl._simple_query(
                            f"DROP_REPLICATION_SLOT {rep.slot}"
                        )
                        break
                    except Exception:
                        if attempt == 4:
                            break
                        time.sleep(0.5)
        for cleanup in (ctl.close, rep.close):
            try:
                cleanup()
            except Exception:
                pass


def test_identify_system_reports_a_real_lsn(live):
    ctl, rep, _ = live
    ident = rep.identify_system()
    assert ident["systemid"] and ident["timeline"]
    # xlogpos is a real LSN like 0/16B3748 — parseable and nonzero
    hi, lo = ident["xlogpos"].split("/")
    assert int(hi, 16) >= 0 and int(lo, 16) >= 0


def test_slot_lifecycle_create_is_idempotent_then_drops(live):
    ctl, rep, _ = live
    # a FRESH slot (the fixture name is unique per run) must return a
    # concrete consistent-point LSN — None here would mean the slot
    # pre-existed or the row was malformed, and would silently turn
    # the cross-recreation comparison below into `is not None`
    lsn = rep.create_slot()
    assert lsn is not None and lsn > 0, lsn
    # second create with if_not_exists returns None instead of raising
    assert rep.create_slot(if_not_exists=True) is None
    rep.drop_slot()
    # slot is really gone: a fresh create succeeds again with a
    # consistent point at or past the first one
    lsn2 = rep.create_slot()
    assert lsn2 is not None and lsn2 >= lsn


@pytest.mark.skipif(
    _PLUGIN != "wal2json",
    reason="wal2json payload decode needs the wal2json plugin; the wire "
    "path is covered by the test_decoding twin below",
)
def test_tail_delivers_wal2json_changes_to_drop_dir(live, tmp_path):
    """The §2 S1 end-to-end against real WAL: create slot → commit
    inserts/update/delete → tail the stream into the drop dir → the
    JSONL payloads decode as wal2json documents carrying exactly the
    committed changes, and the confirmed LSN advanced (delivered-WAL
    semantics, never ServerWALEnd)."""
    ctl, rep, tbl = live
    rep.create_slot()
    ctl._simple_query(
        f"CREATE TABLE {tbl} (id int primary key, val text)"
    )
    ctl._simple_query(
        f"INSERT INTO {tbl} VALUES (1, 'a'), (2, 'b'); "
        f"UPDATE {tbl} SET val = 'b2' WHERE id = 2; "
        f"DELETE FROM {tbl} WHERE id = 1"
    )
    drop = str(tmp_path / "drop")
    # wal2json default format = one document per transaction, and the
    # whole multi-statement simple query above runs as ONE implicit
    # transaction — so expect as few as a single document, never the
    # max_messages bound. max_messages=10 is only the upper guard;
    # idle_timeout_s is what terminates the drain (ADVICE r7: without
    # it the tail blocked forever waiting for a 10th message)
    n = tail_to_drop_dir(
        rep, drop, batch_rows=1, max_messages=10, idle_timeout_s=10.0
    )
    assert n >= 1
    kinds: list[str] = []
    rows_seen: set[tuple] = set()
    for fn in sorted(os.listdir(drop)):
        with open(os.path.join(drop, fn), "rb") as f:
            for line in f.read().splitlines():
                doc = json.loads(line)
                for ch in doc.get("change", []):
                    if ch.get("table") != tbl.lower():
                        continue
                    kinds.append(ch["kind"])
                    if ch["kind"] == "insert":
                        cols = dict(
                            zip(ch["columnnames"], ch["columnvalues"])
                        )
                        rows_seen.add((cols["id"], cols["val"]))
    assert ("insert" in kinds and "update" in kinds and "delete" in kinds), kinds
    assert (1, "a") in rows_seen and (2, "b") in rows_seen
    # delivered-WAL confirmation advanced the client's flushed LSN
    assert rep.flushed_lsn > 0


@pytest.mark.skipif(
    _PLUGIN != "test_decoding",
    reason="text-payload twin only runs under WP_LIVE_PG_PLUGIN=test_decoding",
)
def test_tail_delivers_test_decoding_changes(live, tmp_path):
    """The SAME end-to-end as the wal2json tail — create slot → commit
    insert/update/delete → tail into the drop dir → confirmed LSN
    advanced — against the stock `test_decoding` plugin, whose payload
    is one text line per change ("table public.t: INSERT: id[integer]:1
    val[text]:'a'"). Every wire behavior under test (CopyBoth framing,
    delivered-WAL confirmation, idle-timeout drain, atomic batch files)
    is identical; only the payload parser here differs."""
    ctl, rep, tbl = live
    rep.create_slot()
    ctl._simple_query(f"CREATE TABLE {tbl} (id int primary key, val text)")
    ctl._simple_query(
        f"INSERT INTO {tbl} VALUES (1, 'a'), (2, 'b'); "
        f"UPDATE {tbl} SET val = 'b2' WHERE id = 2; "
        f"DELETE FROM {tbl} WHERE id = 1"
    )
    drop = str(tmp_path / "drop")
    # test_decoding emits one message PER CHANGE plus BEGIN/COMMIT —
    # unlike wal2json's one-document-per-transaction; the 3 changes
    # above arrive as >= 5 messages. max_messages stays the upper
    # guard; idle_timeout_s terminates the drain.
    n = tail_to_drop_dir(
        rep, drop, batch_rows=1, max_messages=50, idle_timeout_s=10.0
    )
    assert n >= 5
    lines: list[str] = []
    for fn in sorted(os.listdir(drop)):
        with open(os.path.join(drop, fn), "rb") as f:
            lines.extend(f.read().decode(errors="replace").splitlines())
    tbl_lines = [ln for ln in lines if f"public.{tbl.lower()}:" in ln]
    kinds = {ln.split(":")[1].strip() for ln in tbl_lines}
    assert kinds == {"INSERT", "UPDATE", "DELETE"}, tbl_lines
    ins = [ln for ln in tbl_lines if ": INSERT:" in ln]
    assert any("id[integer]:1" in ln and "val[text]:'a'" in ln for ln in ins)
    assert any("id[integer]:2" in ln and "val[text]:'b'" in ln for ln in ins)
    upd = [ln for ln in tbl_lines if ": UPDATE:" in ln]
    assert any("val[text]:'b2'" in ln for ln in upd)
    # delivered-WAL confirmation advanced the client's flushed LSN
    assert rep.flushed_lsn > 0


# --- live execution of the SQL builders (S10-S12, A4-A6, S2) ------------
#
# The DDL / discovery / sequence-sync SQL was previously pinned only as
# strings (the sandbox had no server). With a live server the builders
# EXECUTE, plugin-independently, over the walsender simple-query path.


def test_setup_teardown_and_keyset_sql_execute_live(live):
    """S10/S11/S2: provision the audit schema, write through it, poll
    it with keyset_query, tear it down — every statement the builders
    emit runs against real PostgreSQL."""
    from warp_pipe_spark.jdbc import keyset_query, setup_ddl, teardown_ddl

    ctl, _, _ = live
    schema = f"wp_live_audit_{os.getpid()}"
    try:
        for stmt in setup_ddl(schema):
            ctl._simple_query(stmt)
        ctl._simple_query(
            f"INSERT INTO {schema}.changesets "
            "(action, schema_name, table_name, new_values) VALUES "
            "('INSERT', 'public', 't1', '{\"id\": 1}'), "
            "('UPDATE', 'public', 't1', '{\"id\": 1}'), "
            "('DELETE', 'public', 't2', NULL)"
        )
        rows = ctl._simple_query(
            keyset_query(f"{schema}.changesets", last_id=1, limit=10)
        )
        # strictly-after semantics: ids 2 and 3 only, in id order
        assert [r[0] for r in rows] == ["2", "3"]
        assert [r[2] for r in rows] == ["UPDATE", "DELETE"]
        assert ctl._simple_query(
            keyset_query(f"{schema}.changesets", last_id=0, limit=0)
        ) == []  # LIMIT 0 is honored, never 'unbounded'
    finally:
        for stmt in teardown_ddl(schema):
            ctl._simple_query(stmt)
    # schema really gone
    left = ctl._simple_query(
        "SELECT count(*) FROM information_schema.schemata "
        f"WHERE schema_name = '{schema}'"
    )
    assert left == [("0",)]


def test_discovery_and_pk_sql_execute_live(live):
    """S12/A4: tables_list_query and primary_keys_query against real
    catalogs — including the composite-PK ordering and the same-named
    UNIQUE constraint the round-6 cross-match fix exists for."""
    from warp_pipe_spark.jdbc import primary_keys_query, tables_list_query

    ctl, _, _ = live
    schema = f"wp_live_cat_{os.getpid()}"
    try:
        ctl._simple_query(f"CREATE SCHEMA {schema}")
        ctl._simple_query(
            f"CREATE TABLE {schema}.users (id bigint PRIMARY KEY, email text)"
        )
        ctl._simple_query(
            f"CREATE TABLE {schema}.orders ("
            "region text, order_id bigint, note text, "
            "PRIMARY KEY (region, order_id))"
        )
        tables = ctl._simple_query(tables_list_query([schema]))
        assert {(r[0], r[1]) for r in tables} == {
            (schema, "users"),
            (schema, "orders"),
        }
        pks = ctl._simple_query(primary_keys_query([schema]))
        got = {(r[1], r[2], r[3]) for r in pks}
        assert got == {
            ("users", "id", "1"),
            ("orders", "region", "1"),
            ("orders", "order_id", "2"),
        }
    finally:
        ctl._simple_query(f"DROP SCHEMA IF EXISTS {schema} CASCADE")


def test_sequence_discovery_and_setval_execute_live(live):
    """A5/A6: discover the BIGSERIAL-backed sequence with
    column_sequences_query, parse its name, advance it with the emitted
    setval statement, and observe nextval continue from there — the
    whole sequence-sync loop against a real server."""
    from warp_pipe_spark.sequences import (
        column_sequences_query,
        parse_sequence_default,
        setval_statement,
    )

    ctl, _, _ = live
    tbl = f"wp_live_seq_{os.getpid()}"
    try:
        ctl._simple_query(
            f"CREATE TABLE public.{tbl} (id bigserial PRIMARY KEY, v text)"
        )
        found = [
            r
            for r in ctl._simple_query(column_sequences_query("public"))
            if r[0] == tbl
        ]
        assert len(found) == 1 and found[0][1] == "id"
        seq = parse_sequence_default(found[0][2])
        assert seq == f"{tbl}_id_seq"
        ctl._simple_query(setval_statement(f"public.{seq}", 41))
        (nxt,) = ctl._simple_query(f"SELECT nextval('public.{seq}')")[0]
        assert nxt == "42"
        ctl._simple_query(f"INSERT INTO public.{tbl} (v) VALUES ('x')")
        (mx,) = ctl._simple_query(f"SELECT max(id) FROM public.{tbl}")[0]
        assert mx == "43"
    finally:
        ctl._simple_query(f"DROP TABLE IF EXISTS public.{tbl}")


def test_full_cdc_loop_trigger_audit_poll_decode_replay(live, spark):
    """The reference's WHOLE product loop, live: a deployment-style
    row_to_json AFTER-trigger (the piece setup_ddl deliberately leaves
    to the deployment) writes every change on a source table into the
    provisioned audit log; the keyset poll reads the log strictly-after
    an offset; decode_audit_values parses the JSON row images; replay
    folds them last-writer-wins — and the replayed state equals a live
    SELECT of the source table, row for row. Every hop is the real
    artifact: real trigger, real BIGSERIAL ids, real JSON from
    row_to_json, real Spark decode+replay."""
    from pyspark.sql import functions as F

    from warp_pipe_spark.apply import replay
    from warp_pipe_spark.decoders import decode_audit_values
    from warp_pipe_spark.jdbc import keyset_query, setup_ddl, teardown_ddl

    ctl, _, _ = live
    schema = f"wp_live_loop_{os.getpid()}"
    src = f"{schema}.accounts"
    try:
        for stmt in setup_ddl(schema):
            ctl._simple_query(stmt)
        ctl._simple_query(
            f"CREATE TABLE {src} (id bigint PRIMARY KEY, val text)"
        )
        ctl._simple_query(
            f"""
            CREATE FUNCTION {schema}.wp_audit() RETURNS trigger AS $$
            BEGIN
              IF TG_OP = 'DELETE' THEN
                INSERT INTO {schema}.changesets
                  (action, schema_name, table_name, relid, new_values, old_values)
                VALUES (TG_OP, TG_TABLE_SCHEMA, TG_TABLE_NAME, TG_RELID,
                        NULL, row_to_json(OLD));
                RETURN OLD;
              ELSIF TG_OP = 'UPDATE' THEN
                INSERT INTO {schema}.changesets
                  (action, schema_name, table_name, relid, new_values, old_values)
                VALUES (TG_OP, TG_TABLE_SCHEMA, TG_TABLE_NAME, TG_RELID,
                        row_to_json(NEW), row_to_json(OLD));
                RETURN NEW;
              ELSE
                INSERT INTO {schema}.changesets
                  (action, schema_name, table_name, relid, new_values, old_values)
                VALUES (TG_OP, TG_TABLE_SCHEMA, TG_TABLE_NAME, TG_RELID,
                        row_to_json(NEW), NULL);
                RETURN NEW;
              END IF;
            END $$ LANGUAGE plpgsql;
            CREATE TRIGGER wp_audit_t AFTER INSERT OR UPDATE OR DELETE
              ON {src} FOR EACH ROW EXECUTE FUNCTION {schema}.wp_audit()
            """
        )
        ctl._simple_query(
            f"INSERT INTO {src} VALUES (1, 'a'), (2, 'b'), (3, 'c'); "
            f"UPDATE {src} SET val = 'b2' WHERE id = 2; "
            f"UPDATE {src} SET val = 'c2' WHERE id = 3; "
            f"DELETE FROM {src} WHERE id = 1; "
            f"INSERT INTO {src} VALUES (4, 'd')"
        )
        raw = ctl._simple_query(
            keyset_query(f"{schema}.changesets", last_id=0, limit=1000)
        )
        assert len(raw) == 7  # 4 inserts + 2 updates + 1 delete
        # text-mode tuples -> the audit frame decode_audit_values expects
        audit = spark.createDataFrame(
            [
                (int(r[0]), r[1], r[2], r[3], r[4],
                 int(r[5]) if r[5] is not None else None, r[6], r[7])
                for r in raw
            ],
            "id LONG, ts STRING, action STRING, schema_name STRING, "
            "table_name STRING, relid LONG, new_values STRING, "
            "old_values STRING",
        ).withColumn("ts", F.to_timestamp("ts"))
        decoded = decode_audit_values(audit)
        typed = decoded.select(
            "id",
            F.col("kind").alias("action"),
            F.col("table").alias("table_name"),
            F.coalesce(
                F.col("new_values")["id"], F.col("old_values")["id"]
            ).cast("long").alias("pk"),
            F.col("new_values")["val"].alias("val"),
        )
        state = replay(typed, ["pk"]).select("pk", "val")
        got = {(r["pk"], r["val"]) for r in state.collect()}
        live_rows = ctl._simple_query(f"SELECT id, val FROM {src} ORDER BY id")
        expect = {(int(r[0]), r[1]) for r in live_rows}
        assert got == expect == {(2, "b2"), (3, "c2"), (4, "d")}
    finally:
        for stmt in teardown_ddl(schema):
            ctl._simple_query(stmt)


def test_live_keyset_poller_applies_to_state_sink(live, spark, tmp_path):
    """S2 as the RUNNABLE micro-batch loop, live: KeysetPoller polls
    the real audit log (fed by a real trigger) strictly-after its
    durable offset, applies each slice through ParquetStateSink, and
    converges to a live SELECT — across TWO poll rounds with new DML
    landing between them, a restart that must resume from the
    committed offset (0 new rows), and the offset file advancing to
    the real BIGSERIAL high watermark."""
    from pyspark.sql import functions as F

    from warp_pipe_spark.jdbc import keyset_query, setup_ddl, teardown_ddl
    from warp_pipe_spark.streaming import KeysetPoller, ParquetStateSink

    ctl, _, _ = live
    schema = f"wp_live_poll_{os.getpid()}"
    src = f"{schema}.accounts"

    def live_fetch(spark_, last_id, limit):
        raw = ctl._simple_query(
            keyset_query(f"{schema}.changesets", last_id, limit)
        )
        rows = [
            (
                int(r[0]),
                r[2],
                r[4],
                # pk/val straight off the trigger's row_to_json output
                int(json.loads(r[6] or r[7])["id"]),
                json.loads(r[6])["val"] if r[6] else None,
            )
            for r in raw
        ]
        return spark_.createDataFrame(
            rows,
            "id LONG, action STRING, table_name STRING, pk LONG, val STRING",
        )

    try:
        for stmt in setup_ddl(schema):
            ctl._simple_query(stmt)
        ctl._simple_query(
            f"CREATE TABLE {src} (id bigint PRIMARY KEY, val text)"
        )
        ctl._simple_query(
            f"""
            CREATE FUNCTION {schema}.wp_audit() RETURNS trigger AS $$
            BEGIN
              IF TG_OP = 'DELETE' THEN
                INSERT INTO {schema}.changesets
                  (action, schema_name, table_name, old_values)
                VALUES (TG_OP, TG_TABLE_SCHEMA, TG_TABLE_NAME, row_to_json(OLD));
                RETURN OLD;
              END IF;
              INSERT INTO {schema}.changesets
                (action, schema_name, table_name, new_values, old_values)
              VALUES (TG_OP, TG_TABLE_SCHEMA, TG_TABLE_NAME, row_to_json(NEW),
                      CASE WHEN TG_OP = 'UPDATE' THEN row_to_json(OLD) END);
              RETURN NEW;
            END $$ LANGUAGE plpgsql;
            CREATE TRIGGER wp_audit_t AFTER INSERT OR UPDATE OR DELETE
              ON {src} FOR EACH ROW EXECUTE FUNCTION {schema}.wp_audit()
            """
        )
        sink = ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"])
        poller = KeysetPoller(
            spark, live_fetch, sink, str(tmp_path / "off.json"), limit=100
        )

        def live_state():
            return {
                (int(r[0]), r[1])
                for r in ctl._simple_query(f"SELECT id, val FROM {src}")
            }

        def sink_state():
            return {
                (r["pk"], r["val"])
                for r in sink.read_state().select("pk", "val").collect()
            }

        # round 1: three inserts
        ctl._simple_query(f"INSERT INTO {src} VALUES (1,'a'), (2,'b'), (3,'c')")
        assert poller.poll_once() == 3
        assert sink_state() == live_state() == {(1, "a"), (2, "b"), (3, "c")}

        # round 2: update + delete + insert land between polls
        ctl._simple_query(
            f"UPDATE {src} SET val='b2' WHERE id=2; "
            f"DELETE FROM {src} WHERE id=1; "
            f"INSERT INTO {src} VALUES (4,'d')"
        )
        assert poller.poll_once() == 3
        assert sink_state() == live_state() == {(2, "b2"), (3, "c"), (4, "d")}

        # offset sits at the real BIGSERIAL high watermark
        (hw,) = ctl._simple_query(
            f"SELECT max(id) FROM {schema}.changesets"
        )[0]
        assert poller.committed_offset() == int(hw)

        # a RESTARTED poller resumes from the durable offset: drained
        poller2 = KeysetPoller(
            spark, live_fetch, sink, str(tmp_path / "off.json"), limit=100
        )
        assert poller2.poll_once() == 0
    finally:
        for stmt in teardown_ddl(schema):
            ctl._simple_query(stmt)


def test_live_merge_statement_executes_on_postgres(live, spark):
    """A1-A3 via real SQL MERGE: batch_winners folds each micro-batch
    to one row per pk (tombstones kept), the winners land in a real
    source table, and merge_statement(dialect='ansi') EXECUTES on
    PostgreSQL 15 — conditional MATCHED DELETE/UPDATE with id recency,
    conditional NOT MATCHED INSERT, null-safe key equality. Two
    batches, including a STALE redelivered row that must lose the
    recency guard, then the target equals the replay oracle."""
    from pyspark.sql import functions as F

    from warp_pipe_spark.apply import replay
    from warp_pipe_spark.merge_sink import batch_winners, merge_statement

    ctl, _, _ = live
    sch = f"wp_live_merge_{os.getpid()}"
    target, source = f"{sch}.accounts", f"{sch}.winners"
    cs_schema = (
        "id LONG, action STRING, table_name STRING, pk LONG, val STRING"
    )
    batch1 = [
        (1, "INSERT", "accounts", 1, "a"),
        (2, "INSERT", "accounts", 2, "b"),
        (3, "UPDATE", "accounts", 2, "b2"),  # same-batch LWW fold
    ]
    batch2 = [
        (4, "DELETE", "accounts", 1, None),
        (5, "UPDATE", "accounts", 2, "b3"),
        (6, "INSERT", "accounts", 3, "c"),
        (2, "INSERT", "accounts", 2, "b"),  # stale redelivery: id 2 < 5
    ]
    try:
        ctl._simple_query(f"CREATE SCHEMA {sch}")
        ctl._simple_query(
            f"CREATE TABLE {target} (pk bigint PRIMARY KEY, id bigint, val text)"
        )
        ctl._simple_query(
            f"CREATE TABLE {source} (pk bigint, id bigint, action text, val text)"
        )
        stmt = merge_statement(
            target, source, ["pk"], ["val"], dialect="ansi"
        )
        for rows in (batch1, batch2):
            winners = batch_winners(
                spark.createDataFrame(rows, cs_schema), ["pk"]
            ).collect()
            ctl._simple_query(f"TRUNCATE {source}")
            vals = ", ".join(
                "({pk}, {id}, '{action}', {val})".format(
                    pk=w["pk"],
                    id=w["id"],
                    action=w["action"],
                    val="NULL" if w["val"] is None else f"'{w['val']}'",
                )
                for w in winners
            ).replace("'NULL'", "NULL").replace(" NULL,", " NULL,")
            ctl._simple_query(
                f"INSERT INTO {source} (pk, id, action, val) VALUES {vals}"
            )
            ctl._simple_query(stmt)
        got = {
            (int(r[0]), int(r[1]), r[2])
            for r in ctl._simple_query(f"SELECT pk, id, val FROM {target}")
        }
        oracle = replay(
            spark.createDataFrame(batch1 + batch2, cs_schema), ["pk"]
        ).select("pk", "id", "val")
        expect = {(r["pk"], r["id"], r["val"]) for r in oracle.collect()}
        assert got == expect == {(2, 5, "b3"), (3, 6, "c")}
    finally:
        ctl._simple_query(f"DROP SCHEMA IF EXISTS {sch} CASCADE")


def test_live_axon_sync_sequences_through_facade(live, spark):
    """A5/A6 through the Axon facade, live: applied STATE (not the
    source) feeds one aggregation per table, the emitted setval list
    executes on the real server via executor=_simple_query, and both
    column-attached and orphan sequences continue from exactly the
    synced values — the reference's per-row round-trips collapsed to
    their fixpoint against real sequences."""
    from warp_pipe_spark.axon import Axon

    ctl, _, _ = live
    pid = os.getpid()
    t_users, t_orders = f"wp_ax_users_{pid}", f"wp_ax_orders_{pid}"
    orphan = f"wp_ax_orphan_{pid}_seq"
    try:
        ctl._simple_query(
            f"CREATE TABLE public.{t_users} (id bigserial PRIMARY KEY, v text); "
            f"CREATE TABLE public.{t_orders} (id bigserial PRIMARY KEY, v text); "
            f"CREATE SEQUENCE public.{orphan}"
        )
        # applied state as the CDC apply would leave it: map-form keeps
        # values as STRINGS — the '10' vs '9' lexicographic-max trap the
        # cast in column_setval_statements exists for
        state = spark.createDataFrame(
            [(t_users, "10"), (t_users, "9"), (t_orders, "3")],
            "table_name STRING, id STRING",
        )
        ax = Axon(spark)
        stmts = ax.sync_sequences(
            state,
            {
                (t_users, "id"): f"public.{t_users}_id_seq",
                (t_orders, "id"): f"public.{t_orders}_id_seq",
            },
            executor=ctl._simple_query,
            orphan_last_values={f"public.{orphan}": 7},
        )
        assert len(stmts) == 3
        # string-cast guard held: users synced to 10, not '9'
        (n,) = ctl._simple_query(f"SELECT nextval('public.{t_users}_id_seq')")[0]
        assert n == "11"
        (n,) = ctl._simple_query(f"SELECT nextval('public.{t_orders}_id_seq')")[0]
        assert n == "4"
        (n,) = ctl._simple_query(f"SELECT nextval('public.{orphan}')")[0]
        assert n == "8"
        # the synced table keeps inserting without PK collisions
        ctl._simple_query(f"INSERT INTO public.{t_users} (v) VALUES ('x')")
        (mx,) = ctl._simple_query(f"SELECT max(id) FROM public.{t_users}")[0]
        assert mx == "12"
    finally:
        ctl._simple_query(
            f"DROP TABLE IF EXISTS public.{t_users}; "
            f"DROP TABLE IF EXISTS public.{t_orders}; "
            f"DROP SEQUENCE IF EXISTS public.{orphan}"
        )


def test_live_pgoutput_tail_decodes_via_wal2json_path(live, spark, tmp_path):
    """S1 against VANILLA Postgres: a slot on the BUILT-IN pgoutput
    plugin (no .so to install — the capability the wal2json-locked
    reference lacks), a publication over the source table, real DML,
    tail_pgoutput_to_drop_dir assembling one wal2json-shaped JSONL doc
    per committed transaction — and the EXISTING decode_wal2json Spark
    path reads the drop dir unchanged: kinds, column values, oldkeys,
    and monotone per-change ids straight from WAL byte positions."""
    from warp_pipe_spark.decoders import decode_wal2json
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    ctl, _, tbl = live
    pub = f"wp_pub_{os.getpid()}"
    rep = _client(f"wp_live_pgout_{os.getpid()}")
    rep.plugin = "pgoutput"
    rep.connect()
    try:
        ctl._simple_query(
            f"CREATE TABLE {tbl} (id int primary key, val text)"
        )
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        rep.create_slot()
        ctl._simple_query(
            f"INSERT INTO {tbl} VALUES (1, 'a'), (2, 'b'); "
            f"UPDATE {tbl} SET val = 'b2' WHERE id = 2; "
            f"DELETE FROM {tbl} WHERE id = 1"
        )
        drop = str(tmp_path / "drop")
        n = tail_pgoutput_to_drop_dir(
            rep, drop, publication=pub, max_changes=4, idle_timeout_s=10.0
        )
        assert n == 4
        docs = spark.read.text(drop).withColumnRenamed("value", "message")
        out = decode_wal2json(docs).orderBy("id").collect()
        assert [r["kind"] for r in out] == [
            "insert",
            "insert",
            "update",
            "delete",
        ]
        assert all(r["table"] == tbl.lower() for r in out)
        ins = {
            tuple(c["value"] for c in r["new_values"])
            for r in out
            if r["kind"] == "insert"
        }
        assert ins == {("1", "a"), ("2", "b")}
        (upd,) = [r for r in out if r["kind"] == "update"]
        assert [c["value"] for c in upd["new_values"]] == ["2", "b2"]
        (dele,) = [r for r in out if r["kind"] == "delete"]
        # REPLICA IDENTITY DEFAULT: delete carries the pk old-key only
        assert [(c["column"], c["value"]) for c in dele["old_values"]] == [
            ("id", "1")
        ]
        ids = [r["id"] for r in out]
        assert ids == sorted(ids) and len(set(ids)) == 4
        assert rep.flushed_lsn > 0  # delivered-WAL confirmation advanced
    finally:
        try:
            rep.drop_slot()
        except Exception:
            try:
                rep.close()
            except Exception:
                pass
            for _ in range(5):
                try:
                    ctl._simple_query(f"DROP_REPLICATION_SLOT {rep.slot}")
                    break
                except Exception:
                    time.sleep(0.5)
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        try:
            rep.close()
        except Exception:
            pass


def test_live_ingest_dedup_sink_over_real_wal(live, spark, tmp_path):
    """VERDICT r10 item 8: the streaming ingest-dedup composition run
    END-TO-END from a real database — real WAL inserts tail through
    the pgoutput slot into a drop dir, each committed transaction
    becomes one micro-batch (maxFilesPerTrigger=1), the decoded docs
    flow through IngestDedupSink, and the index's candidate view
    surfaces every pair a one-shot batch LSH recompute finds over the
    same documents (later-doc direction), including the cross-batch
    exact dup."""
    from pyspark.sql import functions as F  # noqa: F401

    from warp_pipe_spark.changeset import column_value
    from warp_pipe_spark.datapipe.dedup import minhash_lsh_pairs
    from warp_pipe_spark.datapipe.dedup_index import IngestDedupSink
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir
    from warp_pipe_spark.streaming import wal2json_stream

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy cat again and again today"
    other = "completely different content with no overlap whatsoever in any way"

    ctl, _, tbl = live
    pub = f"wp_pub_dd_{os.getpid()}"
    rep = _client(f"wp_live_dd_{os.getpid()}")
    rep.plugin = "pgoutput"
    rep.connect()
    try:
        ctl._simple_query(
            f"CREATE TABLE {tbl} (doc_id int primary key, body text)"
        )
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        rep.create_slot()
        # two transactions -> two drop-dir files -> two micro-batches;
        # doc 3 is an exact dup of batch-0's doc 1 (cross-batch pair),
        # doc 4 a near-dup
        ctl._simple_query(f"INSERT INTO {tbl} VALUES (1, '{base}'), (2, '{other}')")
        ctl._simple_query(f"INSERT INTO {tbl} VALUES (3, '{base}'), (4, '{near}')")
        drop = str(tmp_path / "drop")
        n = tail_pgoutput_to_drop_dir(
            rep, drop, publication=pub, max_changes=4, idle_timeout_s=10.0
        )
        assert n == 4
        assert len(os.listdir(drop)) == 2  # one file per commit

        docs_stream = wal2json_stream(
            spark, drop, max_files_per_trigger=1
        ).select(
            column_value("new_values", "doc_id").cast("long").alias("doc_id"),
            column_value("new_values", "body").alias("text"),
        )
        idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
        sink = IngestDedupSink(spark, idx, out)
        q = (
            docs_stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["query_id"], r["match_id"])
            for r in sink.candidates().collect()
        }
        assert (3, 1) in got  # the cross-batch exact dup, via the index
        # as-of view vs batch recompute: every pair the one-shot LSH
        # finds over the full corpus is surfaced in later-doc direction
        corpus = spark.createDataFrame(
            [(1, base), (2, other), (3, base), (4, near)],
            "doc_id LONG, text STRING",
        )
        for r in minhash_lsh_pairs(corpus).collect():
            assert (r["doc_b"], r["doc_a"]) in got
    finally:
        try:
            rep.drop_slot()
        except Exception:
            try:
                rep.close()
            except Exception:
                pass
            for _ in range(5):
                try:
                    ctl._simple_query(f"DROP_REPLICATION_SLOT {rep.slot}")
                    break
                except Exception:
                    time.sleep(0.5)
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        try:
            rep.close()
        except Exception:
            pass


def test_live_pgoutput_v2_streams_in_progress_transaction(live, spark, tmp_path):
    """pgoutput protocol v2 (streamed in-progress transactions, PG 14+)
    against the REAL server: the walsender's logical_decoding_work_mem
    is dropped to 64kB so a 3000-row transaction exceeds it and is
    streamed WHILE RUNNING (S/E blocks with xid-tagged content, then a
    stream-commit) — the assembler must observe real v2 frames, emit
    exactly one wal2json-shaped document at stream-commit, and the
    existing decode path must read it unchanged."""
    from warp_pipe_spark.decoders import decode_wal2json
    from warp_pipe_spark.lr_client import XLogData
    from warp_pipe_spark.pgoutput import PgOutputAssembler

    ctl, _, tbl = live
    pub = f"wp_pub_v2_{os.getpid()}"
    rep = _client(f"wp_live_v2_{os.getpid()}")
    rep.plugin = "pgoutput"
    rep.connect()
    try:
        # the GUC governs the DECODING session = the walsender backend
        rep._simple_query("SET logical_decoding_work_mem = '64kB'")
        ctl._simple_query(
            f"CREATE TABLE {tbl} (doc_id int primary key, body text)"
        )
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        rep.create_slot()
        ctl._simple_query(
            f"INSERT INTO {tbl} "
            "SELECT g, repeat('x', 120) || g::text "
            "FROM generate_series(1, 3000) g"
        )
        asm = PgOutputAssembler(proto_version=2)
        seen = set()
        sock = rep._conn.sock
        prev = sock.gettimeout()
        sock.settimeout(30.0)
        try:
            for msg in rep.start(
                0,
                options={
                    "proto_version": "2",
                    "publication_names": pub,
                    "streaming": "on",
                },
            ):
                if not isinstance(msg, XLogData):
                    continue
                seen.add(msg.payload[:1])
                asm.feed(msg.wal_start, msg.payload)
                if asm.docs:
                    break
        finally:
            try:
                sock.settimeout(prev)
            except OSError:
                pass
        # the transaction was actually STREAMED (v2 frames on the wire),
        # not delivered as a plain post-commit B..C
        assert b"S" in seen and b"E" in seen and b"c" in seen
        (doc,) = asm.docs
        assert len(doc["change"]) == 3000
        out = decode_wal2json(
            spark.createDataFrame(
                [(json.dumps(doc),)], "message STRING"
            )
        )
        assert out.count() == 3000
        ids = [r["id"] for r in out.select("id").orderBy("id").limit(3).collect()]
        assert ids == sorted(ids) and len(set(ids)) == 3
    finally:
        try:
            rep.drop_slot()
        except Exception:
            try:
                rep.close()
            except Exception:
                pass
            for _ in range(5):
                try:
                    ctl._simple_query(f"DROP_REPLICATION_SLOT {rep.slot}")
                    break
                except Exception:
                    time.sleep(0.5)
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        try:
            rep.close()
        except Exception:
            pass


def test_live_listen_notify_wakes_the_poller(live, spark, tmp_path):
    """S2 PUSH mode live — the reference's actual LISTEN/NOTIFY shape
    (notify_listener.go:76-139; trigger pg_notify db/sql.go:70): the
    audit trigger pg_notify()s '<id>_<ts>' on commit, a DEDICATED plain
    (non-replication) connection LISTENs, the notification wakes the
    KeysetPoller, and the drained state converges to a live SELECT —
    twice, with DML landing between wake-ups."""
    from warp_pipe_spark.jdbc import keyset_query, setup_ddl, teardown_ddl
    from warp_pipe_spark.streaming import (
        KeysetPoller,
        ParquetStateSink,
        notify_driven_drain,
        parse_notify_payload,
    )

    ctl, _, _ = live
    schema = f"wp_live_notify_{os.getpid()}"
    src = f"{schema}.accounts"
    channel = f"wp_new_cs_{os.getpid()}"

    listener = _client(f"{schema}_listen")
    listener.connect(replication=False)  # plain backend: LISTEN target

    def live_fetch(spark_, last_id, limit):
        raw = ctl._simple_query(
            keyset_query(f"{schema}.changesets", last_id, limit)
        )
        rows = [
            (
                int(r[0]), r[2], r[4],
                int(json.loads(r[6] or r[7])["id"]),
                json.loads(r[6])["val"] if r[6] else None,
            )
            for r in raw
        ]
        return spark_.createDataFrame(
            rows, "id LONG, action STRING, table_name STRING, pk LONG, val STRING"
        )

    try:
        for stmt in setup_ddl(schema):
            ctl._simple_query(stmt)
        ctl._simple_query(f"CREATE TABLE {src} (id bigint PRIMARY KEY, val text)")
        ctl._simple_query(
            f"""
            CREATE FUNCTION {schema}.wp_audit() RETURNS trigger AS $$
            BEGIN
              INSERT INTO {schema}.changesets
                (action, schema_name, table_name, new_values, old_values)
              VALUES (TG_OP, TG_TABLE_SCHEMA, TG_TABLE_NAME, row_to_json(NEW),
                      CASE WHEN TG_OP = 'UPDATE' THEN row_to_json(OLD) END);
              PERFORM pg_notify('{channel}',
                currval('{schema}.changesets_id_seq')::TEXT || '_' ||
                current_timestamp::TEXT);
              RETURN NEW;
            END $$ LANGUAGE plpgsql;
            CREATE TRIGGER wp_audit_t AFTER INSERT OR UPDATE
              ON {src} FOR EACH ROW EXECUTE FUNCTION {schema}.wp_audit()
            """
        )
        sink = ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"])
        poller = KeysetPoller(
            spark, live_fetch, sink, str(tmp_path / "off.json"), limit=100
        )
        listener.listen(channel)

        # round 1: a 2-row commit fires 2 notifications; the FIRST
        # wake-up drains both rows (batch catch-up)
        ctl._simple_query(f"INSERT INTO {src} VALUES (1,'a'), (2,'b')")
        note = listener.wait_for_notification(timeout_s=15.0)
        cid, _ts = parse_notify_payload(note.payload)
        assert note.channel == channel and cid >= 1
        assert poller.run_until_drained() == 2
        assert poller.committed_offset() >= cid
        # drain the second (already-satisfied) notification off the wire
        listener.wait_for_notification(timeout_s=15.0)

        # round 2 through the composed helper: DML → notify → drain
        ctl._simple_query(f"UPDATE {src} SET val = 'a2' WHERE id = 1")
        n = notify_driven_drain(
            listener, poller, channel=channel,
            max_notifications=1, notify_timeout_s=15.0,
        )
        assert n == 1
        got = {
            (r["pk"], r["val"])
            for r in sink.read_state().select("pk", "val").collect()
        }
        live_rows = {
            (int(r[0]), r[1])
            for r in ctl._simple_query(f"SELECT id, val FROM {src}")
        }
        assert got == live_rows == {(1, "a2"), (2, "b")}
    finally:
        try:
            listener.close()
        except Exception:
            pass
        for stmt in teardown_ddl(schema):
            try:
                ctl._simple_query(stmt)
            except Exception:
                pass


def test_live_pgoutput_v3_two_phase_commit(live, spark, tmp_path):
    """pgoutput protocol v3 against the REAL server: a TWO_PHASE slot +
    proto 3 negotiation, PREPARE TRANSACTION holds the changes under
    their gid (nothing emitted), COMMIT PREPARED emits the document —
    and a second prepared transaction that ROLLBACK PREPAREDs is never
    seen downstream. Requires max_prepared_transactions > 0
    (tools/live_pg.sh provisions 8)."""
    from warp_pipe_spark.decoders import decode_wal2json
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    ctl, _, tbl = live
    n_prep = ctl._simple_query("SHOW max_prepared_transactions")
    if int(n_prep[0][0]) == 0:
        pytest.skip("server has max_prepared_transactions=0")
    pub = f"wp_pub_2pc_{os.getpid()}"
    rep = _client(f"wp_live_2pc_{os.getpid()}")
    rep.plugin = "pgoutput"
    rep.connect()
    gid_c, gid_r = f"wp2pc_c_{os.getpid()}", f"wp2pc_r_{os.getpid()}"
    try:
        ctl._simple_query(
            f"CREATE TABLE {tbl} (id int primary key, val text)"
        )
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        rep.create_slot(two_phase=True)
        ctl._simple_query(
            f"BEGIN; INSERT INTO {tbl} VALUES (1, 'kept'); "
            f"PREPARE TRANSACTION '{gid_c}'"
        )
        ctl._simple_query(
            f"BEGIN; INSERT INTO {tbl} VALUES (2, 'aborted'); "
            f"PREPARE TRANSACTION '{gid_r}'"
        )
        ctl._simple_query(f"ROLLBACK PREPARED '{gid_r}'")
        ctl._simple_query(f"COMMIT PREPARED '{gid_c}'")
        drop = str(tmp_path / "drop")
        n = tail_pgoutput_to_drop_dir(
            rep, drop, publication=pub, max_changes=1,
            idle_timeout_s=10.0, proto_version=3,
        )
        assert n == 1  # the rolled-back prepared insert was un-counted
        docs = spark.read.text(drop).withColumnRenamed("value", "message")
        out = decode_wal2json(docs).collect()
        assert [(r["kind"], r["table"]) for r in out] == [("insert", tbl.lower())]
        assert [c["value"] for c in out[0]["new_values"]] == ["1", "kept"]
    finally:
        try:
            rep.drop_slot()
        except Exception:
            try:
                rep.close()
            except Exception:
                pass
            for _ in range(5):
                try:
                    ctl._simple_query(f"DROP_REPLICATION_SLOT {rep.slot}")
                    break
                except Exception:
                    time.sleep(0.5)
        for gid in (gid_c, gid_r):
            try:
                ctl._simple_query(f"ROLLBACK PREPARED '{gid}'")
            except Exception:
                pass
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        try:
            rep.close()
        except Exception:
            pass


def test_live_two_phase_restart_redelivers_prepared(live, spark, tmp_path):
    """The confirm-floor crash-safety pin made EMPIRICAL (VERDICT r11
    item 7): a tail that dies between PREPARE TRANSACTION and COMMIT
    PREPARED must leave the slot's confirmed LSN below the prepare's
    first frame, so a restarted tail gets the whole prepared
    transaction REDELIVERED and emits the document when the commit
    arrives — twice over (insert-prepare-crash-commit, then
    update-prepare-crash-commit on the same key), with the LWW fold of
    the accumulated drop dir converging to the live table. A broken
    floor fails loudly here: the restarted tail would see
    commit-prepared for an unknown gid and raise."""
    from warp_pipe_spark.decoders import decode_wal2json
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    ctl, _, tbl = live
    n_prep = ctl._simple_query("SHOW max_prepared_transactions")
    if int(n_prep[0][0]) == 0:
        pytest.skip("server has max_prepared_transactions=0")
    pub = f"wp_pub_2pcr_{os.getpid()}"
    slot = f"wp_live_2pcr_{os.getpid()}"
    gid1, gid2 = f"wp2pcr_a_{os.getpid()}", f"wp2pcr_b_{os.getpid()}"
    drop = str(tmp_path / "drop")
    tails = []

    def fresh_tail():
        # a crashed/closed tail's walsender may hold the slot ACTIVE
        # for a beat after the socket drops; a reconnect inside that
        # window fails with "slot is active for PID" — wait it out
        for _ in range(20):
            rows = ctl._simple_query(
                "SELECT active FROM pg_replication_slots "
                f"WHERE slot_name = '{slot}'"
            )
            if not rows or rows[0][0] in ("f", "false", False):
                break
            time.sleep(0.25)
        c = _client(slot)
        c.plugin = "pgoutput"
        c.connect()
        tails.append(c)
        return c

    rep1 = fresh_tail()
    try:
        ctl._simple_query(
            f"CREATE TABLE {tbl} (id int primary key, val text)"
        )
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        rep1.create_slot(two_phase=True)

        # crash point 1: the tail consumes the PREPARE frames (buffered,
        # nothing emitted, confirm capped below the prepare) and dies
        ctl._simple_query(
            f"BEGIN; INSERT INTO {tbl} VALUES (1, 'v1'); "
            f"PREPARE TRANSACTION '{gid1}'"
        )
        n1 = tail_pgoutput_to_drop_dir(
            rep1, drop, publication=pub,
            idle_timeout_s=8.0, proto_version=3,
        )
        assert n1 == 0  # undecided prepared changes are not "written"
        rep1.close()
        ctl._simple_query(f"COMMIT PREPARED '{gid1}'")

        # restart: the server must redeliver gid1's whole transaction
        # (confirmed-flush pinned below it) and the commit emits it
        rep2 = fresh_tail()
        n2 = tail_pgoutput_to_drop_dir(
            rep2, drop, publication=pub,
            idle_timeout_s=8.0, proto_version=3,
        )
        assert n2 == 1

        rep2.close()

        # crash point 2: same dance with an UPDATE of the same key —
        # the prior tail's confirm already advanced past gid1, so this
        # pins that the floor re-arms per prepared transaction (a
        # FRESH connection per tail: a returned tail's socket is still
        # in CopyBoth, exactly like a crashed process's)
        ctl._simple_query(
            f"BEGIN; UPDATE {tbl} SET val = 'v2' WHERE id = 1; "
            f"PREPARE TRANSACTION '{gid2}'"
        )
        rep2b = fresh_tail()
        n2b = tail_pgoutput_to_drop_dir(
            rep2b, drop, publication=pub,
            idle_timeout_s=8.0, proto_version=3,
        )
        assert n2b == 0
        rep2b.close()
        ctl._simple_query(f"COMMIT PREPARED '{gid2}'")

        rep3 = fresh_tail()
        n3 = tail_pgoutput_to_drop_dir(
            rep3, drop, publication=pub,
            idle_timeout_s=8.0, proto_version=3,
        )
        assert n3 == 1

        # LWW fold of everything the crashed-and-restarted tails wrote
        # == the live table (the sink-convergence claim, empirical)
        docs = spark.read.text(drop).withColumnRenamed("value", "message")
        out = decode_wal2json(docs).collect()
        # exactly one insert then one update (hex LSN strings don't
        # sort lexicographically across length changes — order by kind,
        # which this fixture makes unambiguous)
        assert sorted((r["kind"], r["table"]) for r in out) == [
            ("insert", tbl.lower()),
            ("update", tbl.lower()),
        ]
        last = [r for r in out if r["kind"] == "update"][0]
        folded = {c["column"]: c["value"] for c in last["new_values"]}
        live_rows = ctl._simple_query(f"SELECT id, val FROM {tbl}")
        assert [(folded["id"], folded["val"])] == [
            (r[0], r[1]) for r in live_rows
        ] == [("1", "v2")]
    finally:
        closer = tails[-1]
        try:
            closer.drop_slot()
        except Exception:
            try:
                closer.close()
            except Exception:
                pass
            for _ in range(5):
                try:
                    ctl._simple_query(f"DROP_REPLICATION_SLOT {slot}")
                    break
                except Exception:
                    time.sleep(0.5)
        for gid in (gid1, gid2):
            try:
                ctl._simple_query(f"ROLLBACK PREPARED '{gid}'")
            except Exception:
                pass
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        for c in tails:
            try:
                c.close()
            except Exception:
                pass


def test_live_stream_prepare_restart_redelivers(live, spark, tmp_path):
    """VERDICT r12 item 7: the restart-redelivery soak for the
    STREAMED two-phase path. The walsender's logical_decoding_work_mem
    drops to 64kB so a 3000-row transaction is streamed WHILE RUNNING
    (S/E blocks), then PREPARE TRANSACTION arrives as a
    stream-prepare ('p') frame — the crash case the plain-PREPARE soak
    above cannot reach: the prepared changes live xid-keyed in the
    stream buffers until 'p' moves them under the gid, and the confirm
    floor must pin to the FIRST streamed change. A tail that consumes
    the whole streamed prepare and dies must leave the slot
    redeliverable: the restarted tail emits the full document when
    COMMIT PREPARED arrives and the drop dir converges to the live
    table."""
    from warp_pipe_spark.decoders import decode_wal2json
    from warp_pipe_spark.lr_client import XLogData
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    ctl, _, tbl = live
    n_prep = ctl._simple_query("SHOW max_prepared_transactions")
    if int(n_prep[0][0]) == 0:
        pytest.skip("server has max_prepared_transactions=0")
    pub = f"wp_pub_sp_{os.getpid()}"
    slot = f"wp_live_sp_{os.getpid()}"
    gid = f"wpsp_{os.getpid()}"
    drop = str(tmp_path / "drop")
    tails = []

    def fresh_tail():
        for _ in range(20):
            rows = ctl._simple_query(
                "SELECT active FROM pg_replication_slots "
                f"WHERE slot_name = '{slot}'"
            )
            if not rows or rows[0][0] in ("f", "false", False):
                break
            time.sleep(0.25)
        c = _client(slot)
        c.plugin = "pgoutput"
        c.connect()
        # governs THIS walsender's decode session: 3000 rows exceed
        # 64kB and stream instead of spooling to a post-prepare block
        c._simple_query("SET logical_decoding_work_mem = '64kB'")
        tails.append(c)
        return c

    def spy(client, seen: set):
        orig = client.start

        def start_spy(start_lsn, options=None):
            for m in orig(start_lsn, options=options):
                if isinstance(m, XLogData):
                    seen.add(m.payload[:1])
                yield m

        client.start = start_spy

    rep1 = fresh_tail()
    try:
        ctl._simple_query(
            f"CREATE TABLE {tbl} (id int primary key, val text)"
        )
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        rep1.create_slot(two_phase=True)

        ctl._simple_query(
            f"BEGIN; INSERT INTO {tbl} "
            "SELECT g, repeat('y', 120) || g::text "
            "FROM generate_series(1, 3000) g; "
            f"PREPARE TRANSACTION '{gid}'"
        )
        seen1: set = set()
        spy(rep1, seen1)
        n1 = tail_pgoutput_to_drop_dir(
            rep1, drop, publication=pub,
            idle_timeout_s=8.0, proto_version=3,
        )
        assert n1 == 0  # undecided prepared changes are not "written"
        # the transaction really took the streamed-2PC wire shape
        assert b"S" in seen1 and b"E" in seen1 and b"p" in seen1, seen1
        rep1.close()  # crash between stream-prepare and commit-prepared
        ctl._simple_query(f"COMMIT PREPARED '{gid}'")

        # restart: the floor must have pinned below the streamed
        # transaction's first change, so the server redelivers ALL of
        # it and commit-prepared emits the full document
        rep2 = fresh_tail()
        seen2: set = set()
        spy(rep2, seen2)
        n2 = tail_pgoutput_to_drop_dir(
            rep2, drop, publication=pub,
            idle_timeout_s=8.0, proto_version=3,
        )
        assert n2 == 3000, n2
        assert b"K" in seen2, seen2  # commit-prepared on the wire

        docs = spark.read.text(drop).withColumnRenamed("value", "message")
        out = decode_wal2json(docs)
        assert out.count() == 3000
        assert out.filter("kind <> 'insert'").count() == 0
        live_n = ctl._simple_query(f"SELECT count(*) FROM {tbl}")
        assert int(live_n[0][0]) == 3000
    finally:
        closer = tails[-1]
        try:
            closer.drop_slot()
        except Exception:
            try:
                closer.close()
            except Exception:
                pass
            for _ in range(5):
                try:
                    ctl._simple_query(f"DROP_REPLICATION_SLOT {slot}")
                    break
                except Exception:
                    time.sleep(0.5)
        try:
            ctl._simple_query(f"ROLLBACK PREPARED '{gid}'")
        except Exception:
            pass
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        for c in tails:
            try:
                c.close()
            except Exception:
                pass


def test_live_snapshot_bootstrap_is_gap_free(live, spark, tmp_path):
    """Gap-free CDC bootstrap, live: CREATE_REPLICATION_SLOT ...
    EXPORT_SNAPSHOT gives a consistent point + snapshot name; a
    concurrent commit lands AFTER the slot; the snapshot read (plain
    connection, SET TRANSACTION SNAPSHOT) sees exactly the pre-slot
    rows even though the later commit is visible to a normal read,
    and the tail from the consistent point delivers exactly the
    post-slot change — union complete, intersection empty. This is
    the initial-load+CDC guarantee the reference's since-id backfill
    (store.go) cannot make."""
    from warp_pipe_spark.decoders import decode_wal2json
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    ctl, _, tbl = live
    pub = f"wp_pub_snap_{os.getpid()}"
    rep = _client(f"wp_live_snap_{os.getpid()}")
    rep.plugin = "pgoutput"
    rep.connect()
    reader = _client(f"wp_live_snapread_{os.getpid()}")
    reader.connect(replication=False)
    try:
        ctl._simple_query(f"CREATE TABLE {tbl} (id int primary key, val text)")
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        ctl._simple_query(f"INSERT INTO {tbl} VALUES (1,'pre'), (2,'pre')")
        lsn, snap = rep.create_slot_with_snapshot()
        assert lsn > 0 and snap
        # a commit AFTER the consistent point, visible to normal reads
        ctl._simple_query(f"INSERT INTO {tbl} VALUES (3,'post')")
        normal = reader._simple_query(f"SELECT id FROM {tbl} ORDER BY id")
        assert [int(r[0]) for r in normal] == [1, 2, 3]
        # ...but NOT to the exported snapshot
        snap_rows = reader.snapshot_read(
            snap, f"SELECT id, val FROM {tbl} ORDER BY id"
        )
        assert [(int(r[0]), r[1]) for r in snap_rows] == [(1, "pre"), (2, "pre")]
        # the tail from the consistent point delivers EXACTLY the
        # post-slot change — no gap, no overlap with the snapshot
        drop = str(tmp_path / "drop")
        n = tail_pgoutput_to_drop_dir(
            rep, drop, publication=pub, start_lsn=lsn,
            max_changes=1, idle_timeout_s=10.0,
        )
        assert n == 1
        docs = spark.read.text(drop).withColumnRenamed("value", "message")
        out = decode_wal2json(docs).collect()
        assert [(r["kind"],) for r in out] == [("insert",)]
        assert [c["value"] for c in out[0]["new_values"]] == ["3", "post"]
    finally:
        try:
            reader.close()
        except Exception:
            pass
        try:
            rep.drop_slot()
        except Exception:
            try:
                rep.close()
            except Exception:
                pass
            for _ in range(5):
                try:
                    ctl._simple_query(f"DROP_REPLICATION_SLOT {rep.slot}")
                    break
                except Exception:
                    time.sleep(0.5)
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        try:
            rep.close()
        except Exception:
            pass


def test_live_logical_messages_flow_through_the_tail(live, spark, tmp_path):
    """pg_logical_emit_message against the REAL server: a transactional
    message rides its transaction's document (the outbox pattern), a
    non-transactional one emits standalone, and both reach the decode
    path as kind='message' with prefix/content columns."""
    from warp_pipe_spark.decoders import decode_wal2json
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    ctl, _, tbl = live
    pub = f"wp_pub_msg_{os.getpid()}"
    rep = _client(f"wp_live_msg_{os.getpid()}")
    rep.plugin = "pgoutput"
    rep.connect()
    try:
        ctl._simple_query(f"CREATE TABLE {tbl} (id int primary key)")
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        rep.create_slot()
        ctl._simple_query(
            "SELECT pg_logical_emit_message(false, 'marker', 'standalone')"
        )
        ctl._simple_query(
            f"BEGIN; INSERT INTO {tbl} VALUES (1); "
            "SELECT pg_logical_emit_message(true, 'outbox', 'evt-1'); "
            "COMMIT"
        )
        drop = str(tmp_path / "drop")
        n = tail_pgoutput_to_drop_dir(
            rep, drop, publication=pub, max_changes=3,
            idle_timeout_s=10.0, messages=True,
        )
        assert n == 3
        # structure, not global order (a non-transactional message's
        # delivery position relative to other commits is the server's
        # business): the transactional message must share its
        # transaction's DOCUMENT with the insert (the outbox contract);
        # the standalone one must be a document of its own
        raw_docs = []
        for fn in sorted(os.listdir(drop)):
            with open(os.path.join(drop, fn)) as f:
                raw_docs += [json.loads(ln) for ln in f.read().splitlines()]
        by_kinds = {tuple(c["kind"] for c in d["change"]) for d in raw_docs}
        assert by_kinds == {("message",), ("insert", "message")}

        out = decode_wal2json(
            spark.read.text(drop).withColumnRenamed("value", "message")
        ).collect()

        def cols(r):
            return {c["column"]: c["value"] for c in r["new_values"]}

        msgs = {
            cols(r)["prefix"]: bytes.fromhex(cols(r)["content"][2:])
            for r in out
            if r["kind"] == "message"
        }
        assert msgs == {"marker": b"standalone", "outbox": b"evt-1"}
        assert all(r["table"] is None for r in out if r["kind"] == "message")
    finally:
        try:
            rep.drop_slot()
        except Exception:
            try:
                rep.close()
            except Exception:
                pass
            for _ in range(5):
                try:
                    ctl._simple_query(f"DROP_REPLICATION_SLOT {rep.slot}")
                    break
                except Exception:
                    time.sleep(0.5)
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        try:
            rep.close()
        except Exception:
            pass


def test_live_slot_lag_query_reads_real_slot_health(live):
    """The monitoring SQL against real pg_replication_slots: the
    created slot shows up with sane LSNs and non-negative retained-WAL
    numbers, and the single-slot filter narrows to it."""
    from warp_pipe_spark.jdbc import slot_lag_query

    ctl, rep, _ = live
    rep.create_slot()
    try:
        rows = ctl._simple_query(slot_lag_query(rep.slot))
        assert len(rows) == 1
        (name, plugin, stype, active, _pid, restart, confirmed,
         retained, confirm_lag) = rows[0]
        assert name == rep.slot and stype == "logical"
        assert plugin == rep.plugin
        assert restart and confirmed  # real LSN text
        assert int(retained) >= 0 and int(confirm_lag) >= 0
        # WAL written after the slot grows its retention number
        ctl._simple_query("SELECT pg_logical_emit_message(false, 'x', 'y')")
        ctl._simple_query("CHECKPOINT")
        rows2 = ctl._simple_query(slot_lag_query(rep.slot))
        assert int(rows2[0][7]) >= int(retained)
    finally:
        try:
            rep.drop_slot()
        except Exception:
            pass


def test_live_publication_row_filter_prunes_at_the_server(live, spark, tmp_path):
    """PG 15 publication row filters: the server itself drops rows
    failing the publication's WHERE — our tail sees only the matching
    changes, the cheapest possible source-side pushdown (P8's
    source-filter idea executed INSIDE the database)."""
    from warp_pipe_spark.decoders import decode_wal2json
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    ctl, _, tbl = live
    pub = f"wp_pub_rf_{os.getpid()}"
    rep = _client(f"wp_live_rf_{os.getpid()}")
    rep.plugin = "pgoutput"
    rep.connect()
    try:
        ctl._simple_query(f"CREATE TABLE {tbl} (id int primary key, val text)")
        ctl._simple_query(
            f"CREATE PUBLICATION {pub} FOR TABLE {tbl} WHERE (val <> 'skip')"
        )
        rep.create_slot()
        ctl._simple_query(
            f"INSERT INTO {tbl} VALUES (1,'keep'), (2,'skip'), (3,'keep')"
        )
        drop = str(tmp_path / "drop")
        n = tail_pgoutput_to_drop_dir(
            rep, drop, publication=pub, max_changes=2, idle_timeout_s=10.0
        )
        assert n == 2  # the filtered row never crossed the wire
        out = decode_wal2json(
            spark.read.text(drop).withColumnRenamed("value", "message")
        ).orderBy("id").collect()
        ids = [
            {c["column"]: c["value"] for c in r["new_values"]}["id"]
            for r in out
        ]
        assert ids == ["1", "3"]
    finally:
        try:
            rep.drop_slot()
        except Exception:
            try:
                rep.close()
            except Exception:
                pass
            for _ in range(5):
                try:
                    ctl._simple_query(f"DROP_REPLICATION_SLOT {rep.slot}")
                    break
                except Exception:
                    time.sleep(0.5)
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        try:
            rep.close()
        except Exception:
            pass


def test_live_bootstrap_then_tail_converges_to_live_table(live, spark, tmp_path):
    """The full product story in one live run: snapshot bootstrap seeds
    ParquetStateSink (seed rows at id=0 — below every WAL position),
    post-slot DML tails from the consistent point through the pgoutput
    decode into the same sink, and the final state equals a live SELECT
    — exactly-once initial-load+CDC, no gap, no double-apply."""
    from pyspark.sql import functions as F

    from warp_pipe_spark.changeset import column_value
    from warp_pipe_spark.decoders import decode_wal2json
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir
    from warp_pipe_spark.streaming import ParquetStateSink

    ctl, _, tbl = live
    pub = f"wp_pub_boot_{os.getpid()}"
    rep = _client(f"wp_live_boot_{os.getpid()}")
    rep.plugin = "pgoutput"
    rep.connect()
    reader = _client(f"wp_live_bootread_{os.getpid()}")
    reader.connect(replication=False)
    try:
        ctl._simple_query(f"CREATE TABLE {tbl} (id int primary key, val text)")
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        ctl._simple_query(f"INSERT INTO {tbl} VALUES (1,'a'), (2,'b')")
        lsn, snap = rep.create_slot_with_snapshot()
        # concurrent DML lands AFTER the slot: an update of a seeded
        # row, a delete of the other, and a fresh insert
        ctl._simple_query(
            f"UPDATE {tbl} SET val='a2' WHERE id=1; "
            f"DELETE FROM {tbl} WHERE id=2; "
            f"INSERT INTO {tbl} VALUES (3,'c')"
        )
        # phase 1: bootstrap — snapshot rows seed the sink at id=0
        seed_rows = reader.snapshot_read(snap, f"SELECT id, val FROM {tbl}")
        seed = spark.createDataFrame(
            [(0, "INSERT", tbl, int(r[0]), r[1]) for r in seed_rows],
            "id LONG, action STRING, table_name STRING, pk LONG, val STRING",
        )
        sink = ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"])
        sink.apply_batch(seed, batch_id=0)
        # phase 2: tail from the consistent point, apply the changes
        drop = str(tmp_path / "drop")
        n = tail_pgoutput_to_drop_dir(
            rep, drop, publication=pub, start_lsn=lsn,
            max_changes=3, idle_timeout_s=10.0,
        )
        assert n == 3
        decoded = decode_wal2json(
            spark.read.text(drop).withColumnRenamed("value", "message")
        )
        typed = decoded.select(
            "id",
            F.col("kind").alias("action"),
            F.col("table").alias("table_name"),
            F.coalesce(
                column_value("new_values", "id"),
                F.element_at(
                    F.filter(
                        F.col("old_values"), lambda x: x["column"] == "id"
                    ), 1,
                )["value"],
            ).cast("long").alias("pk"),
            column_value("new_values", "val").alias("val"),
        )
        sink.apply_batch(typed, batch_id=1)
        got = {
            (r["pk"], r["val"])
            for r in sink.read_state().select("pk", "val").collect()
        }
        live_rows = {
            (int(r[0]), r[1])
            for r in ctl._simple_query(f"SELECT id, val FROM {tbl}")
        }
        assert got == live_rows == {(1, "a2"), (3, "c")}
    finally:
        try:
            reader.close()
        except Exception:
            pass
        try:
            rep.drop_slot()
        except Exception:
            try:
                rep.close()
            except Exception:
                pass
            for _ in range(5):
                try:
                    ctl._simple_query(f"DROP_REPLICATION_SLOT {rep.slot}")
                    break
                except Exception:
                    time.sleep(0.5)
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        try:
            rep.close()
        except Exception:
            pass


def test_live_cli_bootstrap_then_tail(live, tmp_path, capsys):
    """The gap-free bootstrap from the SHELL: one live-tail invocation
    creates the snapshot slot, writes the row_to_json seed, and tails
    the post-slot change from the consistent point."""
    from warp_pipe_spark.__main__ import main

    ctl, _, tbl = live
    pub = f"wp_pub_clib_{os.getpid()}"
    slot = f"wp_live_clib_{os.getpid()}"
    u = urllib.parse.urlsplit(os.environ["WP_LIVE_PG_DSN"])
    try:
        ctl._simple_query(f"CREATE TABLE {tbl} (id int primary key, val text)")
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        ctl._simple_query(f"INSERT INTO {tbl} VALUES (1,'pre')")
        # NOTE: the post-slot insert must land AFTER the CLI created
        # the slot — but the CLI runs to completion in one call, so
        # emit it from a trigger-free helper: a second session issuing
        # the insert after a short delay would race. Instead rely on
        # the idle-timeout drain with max-messages=1 and insert the
        # post row BEFORE invoking the CLI? That would leak it into
        # the snapshot. So: spawn a thread that inserts after the
        # seed file appears.
        import threading

        seed_path = str(tmp_path / "seed.jsonl")

        def insert_after_seed():
            for _ in range(200):
                if os.path.exists(seed_path):
                    break
                time.sleep(0.05)
            ctl2 = _client(slot + "_dml")
            ctl2.connect()
            try:
                ctl2._simple_query(f"INSERT INTO {tbl} VALUES (2,'post')")
            finally:
                ctl2.close()

        t = threading.Thread(target=insert_after_seed, daemon=True)
        t.start()
        drop = str(tmp_path / "drop")
        rc = main(
            [
                "live-tail",
                "--host", u.hostname or "127.0.0.1",
                "--port", str(u.port or 5432),
                "--dbname", (u.path or "/postgres").lstrip("/") or "postgres",
                "--user", u.username or "postgres",
                "--slot", slot, "--plugin", "pgoutput",
                "--publication", pub, "--drop-dir", drop,
                "--bootstrap-table", tbl, "--bootstrap-out", seed_path,
                "--max-messages", "1", "--idle-timeout", "20",
            ]
        )
        t.join(30)
        assert rc == 0
        status = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert status["bootstrap_rows"] == 1 and status["start_lsn"] > 0
        with open(seed_path) as f:
            seed = [json.loads(ln) for ln in f.read().splitlines()]
        assert seed == [{"id": 1, "val": "pre"}]
        tailed = []
        for fn in sorted(os.listdir(drop)):
            with open(os.path.join(drop, fn)) as f:
                tailed += [json.loads(ln) for ln in f.read().splitlines()]
        vals = [c["columnvalues"] for d in tailed for c in d["change"]]
        assert vals == [["2", "post"]]  # exactly the post-slot change
    finally:
        helper = _client(slot + "_cleanup")
        helper.connect()
        try:
            for _ in range(5):
                try:
                    helper._simple_query(f"DROP_REPLICATION_SLOT {slot}")
                    break
                except Exception:
                    time.sleep(0.5)
            try:
                helper._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
            except Exception:
                pass
        finally:
            helper.close()


def test_live_schema_change_mid_tail(live, spark, tmp_path):
    """Mid-stream schema evolution through pgoutput: the server sends a
    fresh Relation message after ALTER TABLE ADD COLUMN, so changes
    before the ALTER carry 2 columns and changes after carry 3 — the
    decoder re-registers the relation and the additive-evolution apply
    contract (merge_batch unionByName) absorbs the widened rows."""
    from warp_pipe_spark.decoders import decode_wal2json
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    ctl, _, tbl = live
    pub = f"wp_pub_ddl_{os.getpid()}"
    rep = _client(f"wp_live_ddl_{os.getpid()}")
    rep.plugin = "pgoutput"
    rep.connect()
    try:
        ctl._simple_query(f"CREATE TABLE {tbl} (id int primary key, val text)")
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        rep.create_slot()
        ctl._simple_query(f"INSERT INTO {tbl} VALUES (1, 'a')")
        ctl._simple_query(f"ALTER TABLE {tbl} ADD COLUMN extra int")
        ctl._simple_query(f"INSERT INTO {tbl} VALUES (2, 'b', 7)")
        drop = str(tmp_path / "drop")
        n = tail_pgoutput_to_drop_dir(
            rep, drop, publication=pub, max_changes=2, idle_timeout_s=10.0
        )
        assert n == 2
        out = decode_wal2json(
            spark.read.text(drop).withColumnRenamed("value", "message")
        ).orderBy("id").collect()
        pre, post = out

        def cols(r):
            return [(c["column"], c["value"]) for c in r["new_values"]]

        assert cols(pre) == [("id", "1"), ("val", "a")]
        assert cols(post) == [("id", "2"), ("val", "b"), ("extra", "7")]
    finally:
        try:
            rep.drop_slot()
        except Exception:
            try:
                rep.close()
            except Exception:
                pass
            for _ in range(5):
                try:
                    ctl._simple_query(f"DROP_REPLICATION_SLOT {rep.slot}")
                    break
                except Exception:
                    time.sleep(0.5)
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        try:
            rep.close()
        except Exception:
            pass


def test_live_pgoutput_binary_mode_matches_text_mode_bytes(live, tmp_path):
    """`binary 'on'` (PG 14+): TWO slots over the SAME WAL — one tailed
    in text tuple mode, one in binary mode. After the decoder renders
    each binary cell back to the type's canonical text output
    (_binary_to_text), the written JSONL documents must be
    BYTE-IDENTICAL: same WAL-position ids, same nextlsn, same values.
    The value battery deliberately stresses the renderers — float4/8
    shortest-round-trip digits at the fixed/scientific boundaries
    (1e15 vs 1e16, 0.0001 vs 1e-05, -0), numeric base-10000 digit
    groups with leading/trailing-zero scales, timestamp fraction
    trimming, bytea/uuid/jsonb, NULLs, and binary OLD-side key cells —
    so this doubles as the calibration oracle for _pg_float_text's
    formatting window against the server's actual Ryu output."""
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    ctl, _, tbl = live
    pub = f"wp_pub_bin_{os.getpid()}"
    rep_txt = _client(f"wp_live_bint_{os.getpid()}")
    rep_bin = _client(f"wp_live_binb_{os.getpid()}")
    for r in (rep_txt, rep_bin):
        r.plugin = "pgoutput"
        r.connect()
    tz = ctl._simple_query("SHOW timezone")[0][0]
    try:
        ctl._simple_query(
            f"CREATE TABLE {tbl} (id int primary key, i2 smallint,"
            " i8 bigint, f4 real, f8 double precision, num numeric,"
            " t text, by bytea, bo boolean, d date, tm time,"
            " ts timestamp, tsz timestamptz, u uuid, jb jsonb,"
            " ia int[], ta text[], na numeric[])"
        )
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        rep_txt.create_slot()
        rep_bin.create_slot()
        tsz = (
            "TIMESTAMPTZ '2024-01-02 03:04:05.1+00'"
            if tz in ("UTC", "Etc/UTC", "GMT")
            # binary mode renders timestamptz at UTC; a non-UTC
            # walsender session would render text mode in its own zone
            # — keep the column NULL there and let the rest of the
            # battery run
            else "NULL"
        )
        ctl._simple_query(
            f"INSERT INTO {tbl} VALUES"
            " (1, 12, -5, 0.1, 1.0, 12345.6789, 'héllo',"
            f"  E'\\\\x00ff', true, DATE '2024-01-02', TIME '03:00:00.5',"
            f"  TIMESTAMP '2024-01-02 03:04:05.1', {tsz},"
            "  '01234567-89ab-cdef-0123-456789abcdef',"
            "  '{\"a\":1,\"b\":[1,2]}',"
            "  ARRAY[1,NULL,3],"
            "  ARRAY['plain','a b','he\"llo','back\\slash','NULL',''],"
            "  ARRAY[1.50, -0.00123]::numeric[]),"
            " (2, NULL, NULL, 'NaN', -0.0, -0.00123, NULL, NULL, false,"
            "  NULL, NULL, NULL, NULL, NULL, NULL,"
            "  '{}'::int[], NULL, NULL),"
            " (3, 0, 9223372036854775807, 3.14159, 1e15, 5.00, '',"
            "  E'\\\\x', NULL, NULL, TIME '23:59:59.999999',"
            "  TIMESTAMP '2000-01-01 00:00:00', NULL, NULL, NULL,"
            "  ARRAY[[1,2],[3,4]], NULL, NULL),"
            " (4, -32768, -9223372036854775808, 'Infinity', 1e16,"
            "  'NaN', 'x', NULL, NULL, DATE '1999-12-31', NULL,"
            "  NULL, NULL, NULL, NULL, NULL, NULL, NULL),"
            " (5, 1, 2, -0.5, 0.0001, 0, 'y', NULL, NULL, NULL, NULL,"
            "  NULL, NULL, NULL, NULL, NULL, NULL, NULL),"
            " (6, 1, 2, 1e-5, 0.00001, 1000000000.0001, 'z', NULL,"
            "  NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,"
            "  NULL)"
        )
        ctl._simple_query(
            f"UPDATE {tbl} SET f8 = 2.5, num = 7.25 WHERE id = 3; "
            f"DELETE FROM {tbl} WHERE id = 2"
        )
        drops = {}
        for mode, rep in (("text", rep_txt), ("binary", rep_bin)):
            drop = str(tmp_path / f"drop_{mode}")
            n = tail_pgoutput_to_drop_dir(
                rep, drop, publication=pub, max_changes=8,
                idle_timeout_s=10.0, binary=(mode == "binary"),
            )
            assert n == 8, mode
            lines = []
            for name in sorted(os.listdir(drop)):
                with open(os.path.join(drop, name), "rb") as f:
                    lines.extend(f.read().splitlines())
            drops[mode] = lines
        assert len(drops["text"]) == len(drops["binary"])
        for lt, lb in zip(drops["text"], drops["binary"]):
            assert lt == lb
    finally:
        for rep in (rep_txt, rep_bin):
            try:
                rep.drop_slot()
            except Exception:
                try:
                    rep.close()
                except Exception:
                    pass
                for _ in range(5):
                    try:
                        ctl._simple_query(
                            f"DROP_REPLICATION_SLOT {rep.slot}"
                        )
                        break
                    except Exception:
                        time.sleep(0.5)
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        for rep in (rep_txt, rep_bin):
            try:
                rep.close()
            except Exception:
                pass


def test_live_publication_column_list_prunes_at_the_server(live, spark, tmp_path):
    """PG 15 publication COLUMN LISTS: `FOR TABLE t (id, val)` makes
    the server send Relation messages carrying ONLY the listed columns
    — P8's projection pushdown executed inside the database, the
    column analogue of the row-filter test. The decoder must register
    the narrowed relation and emit changes without the unpublished
    column, and an UPDATE touching only an unpublished column still
    arrives (with the published image)."""
    from warp_pipe_spark.decoders import decode_wal2json
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    ctl, _, tbl = live
    pub = f"wp_pub_collist_{os.getpid()}"
    rep = _client(f"wp_live_collist_{os.getpid()}")
    rep.plugin = "pgoutput"
    rep.connect()
    try:
        ctl._simple_query(
            f"CREATE TABLE {tbl} (id int primary key, val text,"
            " secret text)"
        )
        ctl._simple_query(
            f"CREATE PUBLICATION {pub} FOR TABLE {tbl} (id, val)"
        )
        rep.create_slot()
        ctl._simple_query(
            f"INSERT INTO {tbl} VALUES (1, 'a', 'hidden'); "
            f"UPDATE {tbl} SET secret = 'still hidden' WHERE id = 1; "
            f"UPDATE {tbl} SET val = 'a2' WHERE id = 1"
        )
        drop = str(tmp_path / "drop")
        n = tail_pgoutput_to_drop_dir(
            rep, drop, publication=pub, max_changes=3, idle_timeout_s=10.0
        )
        assert n == 3
        out = decode_wal2json(
            spark.read.text(drop).withColumnRenamed("value", "message")
        ).orderBy("id").collect()
        assert [r["kind"] for r in out] == ["insert", "update", "update"]

        def cols(r):
            return [(c["column"], c["value"]) for c in r["new_values"]]

        # the unpublished column never reaches the wire — in ANY change
        assert cols(out[0]) == [("id", "1"), ("val", "a")]
        assert cols(out[1]) == [("id", "1"), ("val", "a")]
        assert cols(out[2]) == [("id", "1"), ("val", "a2")]
    finally:
        try:
            rep.drop_slot()
        except Exception:
            try:
                rep.close()
            except Exception:
                pass
            for _ in range(5):
                try:
                    ctl._simple_query(f"DROP_REPLICATION_SLOT {rep.slot}")
                    break
                except Exception:
                    time.sleep(0.5)
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        try:
            rep.close()
        except Exception:
            pass


def test_live_pgoutput_v2_streaming_with_binary_tuples(live, tmp_path):
    """Options COMPOSE: proto_version=2 (streamed in-progress
    transactions) + binary 'on' together — content messages inside
    S/E blocks carry both the leading xid AND binary cells, and the
    decoder must produce the identical document a plain text-mode v1
    tail yields for the same WAL (typed battery riding a 3000-row
    streamed transaction so the stream path actually engages)."""
    from warp_pipe_spark.lr_client import XLogData
    from warp_pipe_spark.pgoutput import (
        PgOutputAssembler,
        tail_pgoutput_to_drop_dir,
    )

    ctl, _, tbl = live
    pub = f"wp_pub_v2b_{os.getpid()}"
    rep_bin = _client(f"wp_live_v2b_{os.getpid()}")
    rep_txt = _client(f"wp_live_v2t_{os.getpid()}")
    for r in (rep_bin, rep_txt):
        r.plugin = "pgoutput"
        r.connect()
    try:
        rep_bin._simple_query("SET logical_decoding_work_mem = '64kB'")
        ctl._simple_query(
            f"CREATE TABLE {tbl} (doc_id int primary key, f8 double"
            " precision, num numeric, d date, body text)"
        )
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        rep_bin.create_slot()
        rep_txt.create_slot()
        ctl._simple_query(
            f"INSERT INTO {tbl} "
            "SELECT g, g * 0.1, g * 1.5, DATE '2024-01-01' + g % 300,"
            " repeat('x', 120) || g::text "
            "FROM generate_series(1, 3000) g"
        )
        # binary + streaming tail, frame kinds observed on the wire
        asm = PgOutputAssembler(proto_version=2)
        seen = set()
        sock = rep_bin._conn.sock
        prev = sock.gettimeout()
        sock.settimeout(30.0)
        try:
            for msg in rep_bin.start(
                0,
                options={
                    "proto_version": "2",
                    "publication_names": pub,
                    "streaming": "on",
                    "binary": "on",
                },
            ):
                if not isinstance(msg, XLogData):
                    continue
                seen.add(msg.payload[:1])
                asm.feed(msg.wal_start, msg.payload)
                if asm.docs:
                    break
        finally:
            try:
                sock.settimeout(prev)
            except OSError:
                pass
        assert b"S" in seen and b"c" in seen  # really streamed
        (bin_doc,) = asm.take_docs()
        assert len(bin_doc["change"]) == 3000

        # plain v1 text-mode tail over the SAME WAL from the twin slot
        drop = str(tmp_path / "drop_txt")
        n = tail_pgoutput_to_drop_dir(
            rep_txt, drop, publication=pub, max_changes=3000,
            idle_timeout_s=15.0,
        )
        assert n == 3000
        txt_lines = []
        for name in sorted(os.listdir(drop)):
            with open(os.path.join(drop, name)) as f:
                txt_lines.extend(f.read().splitlines())
        txt_changes = [
            c for ln in txt_lines for c in json.loads(ln)["change"]
        ]
        # identical VALUES change-by-change (ids equal too: same WAL
        # positions; nextlsn differs — stream-commit's end_lsn vs the
        # v1 commit's — so compare the change lists, not the envelope)
        assert txt_changes == bin_doc["change"]
    finally:
        for rep in (rep_bin, rep_txt):
            try:
                rep.drop_slot()
            except Exception:
                try:
                    rep.close()
                except Exception:
                    pass
                for _ in range(5):
                    try:
                        ctl._simple_query(
                            f"DROP_REPLICATION_SLOT {rep.slot}"
                        )
                        break
                    except Exception:
                        time.sleep(0.5)
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        for rep in (rep_bin, rep_txt):
            try:
                rep.close()
            except Exception:
                pass


def test_live_pgoutput_binary_mode_randomized_battery(live, tmp_path):
    """Fuzz the binary renderers against the server's own text output:
    200 rows of seeded-random values — float8 spanning the exponent
    range (mantissa·10^e, e in −300..300), float4 likewise in its
    range, numerics with random precision/scale, random printable
    unicode text — tailed through BOTH tuple modes and byte-compared.
    The fixed battery covers the edges we thought of; this covers the
    ones we didn't (deterministic via setseed, so failures replay)."""
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    ctl, _, tbl = live
    pub = f"wp_pub_fuzz_{os.getpid()}"
    rep_txt = _client(f"wp_live_fzt_{os.getpid()}")
    rep_bin = _client(f"wp_live_fzb_{os.getpid()}")
    for r in (rep_txt, rep_bin):
        r.plugin = "pgoutput"
        r.connect()
    try:
        ctl._simple_query(
            f"CREATE TABLE {tbl} (id int primary key, f8 double"
            " precision, f4 real, num numeric, t text)"
        )
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        rep_txt.create_slot()
        rep_bin.create_slot()
        ctl._simple_query("SELECT setseed(0.42)")
        ctl._simple_query(
            f"INSERT INTO {tbl} "
            "SELECT g,"
            " (random() * 2 - 1) * power(10::double precision,"
            "   floor(random() * 600 - 300)),"
            " ((random() * 2 - 1) * power(10::double precision,"
            "   floor(random() * 70 - 35)))::real,"
            " round((random() * 2 - 1)::numeric"
            "   * power(10::numeric, floor(random() * 20)::int),"
            "   floor(random() * 12)::int),"
            " (SELECT string_agg(chr(32 + (random() * 94)::int), '')"
            "  FROM generate_series(1, 20))"
            " FROM generate_series(1, 200) g"
        )
        lines = {}
        for mode, rep in (("text", rep_txt), ("binary", rep_bin)):
            drop = str(tmp_path / f"fuzz_{mode}")
            n = tail_pgoutput_to_drop_dir(
                rep, drop, publication=pub, max_changes=200,
                idle_timeout_s=15.0, binary=(mode == "binary"),
            )
            assert n == 200, mode
            ls = []
            for name in sorted(os.listdir(drop)):
                with open(os.path.join(drop, name), "rb") as f:
                    ls.extend(f.read().splitlines())
            lines[mode] = ls
        assert lines["text"] == lines["binary"]
    finally:
        for rep in (rep_txt, rep_bin):
            try:
                rep.drop_slot()
            except Exception:
                try:
                    rep.close()
                except Exception:
                    pass
                for _ in range(5):
                    try:
                        ctl._simple_query(
                            f"DROP_REPLICATION_SLOT {rep.slot}"
                        )
                        break
                    except Exception:
                        time.sleep(0.5)
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        for rep in (rep_txt, rep_bin):
            try:
                rep.close()
            except Exception:
                pass


def test_live_unchanged_toast_column_is_omitted(live, tmp_path):
    """The ADVICE-r10 TOAST contract against a REAL TOASTed value: a
    column forced out-of-line (STORAGE EXTERNAL, 10kB payload) that an
    UPDATE doesn't touch arrives as an 'u' cell and must be ABSENT
    from the change — in text mode and in binary mode, byte-identical
    across the two. The golden-frame tests pin the byte shape; this
    pins that a real server actually produces it."""
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    ctl, _, tbl = live
    pub = f"wp_pub_toast_{os.getpid()}"
    rep_txt = _client(f"wp_live_tot_{os.getpid()}")
    rep_bin = _client(f"wp_live_tob_{os.getpid()}")
    for r in (rep_txt, rep_bin):
        r.plugin = "pgoutput"
        r.connect()
    try:
        ctl._simple_query(
            f"CREATE TABLE {tbl} (id int primary key, big text, val text)"
        )
        ctl._simple_query(
            f"ALTER TABLE {tbl} ALTER COLUMN big SET STORAGE EXTERNAL"
        )
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        rep_txt.create_slot()
        rep_bin.create_slot()
        ctl._simple_query(
            f"INSERT INTO {tbl} VALUES (1, repeat('x', 10000), 'a')"
        )
        ctl._simple_query(f"UPDATE {tbl} SET val = 'b' WHERE id = 1")
        lines = {}
        for mode, rep in (("text", rep_txt), ("binary", rep_bin)):
            drop = str(tmp_path / f"toast_{mode}")
            n = tail_pgoutput_to_drop_dir(
                rep, drop, publication=pub, max_changes=2,
                idle_timeout_s=10.0, binary=(mode == "binary"),
            )
            assert n == 2, mode
            ls = []
            for name in sorted(os.listdir(drop)):
                with open(os.path.join(drop, name), "rb") as f:
                    ls.extend(f.read().splitlines())
            lines[mode] = ls
        assert lines["text"] == lines["binary"]
        changes = [
            c for ln in lines["text"] for c in json.loads(ln)["change"]
        ]
        ins, upd = changes
        # insert carries the full 10kB value; the update OMITS the
        # untouched TOASTed column entirely (never a NULL)
        assert ins["columnnames"] == ["id", "big", "val"]
        assert len(ins["columnvalues"][1]) == 10000
        assert upd["kind"] == "update"
        assert upd["columnnames"] == ["id", "val"]
        assert upd["columnvalues"] == ["1", "b"]
    finally:
        for rep in (rep_txt, rep_bin):
            try:
                rep.drop_slot()
            except Exception:
                try:
                    rep.close()
                except Exception:
                    pass
                for _ in range(5):
                    try:
                        ctl._simple_query(
                            f"DROP_REPLICATION_SLOT {rep.slot}"
                        )
                        break
                    except Exception:
                        time.sleep(0.5)
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        for rep in (rep_txt, rep_bin):
            try:
                rep.close()
            except Exception:
                pass


def test_live_replica_identity_full_old_tuples(live, tmp_path):
    """REPLICA IDENTITY FULL against the real server: updates and
    deletes carry 'O' old tuples with ALL columns — genuine NULLs
    included (the key-flag heuristic this replaced dropped them) —
    and binary mode renders the same bytes."""
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    ctl, _, tbl = live
    pub = f"wp_pub_rif_{os.getpid()}"
    rep_txt = _client(f"wp_live_rift_{os.getpid()}")
    rep_bin = _client(f"wp_live_rifb_{os.getpid()}")
    for r in (rep_txt, rep_bin):
        r.plugin = "pgoutput"
        r.connect()
    try:
        ctl._simple_query(
            f"CREATE TABLE {tbl} (id int primary key, val text, n int)"
        )
        ctl._simple_query(f"ALTER TABLE {tbl} REPLICA IDENTITY FULL")
        ctl._simple_query(f"CREATE PUBLICATION {pub} FOR TABLE {tbl}")
        rep_txt.create_slot()
        rep_bin.create_slot()
        ctl._simple_query(
            f"INSERT INTO {tbl} VALUES (1, NULL, 7); "
            f"UPDATE {tbl} SET n = 8 WHERE id = 1; "
            f"DELETE FROM {tbl} WHERE id = 1"
        )
        lines = {}
        for mode, rep in (("text", rep_txt), ("binary", rep_bin)):
            drop = str(tmp_path / f"rif_{mode}")
            n = tail_pgoutput_to_drop_dir(
                rep, drop, publication=pub, max_changes=3,
                idle_timeout_s=10.0, binary=(mode == "binary"),
            )
            assert n == 3, mode
            ls = []
            for name in sorted(os.listdir(drop)):
                with open(os.path.join(drop, name), "rb") as f:
                    ls.extend(f.read().splitlines())
            lines[mode] = ls
        assert lines["text"] == lines["binary"]
        changes = [
            c for ln in lines["text"] for c in json.loads(ln)["change"]
        ]
        _, upd, dele = changes
        # identity FULL: the old image is every column, NULL preserved
        assert upd["oldkeys"]["keynames"] == ["id", "val", "n"]
        assert upd["oldkeys"]["keyvalues"] == ["1", None, "7"]
        assert dele["oldkeys"]["keyvalues"] == ["1", None, "8"]
    finally:
        for rep in (rep_txt, rep_bin):
            try:
                rep.drop_slot()
            except Exception:
                try:
                    rep.close()
                except Exception:
                    pass
                for _ in range(5):
                    try:
                        ctl._simple_query(
                            f"DROP_REPLICATION_SLOT {rep.slot}"
                        )
                        break
                    except Exception:
                        time.sleep(0.5)
        try:
            ctl._simple_query(f"DROP PUBLICATION IF EXISTS {pub}")
        except Exception:
            pass
        for rep in (rep_txt, rep_bin):
            try:
                rep.close()
            except Exception:
                pass
