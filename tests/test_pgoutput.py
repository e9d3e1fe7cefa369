"""pgoutput binary decoder: golden hand-built frames → wal2json-shaped
documents → the EXISTING decode_wal2json Spark path. The live twin
(real server, real publication) is tests/test_live_pg.py."""

from __future__ import annotations

import json
import struct

import pytest

from warp_pipe_spark.pgoutput import PgOutputAssembler

# -- golden frame builders (the protocol's documented byte layout) -------


def cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def msg_relation(oid, ns, rel, cols, replident=b"d"):
    b = b"R" + struct.pack("!i", oid) + cstr(ns) + cstr(rel) + replident
    b += struct.pack("!h", len(cols))
    for flags, name, toid in cols:
        b += struct.pack("!B", flags) + cstr(name) + struct.pack("!ii", toid, -1)
    return b


def tup(*cells):
    b = struct.pack("!h", len(cells))
    for c in cells:
        if c is None:
            b += b"n"
        elif c == ("toast",):
            b += b"u"
        else:
            enc = c.encode()
            b += b"t" + struct.pack("!i", len(enc)) + enc
    return b


def msg_begin(xid=7, lsn=1000):
    return b"B" + struct.pack("!qqi", lsn, 0, xid)


def msg_commit(end_lsn=2000):
    return b"C" + struct.pack("!Bqqq", 0, end_lsn - 8, end_lsn, 0)


def msg_insert(oid, *cells):
    return b"I" + struct.pack("!i", oid) + b"N" + tup(*cells)


def msg_update(oid, new_cells, old_cells=None, old_marker=b"K"):
    b = b"U" + struct.pack("!i", oid)
    if old_cells is not None:
        b += old_marker + tup(*old_cells)
    return b + b"N" + tup(*new_cells)


def msg_delete(oid, key_cells, marker=b"K"):
    return b"D" + struct.pack("!i", oid) + marker + tup(*key_cells)


REL = msg_relation(
    5001, "public", "accounts", [(1, "id", 20), (0, "val", 25)]
)


def feed_all(asm, frames, start=100):
    for i, f in enumerate(frames):
        asm.feed(start + i, f)


def test_transaction_assembles_to_one_wal2json_doc():
    asm = PgOutputAssembler()
    feed_all(
        asm,
        [
            REL,
            msg_begin(),
            msg_insert(5001, "1", "a"),
            msg_update(5001, ["1", "a2"], old_cells=["1", None]),
            msg_delete(5001, ["1", None]),
            msg_commit(end_lsn=0x30000),
        ],
    )
    assert len(asm.docs) == 1
    doc = asm.docs[0]
    assert doc["nextlsn"] == "0/30000"
    kinds = [c["kind"] for c in doc["change"]]
    assert kinds == ["insert", "update", "delete"]
    ins, upd, dele = doc["change"]
    assert ins["columnnames"] == ["id", "val"]
    assert ins["columntypes"] == ["bigint", "text"]
    assert ins["columnvalues"] == ["1", "a"]
    assert ins["schema"] == "public" and ins["table"] == "accounts"
    # update: new image + oldkeys restricted to the non-null key cells
    assert upd["columnvalues"] == ["1", "a2"]
    assert upd["oldkeys"] == {
        "keynames": ["id"],
        "keytypes": ["bigint"],
        "keyvalues": ["1"],
    }
    # delete: no new image, key-only old side
    assert dele["columnvalues"] == [] and dele["columnnames"] == []
    assert dele["oldkeys"]["keyvalues"] == ["1"]
    # per-change id = each message's wal_start (monotone, unique)
    ids = [c["id"] for c in doc["change"]]
    assert ids == sorted(ids) and len(set(ids)) == 3


def test_docs_decode_through_the_existing_wal2json_path(spark):
    from warp_pipe_spark.decoders import decode_wal2json

    asm = PgOutputAssembler()
    feed_all(
        asm,
        [
            REL,
            msg_begin(),
            msg_insert(5001, "1", "a"),
            msg_insert(5001, "2", None),  # NULL value survives decode
            msg_commit(),
        ],
    )
    lines = [json.dumps(d) for d in asm.docs]
    out = decode_wal2json(
        spark.createDataFrame([(ln,) for ln in lines], "message STRING")
    ).collect()
    assert [(r["kind"], r["table"]) for r in out] == [
        ("insert", "accounts"),
        ("insert", "accounts"),
    ]
    assert [c["value"] for c in out[0]["new_values"]] == ["1", "a"]
    assert [c["value"] for c in out[1]["new_values"]] == ["2", None]
    assert out[0]["id"] is not None and out[1]["id"] > out[0]["id"]


def test_unchanged_toast_columns_are_omitted_not_nulled():
    """wal2json parity: a TOASTed column an UPDATE didn't touch is NOT
    re-sent by the server ('u' cell). It must be ABSENT from the change
    — emitting it as NULL would be indistinguishable from a real NULL
    and the LWW apply would overwrite the stored value with NULL."""
    asm = PgOutputAssembler()
    feed_all(
        asm,
        [
            REL,
            msg_begin(),
            msg_update(5001, ["1", ("toast",)]),  # TOAST: not re-sent
            msg_update(5001, ["2", None]),  # a REAL NULL stays a cell
            msg_commit(),
        ],
    )
    toasted, real_null = asm.docs[0]["change"]
    assert toasted["columnnames"] == ["id"]
    assert toasted["columntypes"] == ["bigint"]
    assert toasted["columnvalues"] == ["1"]
    assert real_null["columnnames"] == ["id", "val"]
    assert real_null["columnvalues"] == ["2", None]


def test_identity_full_old_tuple_keeps_genuine_nulls():
    """'O' tuple (REPLICA IDENTITY FULL): oldkeys carries ALL columns,
    NULLs included — wal2json identity-full parity. The 'K' path picks
    columns by the relation's key FLAGS, so a NULL in a key column
    would survive too (never the old filter-out-None heuristic)."""
    asm = PgOutputAssembler()
    feed_all(
        asm,
        [
            REL,
            msg_begin(),
            msg_delete(5001, ["1", None], marker=b"O"),
            msg_commit(),
        ],
    )
    (dele,) = asm.docs[0]["change"]
    assert dele["oldkeys"]["keynames"] == ["id", "val"]
    assert dele["oldkeys"]["keyvalues"] == ["1", None]


def test_empty_transaction_emits_no_document():
    """A commit whose transaction touched only non-published tables
    arrives as bare Begin+Commit. No document (and hence no fsynced
    drop-dir file) may be produced for it."""
    asm = PgOutputAssembler()
    feed_all(asm, [REL, msg_begin(), msg_commit()])
    assert asm.docs == []


def test_commit_outside_begin_raises():
    from warp_pipe_spark.pgoutput import PgOutputProtocolError

    asm = PgOutputAssembler()
    with pytest.raises(PgOutputProtocolError, match="outside a BEGIN"):
        asm.feed(100, msg_commit())


def test_v2_stream_message_raises_named_error():
    """Protocol-version guard: proto_version 1 is pinned in the START
    options; a v2-only streamed-transaction frame ('S' stream-start)
    must raise a named error, never be silently skipped or misparsed."""
    from warp_pipe_spark.pgoutput import PgOutputProtocolError

    asm = PgOutputAssembler()
    with pytest.raises(PgOutputProtocolError, match="proto_version 1"):
        asm.feed(100, b"S" + struct.pack("!ii", 1, 2))
    with pytest.raises(PgOutputProtocolError, match="unknown pgoutput"):
        asm.feed(101, b"Z")


def test_feed_returns_change_counts():
    asm = PgOutputAssembler()
    assert asm.feed(100, REL) == 0
    assert asm.feed(101, msg_begin()) == 0
    assert asm.feed(102, msg_insert(5001, "1", "a")) == 1
    assert asm.feed(103, msg_commit()) == 0
    assert len(asm.take_docs()) == 1
    assert asm.docs == []  # popped — the tail's memory stays bounded


def test_change_before_relation_raises():
    asm = PgOutputAssembler()
    asm.feed(100, msg_begin())
    with pytest.raises(ValueError, match="no prior Relation"):
        asm.feed(101, msg_insert(9999, "1", "a"))


def test_change_outside_transaction_raises():
    asm = PgOutputAssembler()
    asm.feed(100, REL)
    with pytest.raises(ValueError, match="outside a BEGIN"):
        asm.feed(101, msg_insert(5001, "1", "a"))


def test_uncommitted_tail_is_not_emitted():
    asm = PgOutputAssembler()
    feed_all(asm, [REL, msg_begin(), msg_insert(5001, "1", "a")])
    assert asm.docs == []  # no commit, no document — abort-safe


def test_truncate_emits_one_change_per_table():
    """Multi-table TRUNCATE fans out to one change per table (wal2json
    emits one truncate entry per table) — stashing extras in a side key
    the downstream schema drops would silently lose them. Sub-ordinal
    ids wal_start+i stay unique and monotone (the wire message is
    6+4n bytes, so they never collide with the next message's id)."""
    rel2 = msg_relation(5002, "public", "orders", [(1, "id", 20)])
    asm = PgOutputAssembler()
    t = b"T" + struct.pack("!iB", 2, 0) + struct.pack("!ii", 5001, 5002)
    feed_all(asm, [REL, rel2, msg_begin(), t, msg_commit()], start=100)
    a, b = asm.docs[0]["change"]
    assert [c["kind"] for c in (a, b)] == ["truncate", "truncate"]
    assert [c["table"] for c in (a, b)] == ["accounts", "orders"]
    assert b["id"] == a["id"] + 1


def test_truncate_changes_survive_the_wal2json_decode(spark):
    """Both truncates of a 2-table TRUNCATE must be visible to the
    downstream decode — the schema has no side channel."""
    from warp_pipe_spark.decoders import decode_wal2json

    rel2 = msg_relation(5002, "public", "orders", [(1, "id", 20)])
    asm = PgOutputAssembler()
    t = b"T" + struct.pack("!iB", 2, 0) + struct.pack("!ii", 5001, 5002)
    feed_all(asm, [REL, rel2, msg_begin(), t, msg_commit()])
    lines = [json.dumps(d) for d in asm.docs]
    out = decode_wal2json(
        spark.createDataFrame([(ln,) for ln in lines], "message STRING")
    ).collect()
    assert [(r["kind"], r["table"]) for r in out] == [
        ("truncate", "accounts"),
        ("truncate", "orders"),
    ]


def btup(*cells):
    """TupleData with BINARY ('b') cells; None -> NULL."""
    b = struct.pack("!h", len(cells))
    for c in cells:
        if c is None:
            b += b"n"
        else:
            b += b"b" + struct.pack("!i", len(c)) + c
    return b


def msg_insert_binary(oid, *cells):
    return b"I" + struct.pack("!i", oid) + b"N" + btup(*cells)


def test_binary_mode_cells_decode_to_canonical_text():
    """`binary 'on'` (PG 14+): cells arrive in each type's binary wire
    format; the assembler renders them back to the type's text output,
    so the document is byte-identical to a text-mode tail. One golden
    value per supported type, wire bytes built by hand from the public
    formats (<type>send in the PG source)."""
    cols = [
        (0, "b", 16), (0, "by", 17), (0, "i8", 20), (0, "i2", 21),
        (0, "i4", 23), (0, "t", 25), (0, "f4", 700), (0, "f8", 701),
        (0, "vc", 1043), (0, "d", 1082), (0, "tm", 1083),
        (0, "ts", 1114), (0, "tsz", 1184), (0, "num", 1700),
        (0, "u", 2950), (0, "jb", 3802),
    ]
    asm = PgOutputAssembler()
    # 2024-01-02 03:04:05.1 in the 2000-01-01 epoch
    us = (
        (8767 * 86_400 + 3 * 3600 + 4 * 60 + 5) * 1_000_000 + 100_000
    )  # 8767 days = 2000-01-01 -> 2024-01-02
    feed_all(
        asm,
        [
            msg_relation(7001, "public", "alltypes", cols),
            msg_begin(),
            msg_insert_binary(
                7001,
                b"\x01",
                b"\x00\xff",
                struct.pack("!q", -5),
                struct.pack("!h", 12),
                struct.pack("!i", 42),
                "héllo".encode(),
                struct.pack("!f", 0.1),
                struct.pack("!d", 1.5e-5),
                b"vc",
                struct.pack("!i", 8767),
                struct.pack("!q", 3 * 3600 * 1_000_000 + 500_000),
                struct.pack("!q", us),
                struct.pack("!q", us),
                # 12345.6789: ndigits=3 weight=1 sign=+ dscale=4,
                # base-10000 groups [1, 2345, 6789]
                struct.pack("!hhHH", 3, 1, 0x0000, 4)
                + struct.pack("!3H", 1, 2345, 6789),
                bytes.fromhex("0123456789abcdef0123456789abcdef"),
                b"\x01" + b'{"a": 1}',
            ),
            msg_commit(),
        ],
    )
    (doc,) = asm.docs
    (change,) = doc["change"]
    assert change["columnvalues"] == [
        "t",
        "\\x00ff",
        "-5",
        "12",
        "42",
        "héllo",
        "0.1",  # float4-shortest, NOT the float8 repr of the cast
        "1.5e-05",
        "vc",
        "2024-01-02",
        "03:00:00.5",
        "2024-01-02 03:04:05.1",
        "2024-01-02 03:04:05.1+00",
        "12345.6789",
        "01234567-89ab-cdef-0123-456789abcdef",
        '{"a": 1}',
    ]


def test_binary_mode_oldkeys_and_nulls():
    """Binary cells on the OLD side decode through the same path; NULL
    cells stay NULL (never rendered as a type's zero value)."""
    asm = PgOutputAssembler()
    feed_all(
        asm,
        [
            REL,  # (id bigint key, val text)
            msg_begin(),
            b"U"
            + struct.pack("!i", 5001)
            + b"K"
            + btup(struct.pack("!q", 7), None)
            + b"N"
            + btup(struct.pack("!q", 7), "x".encode()),
            msg_commit(),
        ],
    )
    (doc,) = asm.docs
    (change,) = doc["change"]
    assert change["columnvalues"] == ["7", "x"]
    assert change["oldkeys"]["keyvalues"] == ["7"]


def test_binary_cell_of_unsupported_type_fails_loud():
    """A binary cell whose type oid has no decoder raises naming the
    oid — guessing at an undocumented byte layout would corrupt the
    value silently."""
    from warp_pipe_spark.pgoutput import PgOutputProtocolError

    asm = PgOutputAssembler()
    rel = msg_relation(7002, "public", "m", [(1, "a", 790)])  # money
    feed_all(asm, [rel, msg_begin()])
    with pytest.raises(PgOutputProtocolError, match="oid 790"):
        asm.feed(102, msg_insert_binary(7002, b"\x00" * 8))


def test_binary_mode_array_cells():
    """Array binary wire format → array_out text: quoting rules,
    NULL elements, multi-dim nesting, non-default lower bounds."""
    from warp_pipe_spark.pgoutput import _pg_array_text

    def arr(ndim, elem_oid, dims, elems):
        b = struct.pack("!iii", ndim, 1, elem_oid)
        for dlen, lb in dims:
            b += struct.pack("!ii", dlen, lb)
        for e in elems:
            if e is None:
                b += struct.pack("!i", -1)
            else:
                b += struct.pack("!i", len(e)) + e
        return b

    i = lambda n: struct.pack("!i", n)
    assert _pg_array_text(arr(1, 23, [(3, 1)],
                              [i(1), None, i(3)]), 23) == "{1,NULL,3}"
    assert _pg_array_text(arr(0, 23, [], []), 23) == "{}"
    # text quoting: specials, embedded quote/backslash, literal NULL
    assert _pg_array_text(
        arr(1, 25, [(5, 1)],
            [b"plain", b"a b", b'he"llo', b"back\\slash", b"NULL"]),
        25,
    ) == '{plain,"a b","he\\"llo","back\\\\slash","NULL"}'
    # 2-D nesting
    assert _pg_array_text(
        arr(2, 23, [(2, 1), (2, 1)], [i(1), i(2), i(3), i(4)]), 23
    ) == "{{1,2},{3,4}}"
    # non-default lower bound emits the dims prefix
    assert _pg_array_text(
        arr(1, 23, [(2, 0)], [i(7), i(8)]), 23
    ) == "[0:1]={7,8}"


def test_pg_float_text_formatting_rules():
    """float4out/float8out surface form: fixed for decimal exponents in
    [-4, 15] with no trailing '.0', scientific with a signed two-digit
    exponent otherwise; float4 digits are float4-shortest."""
    from warp_pipe_spark.pgoutput import _pg_float_text

    assert _pg_float_text(1.0) == "1"
    assert _pg_float_text(-0.0) == "-0"
    assert _pg_float_text(0.5) == "0.5"
    assert _pg_float_text(100.0) == "100"
    assert _pg_float_text(0.0001) == "0.0001"
    assert _pg_float_text(0.00001) == "1e-05"
    # %g-style notation windows, calibrated against live PG 15:
    # float8 goes scientific at 1e15, float4 already at 1e6
    assert _pg_float_text(1e14) == "100000000000000"
    assert _pg_float_text(999999999999999.0) == "999999999999999"
    assert _pg_float_text(1e15) == "1e+15"
    assert _pg_float_text(1e16) == "1e+16"
    assert _pg_float_text(1.2345678901234568e22) == "1.2345678901234568e+22"
    assert _pg_float_text(float("nan")) == "NaN"
    assert _pg_float_text(float("-inf")) == "-Infinity"
    assert _pg_float_text(struct.unpack("!f", struct.pack("!f", 0.1))[0],
                          single=True) == "0.1"
    assert _pg_float_text(123456.0, single=True) == "123456"
    assert _pg_float_text(1234567.0, single=True) == "1.234567e+06"
    assert _pg_float_text(1e15, single=True) == "1e+15"


def test_pg_numeric_text_edges():
    from warp_pipe_spark.pgoutput import _pg_numeric_text

    def num(ndigits, weight, sign, dscale, *groups):
        return struct.pack("!hhHH", ndigits, weight, sign, dscale) + (
            struct.pack(f"!{len(groups)}H", *groups) if groups else b""
        )

    # -0.00123: groups [12, 3000] starting at weight -1, dscale 5
    assert _pg_numeric_text(num(2, -1, 0x4000, 5, 12, 3000)) == "-0.00123"
    # integer with a mid-zero group: 10000 = [1, 0] weight 1
    assert _pg_numeric_text(num(2, 1, 0x0000, 0, 1, 0)) == "10000"
    # trailing groups beyond ndigits are implicit zeros: 5 at dscale 2
    assert _pg_numeric_text(num(1, 0, 0x0000, 2, 5)) == "5.00"
    # zero
    assert _pg_numeric_text(num(0, 0, 0x0000, 0)) == "0"
    assert _pg_numeric_text(num(0, 0, 0xC000, 0)) == "NaN"


def test_bounded_drain_breaks_only_between_transactions(tmp_path):
    """tail_pgoutput_to_drop_dir's max_changes must never tear a
    transaction: the Nth change of a transaction arrives BEFORE its
    commit, and breaking there would emit nothing for that whole
    transaction. Against the fake walsender: three 2-change
    transactions, max_changes=3 — the drain must finish transaction 2
    (4 changes, 2 docs) and leave transaction 3 unread."""
    import json as _json

    from test_lr_client import FakeWalsender

    from warp_pipe_spark.lr_client import LRClient
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    def txn(vals, lsn):
        return (
            [msg_begin(lsn=lsn)]
            + [msg_insert(5001, str(v), f"v{v}") for v in vals]
            + [msg_commit(end_lsn=lsn + 100)]
        )

    payloads = [REL] + txn([1, 2], 0x1000) + txn([3, 4], 0x2000) + txn(
        [5, 6], 0x3000
    )
    srv = FakeWalsender(
        payloads, keepalive_every=100, hang_silent_after_payloads=True
    )
    c = LRClient("127.0.0.1", srv.port, "testdb", "u", "wp_slot",
                 plugin="pgoutput", status_interval_s=9999)
    c.connect()
    drop = str(tmp_path / "drop")
    n = tail_pgoutput_to_drop_dir(
        c, drop, publication="pub", max_changes=3, idle_timeout_s=5.0
    )
    c.close()
    assert n == 4  # finished txn 2; txn 3 unread
    docs = []
    import os as _os

    for fn in sorted(_os.listdir(drop)):
        with open(_os.path.join(drop, fn)) as f:
            docs += [_json.loads(ln) for ln in f.read().splitlines()]
    assert [len(d["change"]) for d in docs] == [2, 2]
    seen = [c_["columnvalues"][0] for d in docs for c_ in d["change"]]
    assert seen == ["1", "2", "3", "4"]
    # (the client abandons CopyBoth at the break — the fake sees a
    # plain connection close, same as the idle-timeout drain tests)
    srv.thread.join(5)


def test_pgoutput_docs_stream_through_wal2json_stream_to_state(spark, tmp_path):
    """Full-stack stitch, in-sandbox: pgoutput-assembled JSONL in a
    drop dir IS a wal2json drop dir — wal2json_stream tails it,
    the decoded changes apply through ParquetStateSink, and the final
    state is the LWW fold of the stream (update wins over insert, the
    WAL-position ids providing the recency order)."""
    import os

    from pyspark.sql import functions as F

    from warp_pipe_spark.streaming import ParquetStateSink, wal2json_stream

    asm = PgOutputAssembler()
    feed_all(
        asm,
        [
            REL,
            msg_begin(lsn=0x1000),
            msg_insert(5001, "1", "a"),
            msg_insert(5001, "2", "b"),
            msg_commit(end_lsn=0x1100),
            msg_begin(lsn=0x2000),
            msg_update(5001, ["2", "b2"], old_cells=["2", None]),
            msg_delete(5001, ["1", None]),
            msg_commit(end_lsn=0x2100),
        ],
        start=0x5000,
    )
    drop = tmp_path / "drop"
    drop.mkdir()
    with open(drop / "lr_0001.jsonl", "w") as f:
        for d in asm.docs:
            f.write(json.dumps(d) + "\n")

    decoded = wal2json_stream(spark, str(drop))
    # normalized form -> the apply shape (pk/val off the column arrays)
    from warp_pipe_spark.changeset import column_value

    typed = decoded.select(
        "id",
        F.col("kind").alias("action"),
        F.col("table").alias("table_name"),
        F.coalesce(
            column_value("new_values", "id"),
            F.element_at(
                F.filter(
                    F.col("old_values"), lambda x: x["column"] == "id"
                ),
                1,
            )["value"],
        ).cast("long").alias("pk"),
        column_value("new_values", "val").alias("val"),
    )
    sink = ParquetStateSink(spark, str(tmp_path / "state"), pk_cols=["pk"])
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
    assert got == {(2, "b2")}  # 1 deleted, 2 updated — LWW by WAL position


# -- protocol v2: streamed in-progress transactions (PG 14+) --------------


def sx(msg: bytes, xid: int) -> bytes:
    """Tag a content message with the leading Int32 xid it carries
    inside a streamed block (proto 2, protocol.sgml: 'only present for
    streamed transactions')."""
    return msg[:1] + struct.pack("!i", xid) + msg[1:]


def msg_stream_start(xid, first=1):
    return b"S" + struct.pack("!iB", xid, first)


def msg_stream_commit(xid, end_lsn=0x9000):
    return b"c" + struct.pack("!iBqqq", xid, 0, end_lsn - 8, end_lsn, 0)


def msg_stream_abort(xid, subxid):
    return b"A" + struct.pack("!ii", xid, subxid)


def test_v2_streamed_transaction_emits_one_doc_on_stream_commit():
    asm = PgOutputAssembler(proto_version=2)
    feed_all(
        asm,
        [
            msg_stream_start(700),
            sx(REL, 700),
            sx(msg_insert(5001, "1", "a"), 700),
            sx(msg_insert(5001, "2", "b"), 700),
            b"E",
            msg_stream_commit(700, end_lsn=0x9000),
        ],
    )
    (doc,) = asm.docs
    assert doc["nextlsn"] == "0/9000"
    assert [c["columnvalues"] for c in doc["change"]] == [["1", "a"], ["2", "b"]]


def test_v2_interleaved_streams_commit_independently():
    """Two concurrently-streamed transactions interleave at block
    granularity; each commits its OWN buffered changes, in commit
    order, regardless of block arrival order."""
    asm = PgOutputAssembler(proto_version=2)
    feed_all(
        asm,
        [
            msg_stream_start(700),
            sx(REL, 700),
            sx(msg_insert(5001, "1", "t700"), 700),
            b"E",
            msg_stream_start(800),
            sx(msg_insert(5001, "2", "t800"), 800),
            b"E",
            msg_stream_start(700, first=0),  # continuation block
            sx(msg_insert(5001, "3", "t700b"), 700),
            b"E",
            msg_stream_commit(800, end_lsn=0xA000),  # 800 commits FIRST
            msg_stream_commit(700, end_lsn=0xB000),
        ],
    )
    a, b = asm.docs
    assert [c["columnvalues"][1] for c in a["change"]] == ["t800"]
    assert [c["columnvalues"][1] for c in b["change"]] == ["t700", "t700b"]


def test_v2_stream_abort_discards_whole_transaction():
    asm = PgOutputAssembler(proto_version=2)
    feed_all(
        asm,
        [
            msg_stream_start(700),
            sx(REL, 700),
            sx(msg_insert(5001, "1", "a"), 700),
            b"E",
            msg_stream_abort(700, 700),
        ],
    )
    assert asm.docs == [] and asm._streamed == {}


def test_v2_subtransaction_abort_drops_only_its_changes():
    """Changes carry their immediate (sub)transaction xid; an abort of
    subxid 701 must drop exactly those, keeping the rest of xid 700."""
    asm = PgOutputAssembler(proto_version=2)
    feed_all(
        asm,
        [
            msg_stream_start(700),
            sx(REL, 700),
            sx(msg_insert(5001, "1", "keep"), 700),
            sx(msg_insert(5001, "2", "savepoint"), 701),  # subxact
            b"E",
            msg_stream_abort(700, 701),
            msg_stream_start(700, first=0),
            sx(msg_insert(5001, "3", "keep2"), 700),
            b"E",
            msg_stream_commit(700),
        ],
    )
    (doc,) = asm.docs
    assert [c["columnvalues"][1] for c in doc["change"]] == ["keep", "keep2"]


def test_v2_first_segment_retransmit_resets_the_buffer():
    """A first_segment block for an already-buffered xid is the server
    retransmitting after a reconnect — the buffer resets (spool
    truncation), so changes are not duplicated."""
    asm = PgOutputAssembler(proto_version=2)
    feed_all(
        asm,
        [
            msg_stream_start(700),
            sx(REL, 700),
            sx(msg_insert(5001, "1", "a"), 700),
            b"E",
            msg_stream_start(700, first=1),  # retransmit from the top
            sx(msg_insert(5001, "1", "a"), 700),
            b"E",
            msg_stream_commit(700),
        ],
    )
    (doc,) = asm.docs
    assert len(doc["change"]) == 1


def test_v2_protocol_violations_raise():
    from warp_pipe_spark.pgoutput import PgOutputProtocolError

    asm = PgOutputAssembler(proto_version=2)
    asm.feed(100, msg_stream_start(700))
    with pytest.raises(PgOutputProtocolError, match="nested"):
        asm.feed(101, msg_stream_start(800))
    with pytest.raises(PgOutputProtocolError, match="inside a streamed"):
        asm.feed(102, msg_begin())
    asm.feed(103, b"E")
    with pytest.raises(PgOutputProtocolError, match="without an open"):
        asm.feed(104, b"E")
    with pytest.raises(PgOutputProtocolError, match="unknown xid"):
        asm.feed(105, msg_stream_start(900, first=0))
    with pytest.raises(PgOutputProtocolError, match="unknown xid"):
        asm.feed(106, msg_stream_commit(901))


def test_v2_feed_uncounts_discarded_changes():
    """feed()'s running sum is 'changes contributing to eventual
    output': an abort or a retransmit reset returns a NEGATIVE delta,
    so a bounded drain never stops early on changes that will never
    be written."""
    asm = PgOutputAssembler(proto_version=2)
    n = 0
    n += asm.feed(100, msg_stream_start(700))
    n += asm.feed(101, sx(REL, 700))
    n += asm.feed(102, sx(msg_insert(5001, "1", "a"), 700))
    n += asm.feed(103, sx(msg_insert(5001, "2", "b"), 701))  # subxact
    n += asm.feed(104, b"E")
    assert n == 2
    n += asm.feed(105, msg_stream_abort(700, 701))  # subxact rollback
    assert n == 1
    # retransmit reset un-counts, the re-arrival re-counts: net stable
    n += asm.feed(106, msg_stream_start(700, first=1))
    assert n == 0
    n += asm.feed(107, sx(msg_insert(5001, "1", "a"), 700))
    n += asm.feed(108, b"E")
    n += asm.feed(109, msg_stream_commit(700))
    assert n == 1 and len(asm.docs[0]["change"]) == 1
    # whole-transaction abort un-counts everything
    n += asm.feed(110, msg_stream_start(900))
    n += asm.feed(111, sx(msg_insert(5001, "9", "z"), 900))
    n += asm.feed(112, b"E")
    n += asm.feed(113, msg_stream_abort(900, 900))
    assert n == 1  # only the committed change remains counted


def test_v2_tail_confirms_lsn_after_stream_abort(tmp_path):
    """A rolled-back streamed transaction writes no file but its WAL
    position is consumed — the tail must confirm it (an unconfirmed
    multi-GB rollback would pin WAL on the server until the next real
    commit)."""
    from test_lr_client import FakeWalsender

    from warp_pipe_spark.lr_client import LRClient
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    payloads = [
        msg_stream_start(700),
        sx(REL, 700),
        sx(msg_insert(5001, "1", "a"), 700),
        b"E",
        msg_stream_abort(700, 700),  # whole transaction rolled back
        msg_begin(lsn=0x5000),
        msg_insert(5001, "2", "b"),
        msg_commit(end_lsn=0x5100),
    ]
    srv = FakeWalsender(
        payloads, keepalive_every=100, hang_silent_after_payloads=True
    )
    c = LRClient("127.0.0.1", srv.port, "testdb", "u", "wp_slot",
                 plugin="pgoutput", status_interval_s=9999)
    c.connect()
    drop = str(tmp_path / "drop")
    n = tail_pgoutput_to_drop_dir(
        c, drop, publication="pub", max_changes=2, idle_timeout_s=5.0,
        proto_version=2,
    )
    c.close()
    import os as _os

    assert n == 1  # the aborted change was un-counted
    files = _os.listdir(drop)
    assert len(files) == 1  # only the committed transaction hit the dir
    assert c.flushed_lsn > 0  # the abort's position was confirmed too
    srv.thread.join(5)


# -- protocol v3: two-phase commit (PG 15+, TWO_PHASE slots) ---------------


def msg_begin_prepare(gid, xid=700, lsn=0x7000):
    return b"b" + struct.pack("!qqqi", lsn, lsn + 8, 0, xid) + cstr(gid)


def msg_prepare(gid, xid=700, lsn=0x7000):
    return b"P" + struct.pack("!Bqqqi", 0, lsn, lsn + 8, 0, xid) + cstr(gid)


def msg_commit_prepared(gid, xid=700, end_lsn=0x8000):
    return b"K" + struct.pack("!Bqqqi", 0, end_lsn - 8, end_lsn, 0, xid) + cstr(gid)


def msg_rollback_prepared(gid, xid=700):
    return b"r" + struct.pack("!BqqqqI", 0, 1, 2, 0, 0, xid) + cstr(gid)


def msg_stream_prepare(gid, xid, lsn=0x7000):
    return b"p" + struct.pack("!Bqqqi", 0, lsn, lsn + 8, 0, xid) + cstr(gid)


def test_v3_prepared_transaction_emits_only_at_commit_prepared():
    asm = PgOutputAssembler(proto_version=3)
    feed_all(
        asm,
        [
            REL,
            msg_begin_prepare("gid-1"),
            msg_insert(5001, "1", "a"),
            msg_prepare("gid-1"),
        ],
    )
    assert asm.docs == []  # prepared but undecided: nothing emitted
    asm.feed(200, msg_commit_prepared("gid-1", end_lsn=0x8000))
    (doc,) = asm.docs
    assert doc["nextlsn"] == "0/8000"
    assert [c["columnvalues"] for c in doc["change"]] == [["1", "a"]]


def test_v3_rollback_prepared_discards_and_uncounts():
    asm = PgOutputAssembler(proto_version=3)
    n = 0
    for i, f in enumerate(
        [REL, msg_begin_prepare("gid-2"), msg_insert(5001, "1", "a"),
         msg_prepare("gid-2"), msg_rollback_prepared("gid-2")]
    ):
        n += asm.feed(100 + i, f)
    assert n == 0 and asm.docs == [] and asm._prepared == {}
    # rollback-prepared of a gid prepared BEFORE our start position is
    # legal (only the rollback is delivered): a no-op, not an error
    assert asm.feed(300, msg_rollback_prepared("never-seen")) == 0


def test_v3_other_transactions_interleave_with_a_pending_prepare():
    """A prepared transaction can stay undecided across many later
    commits; its document appears at commit-prepared TIME, not at
    prepare time."""
    asm = PgOutputAssembler(proto_version=3)
    feed_all(
        asm,
        [
            REL,
            msg_begin_prepare("gid-3"),
            msg_insert(5001, "1", "prepared"),
            msg_prepare("gid-3"),
            msg_begin(lsn=0x9000),
            msg_insert(5001, "2", "normal"),
            msg_commit(end_lsn=0x9100),
            msg_commit_prepared("gid-3", end_lsn=0xA000),
        ],
    )
    vals = [[c["columnvalues"][1] for c in d["change"]] for d in asm.docs]
    assert vals == [["normal"], ["prepared"]]  # commit order, not WAL order


def test_v3_stream_prepare_moves_streamed_blocks_to_gid():
    """streaming + two_phase: a streamed transaction that PREPAREs
    moves from xid-keyed to gid-keyed state and emits at
    commit-prepared."""
    asm = PgOutputAssembler(proto_version=3)
    feed_all(
        asm,
        [
            msg_stream_start(700),
            sx(REL, 700),
            sx(msg_insert(5001, "1", "sp"), 700),
            b"E",
            msg_stream_prepare("gid-4", 700),
        ],
    )
    assert asm.docs == [] and 700 not in asm._streamed
    asm.feed(200, msg_commit_prepared("gid-4", end_lsn=0xB000))
    (doc,) = asm.docs
    assert [c["columnvalues"][1] for c in doc["change"]] == ["sp"]


def test_v3_guards():
    from warp_pipe_spark.pgoutput import PgOutputProtocolError

    # v3 frames on a v1/v2 stream raise the named error
    for pv in (1, 2):
        asm = PgOutputAssembler(proto_version=pv)
        with pytest.raises(PgOutputProtocolError, match="v3"):
            asm.feed(100, msg_begin_prepare("g"))
    asm = PgOutputAssembler(proto_version=3)
    with pytest.raises(PgOutputProtocolError, match="without a begin-prepare"):
        asm.feed(100, msg_prepare("g"))
    with pytest.raises(PgOutputProtocolError, match="unknown gid"):
        asm.feed(101, msg_commit_prepared("never-prepared"))
    asm.feed(102, msg_begin_prepare("g1"))
    with pytest.raises(PgOutputProtocolError, match="does not match"):
        asm.feed(103, msg_prepare("OTHER"))


# -- logical-decoding messages (pg_logical_emit_message, 'M') --------------


def msg_message(prefix, content: bytes, transactional=1, lsn=0x4000):
    return (
        b"M" + struct.pack("!Bq", transactional, lsn) + cstr(prefix)
        + struct.pack("!i", len(content)) + content
    )


def test_transactional_message_rides_its_transaction():
    asm = PgOutputAssembler()
    feed_all(
        asm,
        [
            REL,
            msg_begin(),
            msg_insert(5001, "1", "a"),
            msg_message("outbox", b"\x01payload"),
            msg_commit(end_lsn=0x5000),
        ],
    )
    (doc,) = asm.docs
    ins, msg = doc["change"]
    assert msg["kind"] == "message"
    assert msg["schema"] is None and msg["table"] is None  # unroutable
    assert msg["columnnames"] == ["prefix", "content"]
    assert msg["columnvalues"] == ["outbox", "\\x" + b"\x01payload".hex()]


def test_nontransactional_message_emits_standalone_even_mid_tx():
    """flags=0: the message belongs to NO transaction — it must emit
    as its own document immediately, never fold into the surrounding
    Begin/Commit (whose abort must not discard it either)."""
    asm = PgOutputAssembler()
    feed_all(
        asm,
        [
            REL,
            msg_begin(),
            msg_insert(5001, "1", "a"),
            msg_message("marker", b"m", transactional=0),
        ],
    )
    # emitted already, while the surrounding transaction is still open
    (doc,) = asm.docs
    assert [c["kind"] for c in doc["change"]] == ["message"]
    # ...and the open transaction still commits independently
    asm.feed(200, msg_commit(end_lsn=0x6000))
    assert len(asm.docs) == 2


def test_message_decodes_through_the_wal2json_path(spark):
    from warp_pipe_spark.decoders import decode_wal2json

    asm = PgOutputAssembler()
    feed_all(
        asm,
        [REL, msg_begin(), msg_message("outbox", b"evt-1"), msg_commit()],
    )
    out = decode_wal2json(
        spark.createDataFrame(
            [(json.dumps(d),) for d in asm.docs], "message STRING"
        )
    ).collect()
    (row,) = out
    assert row["kind"] == "message" and row["table"] is None
    assert [(c["column"], c["value"]) for c in row["new_values"]] == [
        ("prefix", "outbox"),
        ("content", "\\x" + b"evt-1".hex()),
    ]


def test_control_frames_inside_an_open_block_raise():
    """stream-commit and every two-phase control frame are delivered
    OUTSIDE S..E blocks; one arriving inside would desynchronize the
    buffers and must fail loudly, not corrupt."""
    from warp_pipe_spark.pgoutput import PgOutputProtocolError

    asm = PgOutputAssembler(proto_version=3)
    asm.feed(100, msg_stream_start(700))
    with pytest.raises(PgOutputProtocolError, match="inside an open"):
        asm.feed(101, msg_stream_commit(700))
    with pytest.raises(PgOutputProtocolError, match="inside an open"):
        asm.feed(102, msg_begin_prepare("g"))
    with pytest.raises(PgOutputProtocolError, match="inside an open"):
        asm.feed(103, msg_commit_prepared("g"))


# -- property: the assembler emits EXACTLY the committed changes -----------


def test_assembler_emits_exactly_committed_changes_property():
    """Randomized framing scenarios across proto 1/2/3: plain,
    streamed (1-2 blocks), prepared, and streamed-prepared
    transactions, each committing or aborting — the assembler must
    emit one document per surviving non-empty transaction, in decision
    order, with the exact change values, and the feed-delta sum must
    equal the number of changes actually emitted."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tx = st.tuples(
        st.sampled_from(["plain", "streamed", "prepared", "stream_prep"]),
        st.booleans(),  # commits?
        st.lists(st.integers(0, 99), min_size=0, max_size=5),  # change pks
        st.booleans(),  # streamed: split into two blocks?
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(tx, min_size=1, max_size=6))
    def run(txs):
        asm = PgOutputAssembler(proto_version=3)
        pos = [1000]

        def feed(frame):
            pos[0] += 100
            return asm.feed(pos[0], frame)

        delta = feed(REL)
        expected = []
        for i, (mode, commits, pks, split) in enumerate(txs):
            xid = 700 + i
            gid = f"g{i}"
            vals = [str(p) for p in pks]
            inserts = [msg_insert(5001, v, f"v{v}") for v in vals]
            if mode == "plain":
                if not commits:
                    continue  # aborted plain txns never reach the wire
                delta += feed(msg_begin(lsn=0x1000 + i))
                for f in inserts:
                    delta += feed(f)
                delta += feed(msg_commit(end_lsn=0x2000 + i))
                if vals:
                    expected.append(vals)
            elif mode == "streamed":
                cut = len(inserts) // 2 if split else len(inserts)
                delta += feed(msg_stream_start(xid))
                for f in inserts[:cut]:
                    delta += feed(sx(f, xid))
                delta += feed(b"E")
                if split:
                    delta += feed(msg_stream_start(xid, first=0))
                    for f in inserts[cut:]:
                        delta += feed(sx(f, xid))
                    delta += feed(b"E")
                if commits:
                    delta += feed(msg_stream_commit(xid, end_lsn=0x3000 + i))
                    if vals:
                        expected.append(vals)
                else:
                    delta += feed(msg_stream_abort(xid, xid))
            elif mode == "prepared":
                delta += feed(msg_begin_prepare(gid, xid=xid))
                for f in inserts:
                    delta += feed(f)
                delta += feed(msg_prepare(gid, xid=xid))
                if commits:
                    delta += feed(msg_commit_prepared(gid, xid=xid))
                    if vals:
                        expected.append(vals)
                else:
                    delta += feed(msg_rollback_prepared(gid, xid=xid))
            else:  # stream_prep
                delta += feed(msg_stream_start(xid))
                for f in inserts:
                    delta += feed(sx(f, xid))
                delta += feed(b"E")
                delta += feed(msg_stream_prepare(gid, xid))
                if commits:
                    delta += feed(msg_commit_prepared(gid, xid=xid))
                    if vals:
                        expected.append(vals)
                else:
                    delta += feed(msg_rollback_prepared(gid, xid=xid))
        got = [
            [c["columnvalues"][0] for c in d["change"]] for d in asm.docs
        ]
        assert got == expected
        assert delta == sum(len(v) for v in expected)
        # nothing left buffered after every transaction decided
        assert not asm._streamed and not asm._prepared and not asm._in_tx

    run()


def test_tail_never_confirms_past_an_undecided_prepare(tmp_path):
    """Crash-safety for two-phase: while gid-X is prepared but
    undecided, a LATER committed transaction's flush must confirm only
    up to gid-X's first frame — otherwise a restart never redelivers
    the prepared changes and the eventual commit-prepared strands.
    Once commit-prepared lands, the confirm advances past it."""
    from test_lr_client import FakeWalsender

    from warp_pipe_spark.lr_client import LRClient
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    payloads = [
        REL,                                      # wal 100..
        msg_begin_prepare("gid-x"),               # prepared, UNDECIDED
        msg_insert(5001, "1", "held"),
        msg_prepare("gid-x"),
        msg_begin(lsn=0x5000),                    # a later plain commit
        msg_insert(5001, "2", "b"),
        msg_commit(end_lsn=0x5100),
    ]
    srv = FakeWalsender(
        payloads, keepalive_every=100, hang_silent_after_payloads=True
    )
    c = LRClient("127.0.0.1", srv.port, "testdb", "u", "wp_slot",
                 plugin="pgoutput", status_interval_s=9999)
    c.connect()
    drop = str(tmp_path / "drop")
    n = tail_pgoutput_to_drop_dir(
        c, drop, publication="pub", max_changes=1, idle_timeout_s=5.0,
        proto_version=3,
    )
    # wait: max_changes=1 would be satisfied by the plain commit, but
    # the bound also waits out undecided prepared transactions — the
    # idle timeout ends the drain instead, having flushed the plain doc
    import os as _os

    # only the plain commit's change was WRITTEN; the prepared-but-
    # undecided change stays buffered and is excluded from the count
    # (the un-confirmed server redelivers it after a restart, so
    # counting it now would double-count across the restart)
    assert n == 1
    files = _os.listdir(drop)
    assert len(files) == 1  # only the plain commit was written
    # FakeWalsender lays frames from 0x15D68C8, each advancing by its
    # payload length: the begin-prepare (frame 1) starts right after
    # REL — the confirm must stop EXACTLY there, not at the stream head
    floor = 0x15D68C8 + len(REL)
    assert c.flushed_lsn == floor, (c.flushed_lsn, floor)
    c.close()
    srv.thread.join(5)


def test_binary_date_outside_python_year_range_fails_loud():
    """PG dates span 4713 BC..5874897 AD; Python's stop at 9999. A
    binary date cell beyond that raises a NAMED protocol error (text
    mode renders such values fine — the fix is one flag) instead of a
    bare ValueError mid-tail."""
    from warp_pipe_spark.pgoutput import (
        PgOutputProtocolError,
        _pg_date_text,
        _pg_timestamp_text,
    )

    assert _pg_date_text(0x7FFFFFFF) == "infinity"
    with pytest.raises(PgOutputProtocolError, match="year range"):
        _pg_date_text(4_000_000)  # ~year 12950
    with pytest.raises(PgOutputProtocolError, match="year range"):
        _pg_timestamp_text(4_000_000 * 86_400_000_000)


def test_jsonb_binary_unknown_version_fails_loud():
    from warp_pipe_spark.pgoutput import (
        PgOutputProtocolError,
        _binary_to_text,
    )

    assert _binary_to_text(3802, b"\x01" + b"[1]") == "[1]"
    with pytest.raises(PgOutputProtocolError, match="jsonb binary version"):
        _binary_to_text(3802, b"\x02" + b"[1]")


def test_pg_float_text_rejects_midpoint_renderings():
    """PG's Ryu port refuses to print a value that sits exactly on a
    float midpoint (open information interval — defensive against
    readers without half-even rounding), even though such a string
    parses back correctly. Live fuzz found the float4 case: 257110208
    (ulp 16, lower midpoint 257110200 with 7 digits) must render with
    8 digits like float4out does, not numpy's 7."""
    from warp_pipe_spark.pgoutput import _pg_float_text

    v = struct.unpack("!f", bytes.fromhex("4d75330c"))[0]
    assert _pg_float_text(v, single=True) == "2.5711021e+08"
    # and the value still parses back either way (the point: PG's
    # choice is about output policy, not parse correctness)
    assert struct.unpack("!f", struct.pack("!f", float("2.571102e8")))[
        0
    ] == v


def test_idle_exit_with_open_stream_reports_zero_written(tmp_path):
    """The 'changes WRITTEN' contract on idle-timeout exits: a
    streamed in-progress transaction whose commit never arrives was
    counted change-by-change by feed(), but nothing reached the drop
    dir — the tail must return 0, not the buffered count (the
    un-confirmed server redelivers those changes after a restart, so
    counting them now would double-count across it)."""
    import json as _json
    import os as _os

    from test_lr_client import FakeWalsender

    from warp_pipe_spark.lr_client import LRClient
    from warp_pipe_spark.pgoutput import tail_pgoutput_to_drop_dir

    payloads = [
        msg_stream_start(700),
        sx(REL, 700),
        sx(msg_insert(5001, "1", "a"), 700),
        sx(msg_insert(5001, "2", "b"), 700),
        b"E",
        # no stream-commit: the wire goes silent mid-transaction
    ]
    srv = FakeWalsender(
        payloads, keepalive_every=100, hang_silent_after_payloads=True
    )
    c = LRClient("127.0.0.1", srv.port, "testdb", "u", "wp_slot",
                 plugin="pgoutput", status_interval_s=9999)
    c.connect()
    drop = str(tmp_path / "drop")
    n = tail_pgoutput_to_drop_dir(
        c, drop, publication="pub", proto_version=2, idle_timeout_s=3.0
    )
    c.close()
    assert n == 0
    assert _os.listdir(drop) == []
