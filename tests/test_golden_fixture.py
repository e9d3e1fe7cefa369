"""Golden end-to-end fixture: the reference's demo workload — 5 users
+ 5 pets (scripts/sql/create_fixture_schema.sql,
create_fixture_data.sql) plus one UPDATE and one DELETE — rendered as
the LITERAL wire bytes each capture mode emits:

  - LR mode: wal2json messages, one per transaction, positional
    columnnames/columntypes/columnvalues arrays (db/wal2json.go:4-26)
  - audit mode: warp_pipe.changesets rows with JSON new/old_values
    (db/sql.go:14-24, notify_listener.go:170-239)

Both wires decode and replay to the SAME final state, and the decoded
LR stream re-encodes to the reference's exact Changeset JSON
(changeset.go:37-43). This pins wire fidelity to the demo workload the
reference ships, not to shapes we invented."""

import json

import pytest
from pyspark.sql import functions as F

from warp_pipe_spark.apply import replay
from warp_pipe_spark.changeset import column_value, to_reference_json
from warp_pipe_spark.decoders import decode_audit_values, decode_wal2json

USERS = [
    (1, "Bob", "Silver", "bob@test.com"),
    (2, "Alice", "Gold", "alice@test.com"),
    (3, "Maria", "Hierro", "maria@test.com"),
    (4, "Wendy", "Steel", "wendy@test.com"),
    (5, "Silvio", "Bronce", "silvio@test.com"),
]
PETS = [
    (1, "Rex", 1),
    (2, "Fido", 2),
    (3, "Pichi", 3),
    (4, "Sambo", 4),
    (5, "Vincenzo", 5),
]

USER_COLS = ["id", "first_name", "last_name", "email"]
USER_TYPES = ["integer", "text", "text", "text"]
PET_COLS = ["id", "name", "owner_id"]
PET_TYPES = ["integer", "text", "integer"]


def _change(cid, kind, table, names, types, values, oldkeys=None):
    c = {
        "id": cid,
        "kind": kind,
        "schema": "public",
        "table": table,
        "columnnames": names,
        "columntypes": types,
        "columnvalues": values,
    }
    if oldkeys:
        c["oldkeys"] = oldkeys
    return c


# one wal2json message per transaction, exactly as the LR slot emits
WAL2JSON_LINES = [
    json.dumps(
        {
            "change": [
                _change(i + 1, "insert", "users", USER_COLS, USER_TYPES, list(u))
                for i, u in enumerate(USERS)
            ],
            "nextlsn": "0/16E4D30",
        }
    ),
    json.dumps(
        {
            "change": [
                _change(i + 6, "insert", "pets", PET_COLS, PET_TYPES, list(p))
                for i, p in enumerate(PETS)
            ],
            "nextlsn": "0/16F1A08",
        }
    ),
    # session 2: Alice's email changes; Vincenzo is deleted
    json.dumps(
        {
            "change": [
                _change(
                    11,
                    "update",
                    "users",
                    USER_COLS,
                    USER_TYPES,
                    [2, "Alice", "Gold", "alice.gold@test.com"],
                    oldkeys={
                        "keynames": ["id"],
                        "keytypes": ["integer"],
                        "keyvalues": [2],
                    },
                ),
                {
                    "id": 12,
                    "kind": "delete",
                    "schema": "public",
                    "table": "pets",
                    "oldkeys": {
                        "keynames": ["id"],
                        "keytypes": ["integer"],
                        "keyvalues": [5],
                    },
                },
            ],
            "nextlsn": "0/1701B60",
        }
    ),
]

# the same workload as audit-table rows (trigger capture)
AUDIT_ROWS = (
    [
        (i + 1, "INSERT", "public", "users", json.dumps(dict(zip(USER_COLS, u))), None)
        for i, u in enumerate(USERS)
    ]
    + [
        (i + 6, "INSERT", "public", "pets", json.dumps(dict(zip(PET_COLS, p))), None)
        for i, p in enumerate(PETS)
    ]
    + [
        (
            11,
            "UPDATE",
            "public",
            "users",
            json.dumps(
                {
                    "id": 2,
                    "first_name": "Alice",
                    "last_name": "Gold",
                    "email": "alice.gold@test.com",
                }
            ),
            json.dumps({"id": 2}),
        ),
        (12, "DELETE", "public", "pets", None, json.dumps({"id": 5})),
    ]
)

FINAL_USERS = {
    (1, "bob@test.com"),
    (2, "alice.gold@test.com"),
    (3, "maria@test.com"),
    (4, "wendy@test.com"),
    (5, "silvio@test.com"),
}
FINAL_PETS = {(1, "Rex"), (2, "Fido"), (3, "Pichi"), (4, "Sambo")}


@pytest.fixture(scope="module")
def lr_decoded(spark):
    df = spark.createDataFrame([(m,) for m in WAL2JSON_LINES], "message STRING")
    return decode_wal2json(df).localCheckpoint()


def _final_state(decoded, pk_from_old=True):
    """Type the decoded stream and fold it, per table."""
    pk = column_value("new_values", "id")
    if pk_from_old:
        pk = F.coalesce(pk, column_value("old_values", "id"))
    typed = decoded.select(
        "id",
        "kind",
        F.col("table").alias("table_name"),
        pk.cast("long").alias("pk"),
        column_value("new_values", "email").alias("email"),
        column_value("new_values", "name").alias("name"),
    )
    return replay(typed, ["pk"], kind_col="kind")


def test_wal2json_demo_workload_decodes_exactly(lr_decoded):
    rows = lr_decoded.orderBy("id").collect()
    assert [r["id"] for r in rows] == list(range(1, 13))
    assert [r["kind"] for r in rows] == ["insert"] * 10 + ["update", "delete"]
    # positional fidelity on the first users insert
    first = rows[0]
    assert [c["column"] for c in first["new_values"]] == USER_COLS
    assert [c["type"] for c in first["new_values"]] == USER_TYPES
    assert [c["value"] for c in first["new_values"]] == [
        "1",
        "Bob",
        "Silver",
        "bob@test.com",
    ]
    # delete carries oldkeys only
    dele = rows[11]
    assert dele["new_values"] is None
    assert [c["value"] for c in dele["old_values"]] == ["5"]
    # per-transaction LSN fan-out
    assert {r["nextlsn"] for r in rows[:5]} == {"0/16E4D30"}


def test_wal2json_workload_replays_to_demo_final_state(lr_decoded):
    state = _final_state(lr_decoded)
    users = {
        (r["pk"], r["email"])
        for r in state.filter("table_name = 'users'").collect()
    }
    pets = {
        (r["pk"], r["name"]) for r in state.filter("table_name = 'pets'").collect()
    }
    assert users == FINAL_USERS
    assert pets == FINAL_PETS


def test_audit_workload_converges_to_same_state(spark, lr_decoded):
    audit = spark.createDataFrame(
        [(i, None, a, s, t, nv, ov) for (i, a, s, t, nv, ov) in AUDIT_ROWS],
        "id LONG, ts TIMESTAMP, action STRING, schema_name STRING, "
        "table_name STRING, new_values STRING, old_values STRING",
    )
    dec = decode_audit_values(audit)
    typed = dec.select(
        "id",
        "kind",
        F.col("table").alias("table_name"),
        F.coalesce(
            F.try_element_at("new_values", F.lit("id")),
            F.try_element_at("old_values", F.lit("id")),
        )
        .cast("long")
        .alias("pk"),
        F.try_element_at("new_values", F.lit("email")).alias("email"),
        F.try_element_at("new_values", F.lit("name")).alias("name"),
    )
    state = replay(typed, ["pk"], kind_col="kind")
    users = {
        (r["pk"], r["email"])
        for r in state.filter("table_name = 'users'").collect()
    }
    pets = {
        (r["pk"], r["name"]) for r in state.filter("table_name = 'pets'").collect()
    }
    assert users == FINAL_USERS
    assert pets == FINAL_PETS


def test_lr_stream_reencodes_to_reference_changeset_json(lr_decoded):
    """json.Marshal(Changeset) fidelity over the demo workload
    (changeset.go:37-43): exact key order, zero-time timestamp,
    positional new_values structs."""
    out = {
        json.loads(r["json"])["id"]: r["json"]
        for r in to_reference_json(lr_decoded).collect()
    }
    assert out[1] == (
        '{"id":1,"kind":"insert","schema":"public","table":"users",'
        '"timestamp":"0001-01-01T00:00:00Z",'
        '"new_values":[{"column":"id","value":"1","type":"integer"},'
        '{"column":"first_name","value":"Bob","type":"text"},'
        '{"column":"last_name","value":"Silver","type":"text"},'
        '{"column":"email","value":"bob@test.com","type":"text"}],'
        '"old_values":null}'
    )
    # the delete: null new_values, oldkeys carried
    d = json.loads(out[12])
    assert d["new_values"] is None
    assert d["old_values"] == [{"column": "id", "value": "5", "type": "integer"}]
