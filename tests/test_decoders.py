"""Wire-format decoders — golden shapes from db/wal2json.go:4-26 and
the audit row model (db/sql.go:14-24), per FIXTURES.md §2."""

import json

from warp_pipe_spark.decoders import decode_audit_values, decode_wal2json

WAL2JSON_MSG = json.dumps(
    {
        "change": [
            {
                "id": 1,
                "kind": "insert",
                "schema": "public",
                "table": "users",
                "columnnames": ["id", "first_name", "last_name", "email"],
                "columntypes": ["integer", "text", "text", "text"],
                "columnvalues": [1, "Bob", "Silver", "bob@test.com"],
            },
            {
                "id": 2,
                "kind": "UPDATE",
                "schema": "public",
                "table": "users",
                "columnnames": ["id", "first_name"],
                "columntypes": ["integer", "text"],
                "columnvalues": [1, "Robert"],
                "oldkeys": {
                    "keynames": ["id"],
                    "keytypes": ["integer"],
                    "keyvalues": [1],
                },
            },
        ],
        "nextlsn": "0/17025E8",
    }
)


def test_wal2json_decode_explodes_and_zips(spark):
    df = spark.createDataFrame([(WAL2JSON_MSG,)], ["message"])
    out = decode_wal2json(df).orderBy("id").collect()
    assert len(out) == 2  # 1→N explode of the change array (P4)

    ins = out[0]
    assert ins["kind"] == "insert"
    assert ins["table"] == "users"
    assert [c["column"] for c in ins["new_values"]] == [
        "id",
        "first_name",
        "last_name",
        "email",
    ]  # column ORDER preserved (wal2json fidelity)
    assert [c["value"] for c in ins["new_values"]] == ["1", "Bob", "Silver", "bob@test.com"]
    assert ins["old_values"] is None  # no oldkeys on insert
    assert ins["nextlsn"] == "0/17025E8"

    upd = out[1]
    assert upd["kind"] == "update"  # normalized from "UPDATE"
    assert [c["value"] for c in upd["old_values"]] == ["1"]
    assert [c["type"] for c in upd["old_values"]] == ["integer"]


def test_audit_decode_keeps_nested_json_as_raw_string(spark):
    # notify_listener.go:192-198: nested objects stay unparsed JSON text
    new_vals = json.dumps({"id": 7, "profile": {"a": [1, 2]}, "note": "hi"})
    df = spark.createDataFrame(
        [(10, None, "INSERT", "public", "users", 1234, new_vals, None)],
        "id LONG, ts TIMESTAMP, action STRING, schema_name STRING, table_name STRING, relid LONG, new_values STRING, old_values STRING",
    )
    row = decode_audit_values(df).collect()[0]
    assert row["kind"] == "insert"
    assert row["new_values"]["id"] == "7"
    assert json.loads(row["new_values"]["profile"]) == {"a": [1, 2]}  # raw JSON survives
    assert row["old_values"] is None
