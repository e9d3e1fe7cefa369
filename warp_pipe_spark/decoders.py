"""Wire-format decoders: wal2json messages and audit-table rows →
normalized changesets.

Parity:
  - P4 wal2json decode + fan-out (lr_listener.go:214-255) over the
    message shape in db/wal2json.go:4-26.
  - P5 audit-row decode (notify_listener.go:170-239) including the
    raw-JSON-string passthrough rule for nested objects
    (notify_listener.go:192-198): values stay unparsed text so checksum
    fidelity survives round-trips.

Everything is `from_json` / `explode` / `arrays_zip` / `transform` —
pure Catalyst expressions, whole-stage-codegen'd, no Python in the hot
path. At 100 TB the decode is embarrassingly parallel: one narrow stage
fused into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from warp_pipe_spark.changeset import normalize_kind

# wal2json message schema (db/wal2json.go:4-26). Values arrive as
# heterogeneous JSON; we keep them as raw strings for fidelity.
WAL2JSON_SCHEMA = T.StructType(
    [
        T.StructField(
            "change",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("kind", T.StringType()),
                        T.StructField("schema", T.StringType()),
                        T.StructField("table", T.StringType()),
                        T.StructField("columnnames", T.ArrayType(T.StringType())),
                        T.StructField("columntypes", T.ArrayType(T.StringType())),
                        T.StructField("columnvalues", T.ArrayType(T.StringType())),
                        T.StructField(
                            "oldkeys",
                            T.StructType(
                                [
                                    T.StructField("keynames", T.ArrayType(T.StringType())),
                                    T.StructField("keytypes", T.ArrayType(T.StringType())),
                                    T.StructField("keyvalues", T.ArrayType(T.StringType())),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField("nextlsn", T.StringType()),
    ]
)


def _zip_columns(names: F.Column, types: F.Column, values: F.Column) -> F.Column:
    """Zip the three positional arrays into ordered column structs
    (lr_listener.go:231-251). arrays_zip + transform keeps it JVM-side."""
    zipped = F.arrays_zip(names.alias("column"), values.alias("value"), types.alias("type"))
    return F.transform(
        zipped,
        lambda x: F.struct(
            x["column"].alias("column"), x["value"].alias("value"), x["type"].alias("type")
        ),
    )


def decode_wal2json(df: DataFrame, message_col: str = "message") -> DataFrame:
    """P4: parse wal2json message JSON, explode the per-transaction
    `change` array (1→N fan-out), zip positional arrays into structs.

    Input: any DataFrame with a string column of wal2json documents.
    Output: normalized changeset rows
    (id, kind, schema, table, timestamp?, new_values, old_values, nextlsn).

    Corrupt input: from_json yields NULL for an unparseable document
    and the explode then emits NO rows for it — decode is permissive
    by design (Spark's from_json PERMISSIVE mode). A pipeline that must
    account for every input line dead-letters the complement FIRST via
    `wal2json_undecodable` (below); silently losing corrupt CDC input
    is not acceptable at the ingest boundary.
    """
    parsed = df.withColumn("_msg", F.from_json(F.col(message_col), WAL2JSON_SCHEMA))
    ch = parsed.select(
        F.col("_msg.nextlsn").alias("nextlsn"),
        F.explode("_msg.change").alias("c"),
    )
    has_old = F.col("c.oldkeys.keynames").isNotNull()
    return ch.select(
        F.col("c.id").alias("id"),
        normalize_kind(F.col("c.kind")).alias("kind"),
        F.col("c.schema").alias("schema"),
        F.col("c.table").alias("table"),
        _zip_columns(
            F.col("c.columnnames"), F.col("c.columntypes"), F.col("c.columnvalues")
        ).alias("new_values"),
        F.when(
            has_old,
            _zip_columns(
                F.col("c.oldkeys.keynames"),
                F.col("c.oldkeys.keytypes"),
                F.col("c.oldkeys.keyvalues"),
            ),
        ).alias("old_values"),
        F.col("nextlsn"),
    )


def wal2json_undecodable(df: DataFrame, message_col: str = "message") -> DataFrame:
    """The dead-letter complement of decode_wal2json: raw input rows
    whose document does NOT parse against WAL2JSON_SCHEMA (from_json →
    NULL). decode_wal2json's explode silently emits nothing for these;
    an ingest pipeline writes this frame to its dead-letter sink so a
    truncated/garbled CDC message is an auditable event, not a silent
    gap in replay state. Flags malformed JSON (from_json → NULL) AND
    structurally-foreign JSON (no `change` array — valid JSON that is
    not a wal2json document). Zero-shuffle map-side filter."""
    parsed = F.from_json(F.col(message_col), WAL2JSON_SCHEMA)
    return df.filter(
        F.col(message_col).isNotNull()
        & (parsed.isNull() | parsed["change"].isNull())
    )


def decode_audit_values(df: DataFrame) -> DataFrame:
    """P5: audit-log rows → map-form changesets.

    ``new_values``/``old_values`` JSON objects become
    ``MAP<STRING,STRING>`` — order is already lost in audit mode
    (changeset.go:58-60), and nested objects/arrays survive as their raw
    JSON text (the reference re-serializes maps back to strings,
    notify_listener.go:192-198; `from_json` to MAP<STRING,STRING> keeps
    nested JSON as the unparsed substring, same invariant).
    """
    mt = T.MapType(T.StringType(), T.StringType())
    return df.select(
        F.col("id"),
        F.col("ts").alias("timestamp"),
        normalize_kind(F.col("action")).alias("kind"),
        F.col("schema_name").alias("schema"),
        F.col("table_name").alias("table"),
        F.from_json("new_values", mt).alias("new_values"),
        F.from_json("old_values", mt).alias("old_values"),
    )


def outbox_messages(
    decoded: DataFrame, prefix: str | None = None
) -> DataFrame:
    """Extract logical-decoding messages (kind='message', the
    pg_logical_emit_message outbox mechanism — pgoutput.py 'M' frames)
    from a decoded changeset stream: (id, prefix, content BINARY,
    nextlsn). The bytea-hex text round-trips back to real bytes via
    unhex — consumers get the exact payload the producer emitted.
    `prefix` narrows to one outbox topic (the producer-side routing
    convention). Pure Catalyst filter+project: fuses into the decode
    scan, and the prefix filter prunes at the source."""
    from warp_pipe_spark.changeset import column_value

    msgs = decoded.filter(F.col("kind") == "message")
    if prefix is not None:
        msgs = msgs.filter(
            column_value("new_values", "prefix") == F.lit(prefix)
        )
    return msgs.select(
        "id",
        column_value("new_values", "prefix").alias("prefix"),
        F.unhex(
            F.regexp_replace(
                column_value("new_values", "content"), r"^\\x", ""
            )
        ).alias("content"),
        F.col("nextlsn"),
    )


# wal2json FORMAT-VERSION 2 (the plugin's `format-version 2` option —
# public wal2json docs): ONE JSON object PER CHANGE instead of one per
# transaction, actions as single letters, columns/identity as
# name/type/value struct arrays. The reference is format-v1-locked
# (db/wal2json.go:4-26); v2 is what most modern wal2json deployments
# emit, so decoding it natively widens the S1 source surface.
WAL2JSON_V2_SCHEMA = T.StructType(
    [
        T.StructField("action", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("lsn", T.StringType()),      # include-lsn option
        T.StructField("xid", T.LongType()),        # include-xids option
        T.StructField("timestamp", T.StringType()),
        T.StructField(
            "columns",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "identity",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def _lsn_to_long(lsn: F.Column) -> F.Column:
    """'X/Y' hex WAL position → one monotone BIGINT ((X<<32)|Y) — the
    same replay-stable recency key the v1 path's per-change id carries."""
    hi = F.conv(F.split(lsn, "/")[0], 16, 10).cast("long")
    lo = F.conv(F.split(lsn, "/")[1], 16, 10).cast("long")
    return F.shiftleft(hi, 32) + lo


def decode_wal2json_v2(df: DataFrame, message_col: str = "message") -> DataFrame:
    """wal2json format-version 2 → the SAME normalized changeset shape
    decode_wal2json (v1) produces: (id, kind, schema, table,
    new_values, old_values, nextlsn) — so everything downstream
    (pipeline, apply, sinks) is format-agnostic.

    Mapping: actions I/U/D/T → insert/update/delete/truncate;
    B (begin) / C (commit) / M (message) rows are transaction framing
    with no row image and are filtered out; `columns` → new_values,
    `identity` (the replica-identity old key on U/D) → old_values;
    `id` comes from the include-lsn option's WAL position (NULL when
    the option is off — a deployment wanting LWW replay must enable
    it; v1 needs include-lsn for `nextlsn` the same way). Values are
    raw strings for checksum fidelity — Spark's from_json renders
    non-string JSON scalars as their literal text. Pure Catalyst, same
    one-narrow-stage plan as the v1 decode."""
    parsed = df.withColumn(
        "_m", F.from_json(F.col(message_col), WAL2JSON_V2_SCHEMA)
    )
    act = F.col("_m.action")
    kind = (
        F.when(act == "I", F.lit("insert"))
        .when(act == "U", F.lit("update"))
        .when(act == "D", F.lit("delete"))
        .when(act == "T", F.lit("truncate"))
    )
    to_cols = lambda c: F.transform(  # noqa: E731
        c,
        lambda x: F.struct(
            x["name"].alias("column"),
            x["value"].alias("value"),
            x["type"].alias("type"),
        ),
    )
    return (
        parsed.filter(act.isin("I", "U", "D", "T"))
        .select(
            _lsn_to_long(F.col("_m.lsn")).alias("id"),
            kind.alias("kind"),
            F.col("_m.schema").alias("schema"),
            F.col("_m.table").alias("table"),
            to_cols(F.col("_m.columns")).alias("new_values"),
            to_cols(F.col("_m.identity")).alias("old_values"),
            F.col("_m.lsn").alias("nextlsn"),
        )
    )


# Debezium JSON envelope (schemaless / unwrapped value converter) — the
# public shape a Kafka+Debezium deployment of the LR capture path (S1,
# lr_listener.go:92-131) delivers: {before, after, source{...}, op,
# ts_ms}. Row images are kept as MAP<STRING,STRING> with the same
# raw-JSON passthrough invariant as the audit decode.
DEBEZIUM_SCHEMA = T.StructType(
    [
        T.StructField("before", T.MapType(T.StringType(), T.StringType())),
        T.StructField("after", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("db", T.StringType()),
                    T.StructField("schema", T.StringType()),
                    T.StructField("table", T.StringType()),
                    T.StructField("lsn", T.LongType()),
                    T.StructField("txId", T.LongType()),
                ]
            ),
        ),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def decode_debezium(df: DataFrame, message_col: str = "value") -> DataFrame:
    """Debezium envelope → normalized changeset rows.

    op mapping per the public Debezium contract: c (create) and r
    (snapshot read) → insert, u → update, d → delete; anything else →
    '' (the reference's lenient unknown-kind rule, changeset.go:29-31).
    `source.lsn` becomes the monotone id (the replication-slot LSN is
    Debezium's ordering key for Postgres), ts_ms the event timestamp.
    Pure Catalyst — from_json + a CASE — so at 100 TB the decode fuses
    into the Kafka-scan stage exactly like the wal2json path (P4).
    """
    parsed = df.withColumn(
        "_e", F.from_json(F.col(message_col), DEBEZIUM_SCHEMA)
    )
    op = F.col("_e.op")
    kind = (
        F.when(op.isin("c", "r"), F.lit("insert"))
        .when(op == "u", F.lit("update"))
        .when(op == "d", F.lit("delete"))
        .otherwise(F.lit(""))
    )
    return parsed.select(
        F.col("_e.source.lsn").alias("id"),
        kind.alias("kind"),
        F.col("_e.source.schema").alias("schema"),
        F.col("_e.source.table").alias("table"),
        F.timestamp_millis(F.col("_e.ts_ms")).alias("timestamp"),
        F.col("_e.after").alias("new_values"),
        F.col("_e.before").alias("old_values"),
        F.col("_e.op").alias("op"),
        F.col("_e.source.txId").alias("tx_id"),
    )
