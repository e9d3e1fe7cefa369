"""Table loading + the deterministic changeset-log derivation.

The driver's testdata (TESTDATA.md) has no changeset log, so the CDC
fixtures are DERIVED from the `events` table, deterministically and
seed-free, exactly as FIXTURES.md §4 prescribes: every event becomes an
INSERT; a deterministic subset gets a follow-up UPDATE (event_id % 10
== 0) and DELETE (event_id % 20 == 0); ids are assigned so replay order
is insert < update < delete per key. `table_name` is the event_type, so
the log naturally interleaves five "tables" for whitelist/ignore tests.

The SAME derivation exists twice, intentionally:
  - `derive_changesets(spark, sf_dir)` — DataFrame build (three narrow
    projections + unionByName; no shuffle, fused by codegen).
  - `CHANGESETS_CTE` — the ANSI-SQL equivalent the DuckDB oracle runs.
Both must stay in lock-step; tests/test_entry.py compares them.

Typed ("decoded") columns are used rather than JSON strings so values
compare bit-identically across engines; the engine's faithful JSON log
form is produced by `changesets_as_audit_log` (to_json) on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

_BYTE_SUFFIXES = {
    "": 1,
    "b": 1,
    "k": 1024,
    "kb": 1024,
    "m": 1024**2,
    "mb": 1024**2,
    "g": 1024**3,
    "gb": 1024**3,
    "t": 1024**4,
    "tb": 1024**4,
    "p": 1024**5,
    "pb": 1024**5,
}


def parse_spark_bytes(s: str) -> int:
    """Spark byte-string grammar (JavaUtils.byteStringAs): an integer
    with an optional case-insensitive k/m/g/t/p suffix, each optionally
    followed by 'b'; bare numbers are bytes (maxPartitionBytes'
    default unit). ADVICE r13: the previous .rstrip('b') hack parsed
    '134217728b' but raised on '128m'/'64mb'/'1g', silently mis-sizing
    fan_out's leaf-stats threshold whenever the session set the conf
    in the human form Spark itself documents. Raises ValueError on
    anything outside the grammar — callers choose their own fallback."""
    t = s.strip().lower()
    num = t.rstrip("kmgtpb")
    try:
        factor = _BYTE_SUFFIXES[t[len(num):]]
    except KeyError:
        raise ValueError(f"not a Spark byte string: {s!r}") from None
    return int(num) * factor


def fan_out(df: DataFrame, *cols: str) -> DataFrame:
    """Spread a narrow frame across the session's cores before a
    high-fan-out stage (a 9-family shingle explode, a per-doc media
    encode): Spark cannot split a partition mid-stage, so a small
    single-split scan serializes a 300× Generate or a per-row codec
    onto one core while 31 idle. NO-OP when the plan's LEAF scans are
    big enough to have produced >= defaultParallelism input splits —
    at real scale those splits provide the parallelism and the
    exchange would be pure cost; the shuffle this inserts on the
    small-input path moves only the narrow pre-explosion projection.

    The guard reads the optimized logical plan's leaf statistics, NOT
    df.rdd.getNumPartitions() (the pre-r13 check): for any plan
    containing a shuffle the static partition count reports
    spark.sql.shuffle.partitions and the helper no-opped, even though
    AQE coalesces the post-shuffle stage to ~1 runtime partition on
    exactly the small inputs this targets (e.g. the multiply-joined
    corpus inside curate_corpus) — and the .rdd probe itself forced a
    full physical-plan/RDD conversion per call on the driver. Leaf
    bytes are a plan-time constant: small leaves can never yield wide
    runtime stages, big leaves mean the scan already parallelizes.
    Pass key columns to hash-partition (keeps a doc's rows together);
    none for round-robin."""
    spark = df.sparkSession
    sc = spark.sparkContext
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        leaves = plan.collectLeaves()
        leaf_bytes = 0
        for i in range(leaves.size()):
            v = leaves.apply(i).stats().sizeInBytes()
            # py4j hands small scala BigInts back as Python ints and
            # big ones as JavaObjects — normalize via str for both
            leaf_bytes += v if isinstance(v, int) else int(str(v))
        try:
            max_split = parse_spark_bytes(
                spark.conf.get("spark.sql.files.maxPartitionBytes")
            )
        except (ValueError, AttributeError):
            max_split = 128 * 1024 * 1024
        if leaf_bytes >= sc.defaultParallelism * max_split:
            return df
    except Exception:
        # stats unavailable (exotic relation) — fall back to the
        # static partition probe rather than fail the query
        if df.rdd.getNumPartitions() >= sc.defaultParallelism:
            return df
    if cols:
        return df.repartition(sc.defaultParallelism, *cols)
    return df.repartition(sc.defaultParallelism)


def explode_nonnull(df: DataFrame, arr, alias: str) -> DataFrame:
    """explode() for an EXPENSIVE array expression whose elements are
    never null. Plain explode() makes the optimizer infer a
    `size(arr) > 0 AND isnotnull(arr)` pre-filter (Generate's implicit
    skip of null/empty arrays, surfaced as a Filter) and push it below
    any repartition by INLINING the full array expression — so a
    shingling+md5 transform runs once more, BEFORE the fan_out
    exchange, serialized on the small scan's single split. The
    outer-explode + cheap post-Generate null filter computes the array
    exactly once, after the spread, and is row-identical to explode()
    as long as no ELEMENT is null (an empty/null array yields one null
    row, dropped here; explode() yields none) — callers must only pass
    arrays with non-null elements (hash/token transforms qualify).

    MISUSE IS SILENT (ADVICE r14): an array with null ELEMENTS loses
    those rows here where plain explode() would emit them as null rows.
    Before converting a new site, prove the element-nonnull invariant
    (or assert it once in a test with
    `df.filter(exists(arr, x -> x IS NULL)).count() == 0`); do not use
    this helper as a drop-null-elements combinator — write the intent
    out with an explicit `filter` if that is what you mean."""
    return df.withColumn(alias, F.explode_outer(arr)).filter(
        F.col(alias).isNotNull()
    )


def scratch_dir(prefix: str) -> str:
    """mkdtemp preferring tmpfs (/dev/shm): soak/sink BENCH fixtures
    measure state-commit cost, and a disk-backed tempdir folds storage
    aging into the measurement (the keyset drain drifted 12.98→18.2 s
    across otherwise-idle runs purely from filesystem variance) —
    RAM-backed scratch keeps the fixture measuring the engine. Falls
    back to the system default when /dev/shm is missing or read-only;
    the sinks are path-agnostic, so only the noise floor changes.

    Every directory is registered for removal at interpreter exit:
    registered queries hand the returned DataFrame to a caller that
    never sees the sink path (the driver just collects it), so nobody
    else CAN clean up — and an uncollected tmpfs dir is RAM held until
    reboot, which accumulates across bench/correctness invocations and
    can exhaust /dev/shm's 50%-of-RAM cap. atexit runs after any
    collection of the returned frame (same process), and callers that
    rmtree earlier (bench.py's soak fixture) are harmless double-frees
    under ignore_errors."""
    import atexit
    import os
    import shutil
    import tempfile

    base = "/dev/shm"
    if os.path.isdir(base) and os.access(base, os.W_OK):
        path = tempfile.mkdtemp(prefix=prefix, dir=base)
    else:
        path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Testdata timestamps are naive parquet TIMESTAMP(MICROS)
    # (isAdjustedToUTC=false). Spark 4 infers those as TIMESTAMP_NTZ,
    # which unix_millis()/window() reject. Disabling NTZ inference reads
    # the stored micros as TIMESTAMP_LTZ epoch values directly — exactly
    # DuckDB's epoch_ms(naive ts) semantics, independent of session tz.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        # Older testdata generations used TIMESTAMP(NANOS), which Spark 4
        # rejects; read nanos as long and convert to a microsecond
        # timestamp (same truncation DuckDB applies for epoch_ms).
        # Scoped to THIS read (schema conversion happens at read();
        # execution after the restore is verified safe): left session-
        # global, every later parquet read would silently get bigint
        # nanos columns — without this fixup — instead of Spark 4's
        # loud rejection, order-dependent on whether events loaded first.
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division — double division loses ULPs at 1e18 ns
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Spark-WRITTEN parquet carries its own schema in the footer
    # metadata, which overrides the NTZ-inference conf — a file written
    # from an NTZ frame stays NTZ however it is read. Cast such columns
    # to LTZ here (sessions run UTC, warp_pipe_spark.session pins it),
    # so every consumer sees plain TIMESTAMP whatever wrote the file.
    from pyspark.sql import types as T

    ntz = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)
    ]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load and register temp views so both DataFrame and spark.sql
    queries see the same tables."""
    out = {}
    for n in names:
        df = read_table(spark, sf_dir, n)
        df.createOrReplaceTempView(n)
        out[n] = df
    return out


# --- deterministic changeset derivation (FIXTURES.md §4) -------------------

def derive_changesets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → typed changeset log.

    Columns: id, ts, action, schema_name, table_name, relid,
    pk, user_id, event_type, value. Per key (pk = event_id):
    INSERT@id*10, optional UPDATE@id*10+5 (+1h, value+1000), optional
    DELETE@id*10+7 (+2h).

    ONE parquet scan: each event builds its 1-3 change structs as an
    array and explodes — ~40% faster than the equivalent 3-branch
    union, which re-reads the scan per branch. Same rows either way
    (asserted in tests against the union form and the SQL CTE).
    """
    ev = read_table(spark, sf_dir, "events")

    def mk(action: str, id_off: int, hours: int, value_col: F.Column) -> F.Column:
        return F.struct(
            (F.col("event_id") * 10 + id_off).alias("id"),
            (F.col("ts") + F.expr(f"INTERVAL {hours} HOUR")).alias("ts"),
            F.lit(action).alias("action"),
            value_col.alias("value"),
        )

    empty = F.array().cast(
        "array<struct<id:bigint,ts:timestamp,action:string,value:double>>"
    )
    arr = F.concat(
        F.array(mk("INSERT", 0, 0, F.col("value"))),
        F.when(
            F.col("event_id") % 10 == 0,
            F.array(mk("UPDATE", 5, 1, F.col("value") + F.lit(1000.0))),
        ).otherwise(empty),
        F.when(
            F.col("event_id") % 20 == 0, F.array(mk("DELETE", 7, 2, F.col("value")))
        ).otherwise(empty),
    )
    # explode_nonnull, not explode: the inferred size(arr)>0 filter
    # would rebuild the 1-3 struct array a second time per event (see
    # the helper's docstring); arr always holds the INSERT, so the
    # outer form drops nothing
    ex = explode_nonnull(ev, arr, "c").select(
        "event_id", "user_id", "event_type", "c"
    )
    return ex.select(
        F.col("c.id").alias("id"),
        F.col("c.ts").alias("ts"),
        F.col("c.action").alias("action"),
        F.lit("public").alias("schema_name"),
        F.col("event_type").alias("table_name"),
        (F.lit(50000) + F.col("event_id") % 5).alias("relid"),
        F.col("event_id").alias("pk"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("c.value").alias("value"),
    )


# DuckDB-side equivalent. The oracle harness pre-registers `events`.
CHANGESETS_CTE = """
changesets AS (
  SELECT event_id * 10 AS id, ts, 'INSERT' AS action,
         'public' AS schema_name, event_type AS table_name,
         50000 + (event_id % 5) AS relid,
         event_id AS pk, user_id, event_type, value
  FROM events
  UNION ALL
  SELECT event_id * 10 + 5, ts + INTERVAL 1 HOUR, 'UPDATE',
         'public', event_type, 50000 + (event_id % 5),
         event_id, user_id, event_type, value + 1000.0
  FROM events WHERE event_id % 10 = 0
  UNION ALL
  SELECT event_id * 10 + 7, ts + INTERVAL 2 HOUR, 'DELETE',
         'public', event_type, 50000 + (event_id % 5),
         event_id, user_id, event_type, value
  FROM events WHERE event_id % 20 = 0
)
"""


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: "tuple[str, ...] | list[str]",
    n_buckets: int = 32,
    path: str | None = None,
    sort_by: "tuple[str, ...] | list[str] | None" = None,
) -> None:
    """Persist `df` hash-bucketed by `keys` — the co-located-join
    primitive. Two tables bucketed by the same key with the same bucket
    count join with ZERO exchanges (each bucket pairs 1:1), which at
    100 TB removes the dominant shuffle from repeated fact-to-fact
    joins; `sort_by` additionally pre-sorts within buckets so the
    sort-merge join skips its Sort. Asserted in tests/test_bucketing.py.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_dataset(
    df: DataFrame,
    path: str,
    partition_by: "tuple[str, ...] | list[str] | None" = None,
    max_records_per_file: int | None = None,
    files_per_partition: int = 1,
) -> None:
    """Hive-partitioned dataset writer that CANNOT small-file-explode.

    The naive `df.write.partitionBy(k)` emits one file per (task ×
    partition-value) — with 200 tasks and 1,000 dates that's 200k tiny
    files, the classic 100 TB lake-rot failure. This writer first
    repartitions BY THE PARTITION COLUMNS, so with
    files_per_partition=1 (the default) each partition directory gets
    EXACTLY one task's output. files_per_partition>1 adds a per-row
    salt — a DETERMINISTIC hash of the whole row mod N, never
    monotonically_increasing_id: a nondeterministic shuffle key is the
    SPARK-23207 correctness hole, where a fetch-failure recompute
    re-keys rows differently and the output silently drops/duplicates
    rows. Identical rows share a salt (they cannot be told apart
    anyway); hash collisions between (value, salt) groups can still
    merge tasks, so >1 is a parallelism knob, not an exact file
    count. `maxRecordsPerFile`
    caps file size where a single partition value is huge (the
    skewed-date case) — Spark splits the oversized task output into
    sequentially-numbered files.
    """
    w = df
    if partition_by:
        parts = [F.col(c) for c in partition_by]
        if files_per_partition > 1:
            salt = F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns]),
                F.lit(files_per_partition),
            )
            w = df.repartition(*(parts + [salt]))
        else:
            w = df.repartition(*parts)
    writer = w.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def recover_swap(path: str) -> bool:
    """Heal the rewrite-and-swap crash window: if a compaction crashed
    between `rename(path→trash)` and `rename(tmp→path)`, the dataset
    still exists in full at `<path>._trash` — restore it. Called at the
    start of every compaction (and safe to call from any reader that
    finds `path` missing). Returns True if a recovery happened."""
    import os
    import shutil

    trash = path + "._trash"
    if not os.path.exists(path) and os.path.isdir(trash):
        os.rename(trash, path)
        shutil.rmtree(path + "._compact", ignore_errors=True)
        return True
    return False


def compact_dataset(
    spark: SparkSession, path: str, target_files: int = 1
) -> dict[str, int]:
    """Small-file compaction: rewrite an (optionally Hive-partitioned)
    parquet dataset down to `target_files` per partition directory —
    the maintenance job every long-lived streaming sink needs, since
    each micro-batch appends at least one file per touched partition.
    Same rewrite-and-swap discipline as store.retention_compact; the
    crash window between the two renames is healed by `recover_swap`
    (the data always exists in full at either `path` or `._trash`).
    Returns {"files_before": n, "files_after": m}.
    """
    import os
    import shutil

    recover_swap(path)

    def count_files(p: str) -> int:
        return sum(
            1
            for root, _, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )

    before = count_files(path)
    df = spark.read.parquet(path)
    # partition columns are inferred from the directory layout
    part_cols = [
        f.name
        for f in df.schema.fields
        if any(
            seg.startswith(f.name + "=")
            for root, dirs, _ in os.walk(path)
            for seg in dirs
        )
    ]
    tmp, trash = path + "._compact", path + "._trash"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(trash, ignore_errors=True)
    if part_cols:
        write_dataset(df, tmp, partition_by=part_cols, files_per_partition=target_files)
    else:
        df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    os.rename(path, trash)
    os.rename(tmp, path)
    shutil.rmtree(trash)
    return {"files_before": before, "files_after": count_files(path)}


def changesets_as_audit_log(cs: DataFrame) -> DataFrame:
    """Typed changesets → faithful AUDIT_LOG_SCHEMA form: values as raw
    JSON strings (db/sql.go:14-24; NULL new_values for DELETE, NULL
    old_values for INSERT, db/sql.go:72-110).

    old_values is the PRE-IMAGE — the row's previous version by
    (table, pk) id order (one window shuffle), the way a real audit
    trigger records it — not a copy of the post-change row. Without
    it, every synthesized UPDATE has old == new and per-column diff
    logic downstream is only ever exercised with degenerate input. An
    UPDATE/DELETE with no recorded prior version falls back to its own
    values (matching the previous NULL-ness contract: has_old depends
    only on the action)."""
    from pyspark.sql.window import Window

    row_json = F.to_json(F.struct("pk", "user_id", "event_type", "value"))
    prev_json = F.lag(row_json).over(
        Window.partitionBy("table_name", "pk").orderBy("id")
    )
    return cs.select(
        "id",
        "ts",
        "action",
        "schema_name",
        "table_name",
        "relid",
        F.when(F.col("action") != "DELETE", row_json).alias("new_values"),
        F.when(
            F.col("action") != "INSERT", F.coalesce(prev_json, row_json)
        ).alias("old_values"),
    )


AUDIT_LOG_DDL = (
    "id LONG, ts TIMESTAMP, action STRING, schema_name STRING, "
    "table_name STRING, relid LONG, new_values STRING, old_values STRING"
)


def read_changeset_log(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Source-format flexibility for the audit-log shape (db/sql.go:
    14-24): the same changeset pipeline ingests parquet (native), ORC,
    CSV (header row, quoted/escaped JSON payload columns — the shape a
    warehouse audit export produces), or JSONL. The schema is ALWAYS
    explicit — no inference job (an extra full scan at 100 TB) and no
    type drift between files; a column-set mismatch fails loudly at
    read, not as silent nulls mid-pipeline."""
    from pyspark.sql import types as T

    schema = T.StructType.fromDDL(AUDIT_LOG_DDL)
    if fmt == "parquet":
        return spark.read.schema(schema).parquet(path)
    if fmt == "orc":
        return spark.read.schema(schema).orc(path)
    if fmt == "csv":
        return (
            spark.read.schema(schema)
            .option("header", "true")
            .option("escape", '"')
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
            .option("mode", "FAILFAST")  # malformed row = loud error,
            # not a silent null-filled changeset mid-pipeline
            .csv(path)
        )
    if fmt in ("json", "jsonl"):
        return (
            spark.read.schema(schema)
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
            .option("mode", "FAILFAST")
            .json(path)
        )
    raise ValueError(f"unsupported changeset log format: {fmt}")
