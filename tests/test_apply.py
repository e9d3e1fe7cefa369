"""Apply/replay semantics — the FIXTURES.md §3 canonical lifecycle
(insert, insert, delete, update → single surviving row) plus the edge
cases FIXTURES.md lists: duplicate ids, update-before-insert upsert."""

import pytest

from warp_pipe_spark.apply import merge_batch, replay

SCHEMA = (
    "id LONG, action STRING, table_name STRING, pk LONG, "
    "first_name STRING, last_name STRING, email STRING"
)

CANONICAL = [
    (1, "INSERT", "users", 1, "Han", "Solo", "han@test.com"),
    (2, "INSERT", "users", 2, "Leia", "Skywalker", "leia@test.com"),
    (3, "DELETE", "users", 1, "Han", "Solo", "han@test.com"),
    (4, "UPDATE", "users", 2, "Leia", "Solo", "leia@test.com"),
]


@pytest.fixture()
def canonical(spark):
    return spark.createDataFrame(CANONICAL, SCHEMA)


def test_canonical_lifecycle_final_state(canonical):
    # FIXTURES.md §3: exactly one row (2, Leia, Solo, leia@test.com)
    out = replay(canonical, ["pk"]).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["pk"], row["first_name"], row["last_name"], row["email"]) == (
        2,
        "Leia",
        "Solo",
        "leia@test.com",
    )


def test_duplicate_ids_applied_once(spark, canonical):
    # at-least-once delivery: duplicated log → same state (O4)
    doubled = canonical.unionByName(canonical)
    a = sorted(map(tuple, replay(canonical, ["pk"]).collect()))
    b = sorted(map(tuple, replay(doubled, ["pk"]).collect()))
    assert a == b


def test_update_before_insert_upserts(spark):
    # axon_sql.go:92-103: UPDATE for an absent PK inserts the row
    cs = spark.createDataFrame(
        [(1, "UPDATE", "users", 9, "Lando", "C", "l@test.com")], SCHEMA
    )
    out = replay(cs, ["pk"]).collect()
    assert len(out) == 1 and out[0]["first_name"] == "Lando"


def test_composite_pk(spark):
    # db/schema.go:226-258: multi-column PKs
    cs = spark.createDataFrame(
        [
            (1, "INSERT", "li", 1, "a", "x", "e"),
            (2, "INSERT", "li", 1, "b", "x", "e"),  # same pk, different first_name=2nd key
            (3, "UPDATE", "li", 1, "a", "y", "e"),
        ],
        SCHEMA,
    )
    out = replay(cs, ["pk", "first_name"]).collect()
    state = {(r["pk"], r["first_name"]): r["last_name"] for r in out}
    assert state == {(1, "a"): "y", (1, "b"): "x"}


def test_incremental_merge_equals_full_replay(spark, canonical):
    # split the log into two micro-batches; merge must converge to the
    # same state as one-shot replay (streaming foreachBatch contract)
    b1 = canonical.filter("id <= 2")
    b2 = canonical.filter("id > 2")
    s1 = merge_batch(None, b1, ["pk"])
    s2 = merge_batch(s1, b2, ["pk"])
    a = sorted(map(tuple, s2.select(*canonical.columns).collect()))
    b = sorted(map(tuple, replay(canonical, ["pk"]).select(*canonical.columns).collect()))
    assert a == b


def test_merge_batch_idempotent(spark, canonical):
    b2 = canonical.filter("id > 2")
    s_full = merge_batch(None, canonical, ["pk"])
    s_again = merge_batch(s_full, b2, ["pk"])  # re-apply the last batch
    a = sorted(map(tuple, s_full.select(*canonical.columns).collect()))
    b = sorted(map(tuple, s_again.select(*canonical.columns).collect()))
    assert a == b


def test_out_of_order_merge_needs_tombstones(spark):
    """A DELETE processed before a late lower-id INSERT must not let the
    insert resurrect the row; tombstone retention converges to one-shot
    replay for any batch split."""
    from pyspark.sql import functions as F

    from warp_pipe_spark.apply import merge_batch, replay

    schema = "id LONG, action STRING, table_name STRING, pk LONG, val STRING"
    rows = [
        (1, "INSERT", "t", 1, "a"),
        (2, "UPDATE", "t", 1, "a2"),
        (3, "DELETE", "t", 1, "a2"),
        (4, "INSERT", "t", 2, "b"),
    ]
    log = spark.createDataFrame(rows, schema)
    want = sorted(map(tuple, replay(log, ["pk"]).collect()))

    # adversarial order: the DELETE (id 3) lands in batch 0, the
    # earlier INSERT/UPDATE in batch 1
    state = None
    for k in range(2):
        batch = log.filter(F.col("id") % 2 == (k + 1) % 2)
        state = merge_batch(state, batch, ["pk"], keep_tombstones=True)
    got = sorted(map(tuple, state.filter(F.col("action") != "DELETE").collect()))
    assert got == want == [(4, "INSERT", "t", 2, "b")]

    # without tombstones the same split resurrects pk=1 (documents why
    # keep_tombstones exists for out-of-order delivery)
    state = None
    for k in range(2):
        batch = log.filter(F.col("id") % 2 == (k + 1) % 2)
        state = merge_batch(state, batch, ["pk"])
    assert sorted(r["pk"] for r in state.collect()) == [1, 2]


def test_snapshot_diff_emits_minimal_change_log(spark):
    """Batch CDC: INSERT for new keys, DELETE for vanished keys, UPDATE
    only when a value actually differs — including NULL→value and
    value→NULL (null-safe compare); identical rows emit nothing."""
    from warp_pipe_spark.apply import snapshot_diff

    schema = "table_name STRING, pk LONG, val STRING"
    old = spark.createDataFrame(
        [
            ("users", 1, "a"),  # unchanged
            ("users", 2, "b"),  # value changes
            ("users", 3, None),  # NULL -> value (must be UPDATE)
            ("users", 4, "d"),  # deleted
            ("pets", 1, "rex"),  # same pk, other table: independent
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            ("users", 1, "a"),
            ("users", 2, "B"),
            ("users", 3, "c"),
            ("users", 5, "e"),  # inserted
            ("pets", 1, None),  # value -> NULL (must be UPDATE)
        ],
        schema,
    )
    got = {
        (r["action"], r["table_name"], r["pk"]): r["val"]
        for r in snapshot_diff(old, new, ["pk"]).collect()
    }
    assert got == {
        ("UPDATE", "users", 2): "B",
        ("UPDATE", "users", 3): "c",
        ("DELETE", "users", 4): "d",  # DELETE carries the old values
        ("INSERT", "users", 5): "e",
        ("UPDATE", "pets", 1): None,
    }


def test_snapshot_diff_then_merge_converges(spark):
    """Applying the emitted diff onto the old snapshot must reproduce
    the new snapshot exactly — diff and apply are inverses."""
    from warp_pipe_spark.apply import merge_batch, snapshot_diff
    from pyspark.sql import functions as F

    schema = "table_name STRING, pk LONG, val STRING"
    old = spark.createDataFrame(
        [("t", 1, "a"), ("t", 2, "b"), ("t", 3, "c")], schema
    )
    new = spark.createDataFrame(
        [("t", 1, "a"), ("t", 2, "B"), ("t", 4, "d")], schema
    )
    diff = snapshot_diff(old, new, ["pk"]).withColumn(
        "id", F.lit(2)
    )  # all diff rows are "later" than the snapshot
    state = old.withColumn("action", F.lit("INSERT")).withColumn("id", F.lit(1))
    merged = merge_batch(state, diff.select(*state.columns), ["pk"])
    got = {(r["pk"], r["val"]) for r in merged.collect()}
    assert got == {(1, "a"), (2, "B"), (4, "d")}


def test_scd2_intervals_hand_computed(spark, sf_dir):
    """pk with INSERT→UPDATE→DELETE: two versions, the update's
    interval closed by the delete's ts, no version row for the
    delete itself, update's is_current False."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    out = entrymod.queries()["cs_scd2_intervals"](spark, sf_dir)
    # derive_changesets: pk % 20 == 0 → INSERT@pk*10, UPDATE@+5, DELETE@+7
    pk = 20
    rows = sorted(
        ((r["id"], r["valid_to_ms"] is None, r["is_current"])
         for r in out.filter(F.col("pk") == pk).collect())
    )
    assert len(rows) == 2  # insert + update; delete emits no version
    (ins_id, ins_open, ins_cur), (upd_id, upd_open, upd_cur) = rows
    assert ins_id == pk * 10 and upd_id == pk * 10 + 5
    assert not ins_open and not ins_cur  # closed by the update
    assert not upd_open and not upd_cur  # closed by the delete
    # a never-updated pk has exactly one open current version
    one = [r for r in out.filter(F.col("pk") == 1).collect()]
    assert len(one) == 1 and one[0]["is_current"]


def test_replay_null_kind_row_is_not_a_delete(spark):
    """~isin evaluates to NULL (not True) for a NULL kind: a winning
    row with NULL action must survive drop_deletes, not vanish from
    final state as if it were a tombstone."""
    from warp_pipe_spark.apply import replay

    df = spark.createDataFrame(
        [(1, None, "t", 1, "a"), (2, "insert", "t", 2, "b")],
        "id LONG, action STRING, table_name STRING, pk LONG, val STRING",
    )
    got = {(r["pk"], r["val"]) for r in replay(df, ["pk"]).collect()}
    assert got == {(1, "a"), (2, "b")}


# -- truncate: table-clear semantics (pgoutput source only; the
# reference's wal2json path never sees truncates — pgoutput.py emits
# one 'truncate' change per table, and it must NEVER fold into final
# state as an upsert-shaped no-op row) -----------------------------------

TRUNC_SCHEMA = "id LONG, action STRING, table_name STRING, pk LONG, val STRING"
TRUNC_LOG = [
    (1, "insert", "users", 1, "a"),
    (2, "insert", "users", 2, "b"),
    (3, "insert", "orders", 9, "x"),
    (4, "truncate", "users", None, None),   # clears users ids <= 4
    (5, "insert", "users", 3, "c"),         # survives: after the truncate
]


def test_replay_truncate_clears_table_up_to_mark(spark):
    from warp_pipe_spark.apply import TRUNCATE_KINDS

    df = spark.createDataFrame(TRUNC_LOG, TRUNC_SCHEMA)
    got = {
        (r["table_name"], r["pk"], r["val"])
        for r in replay(df, ["pk"], truncate_kinds=TRUNCATE_KINDS).collect()
    }
    # users 1/2 truncated away, orders untouched, post-truncate insert kept,
    # and NO truncate row appears in final state
    assert got == {("orders", 9, "x"), ("users", 3, "c")}


def test_replay_without_truncate_optin_keeps_pinned_plan(spark, canonical):
    """The guard is opt-in: default replay still folds the same and the
    flagship single-exchange plan pin (test_plans) is unaffected."""
    out = replay(canonical, ["pk"]).collect()
    assert len(out) == 1


def test_merge_batch_truncate_clears_prior_state(spark):
    """A truncate arriving in a LATER micro-batch clears state merged
    earlier: state rows keep their original ids (< truncate id), so the
    unioned fold sees and clears them."""
    from warp_pipe_spark.apply import TRUNCATE_KINDS

    b1 = spark.createDataFrame(TRUNC_LOG[:3], TRUNC_SCHEMA)
    b2 = spark.createDataFrame(TRUNC_LOG[3:], TRUNC_SCHEMA)
    s1 = merge_batch(None, b1, ["pk"], truncate_kinds=TRUNCATE_KINDS)
    s2 = merge_batch(s1, b2, ["pk"], truncate_kinds=TRUNCATE_KINDS)
    got = {(r["table_name"], r["pk"], r["val"]) for r in s2.collect()}
    assert got == {("orders", 9, "x"), ("users", 3, "c")}


def test_truncate_tombstone_blocks_late_arrivals(spark):
    """keep_tombstones mode: the truncate row is retained as a NULL-pk
    watermark, so a LATE-arriving change with a lower id than the
    truncate is still cleared by the next fold — the exact analogue of
    delete tombstones under out-of-order delivery."""
    from pyspark.sql import functions as F

    from warp_pipe_spark.apply import TRUNCATE_KINDS

    b1 = spark.createDataFrame(
        [(4, "truncate", "users", None, None), (5, "insert", "users", 3, "c")],
        TRUNC_SCHEMA,
    )
    late = spark.createDataFrame(
        [(2, "insert", "users", 2, "b")], TRUNC_SCHEMA  # pre-truncate id
    )
    s1 = merge_batch(None, b1, ["pk"], keep_tombstones=True,
                     truncate_kinds=TRUNCATE_KINDS)
    s2 = merge_batch(s1, late, ["pk"], keep_tombstones=True,
                     truncate_kinds=TRUNCATE_KINDS)
    published = s2.filter(
        F.col("action").isNull() | ~F.lower("action").isin("delete", "truncate")
    )
    got = {(r["pk"], r["val"]) for r in published.collect()}
    assert got == {(3, "c")}  # the late pk=2 row stayed cleared


def test_split_truncates_single_table_log(spark):
    """table_col=None: a 0-or-1-row global mark joined on a constant —
    an empty marks frame must keep every change."""
    from warp_pipe_spark.apply import split_truncates

    schema = "id LONG, action STRING, pk LONG"
    no_trunc = spark.createDataFrame(
        [(1, "insert", 1), (2, "insert", 2)], schema
    )
    eff, _ = split_truncates(no_trunc, table_col=None)
    assert eff.count() == 2
    with_trunc = spark.createDataFrame(
        [(1, "insert", 1), (2, "truncate", None), (3, "insert", 3)], schema
    )
    eff, marks = split_truncates(with_trunc, table_col=None)
    assert [r["pk"] for r in eff.collect()] == [3]
    assert marks.collect()[0]["_wp_trunc_id"] == 2
