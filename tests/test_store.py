"""ChangesetStore queries (S3-S6, G1, G2, A8) over the derived log."""

import pytest

from warp_pipe_spark.io import derive_changesets
from warp_pipe_spark.store import ChangesetStore


@pytest.fixture(scope="module")
def store(spark, sf_dir):
    return ChangesetStore(derive_changesets(spark, sf_dir))


def test_since_id_ordered(store):
    rows = store.since_id(9000).limit(5).collect()
    assert all(r["id"] >= 9000 for r in rows)
    ids = [r["id"] for r in rows]
    assert ids == sorted(ids)


def test_since_timestamp(store):
    rows = store.since_timestamp("2024-01-02 00:00:00").limit(5).collect()
    assert rows and all(str(r["ts"]) >= "2024-01-02" for r in rows)


def test_point_lookup(store):
    rows = store.by_id(4200).collect()
    assert len(rows) == 1 and rows[0]["pk"] == 420


def test_retention(store):
    kept = ChangesetStore(store.delete_before_id(5000))
    assert kept.df.filter("id < 5000").count() == 0


def test_stats_and_convergence(store):
    stats = store.stats().collect()[0]
    assert stats["changeset_count"] > 0
    assert store.is_latest_changeset(stats["max_id"])  # A8
    assert not store.is_latest_changeset(stats["max_id"] - 1)
