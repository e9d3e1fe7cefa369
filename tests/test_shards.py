"""WebDataset tar-shard writer: byte-deterministic shards, readable by
the stdlib tarfile reader, manifest equals the files on disk."""

import hashlib
import os
import tarfile


def test_write_webdataset_round_trips_and_is_deterministic(spark, tmp_path):
    from warp_pipe_spark.datapipe.shards import write_webdataset

    docs = spark.createDataFrame(
        [(i, f"document number {i} body") for i in range(50)]
        + [(99, None)],  # NULL text -> excluded
        "doc_id LONG, text STRING",
    )
    out1 = str(tmp_path / "run1")
    m1 = {
        r["shard"]: (r["n_docs"], r["n_bytes"], r["sha256"])
        for r in write_webdataset(docs, out1, n_shards=4).collect()
    }
    assert sum(n for n, _, _ in m1.values()) == 50  # NULL excluded
    # manifest matches the bytes on disk; members read back in order
    seen_ids = set()
    for shard, (n_docs, n_bytes, sha) in m1.items():
        path = os.path.join(out1, f"shard-{shard:05d}.tar")
        blob = open(path, "rb").read()
        assert len(blob) == n_bytes
        assert hashlib.sha256(blob).hexdigest() == sha
        with tarfile.open(path) as tar:
            members = tar.getmembers()
            assert len(members) == n_docs
            names = [m.name for m in members]
            assert names == sorted(names)
            for m in members:
                did = int(m.name.split(".")[0])
                seen_ids.add(did)
                body = tar.extractfile(m).read().decode()
                assert body == f"document number {did} body"
                assert m.mtime == 0 and m.uid == 0
    assert seen_ids == set(range(50))

    # a second run produces byte-identical shards (rerun verifiability)
    out2 = str(tmp_path / "run2")
    m2 = {
        r["shard"]: (r["n_docs"], r["n_bytes"], r["sha256"])
        for r in write_webdataset(docs, out2, n_shards=4).collect()
    }
    assert m1 == m2
    for shard in m1:
        b1 = open(os.path.join(out1, f"shard-{shard:05d}.tar"), "rb").read()
        b2 = open(os.path.join(out2, f"shard-{shard:05d}.tar"), "rb").read()
        assert b1 == b2


def test_cli_corpus_shard(spark, tmp_path, capsys):
    """corpus-shard: shards + one manifest JSON line per shard on
    stdout, deterministic across invocations."""
    import json

    from warp_pipe_spark.__main__ import main

    docs_dir = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"body {i}") for i in range(20)], "doc_id LONG, text STRING"
    ).write.parquet(docs_dir)
    out = str(tmp_path / "shards")
    rc = main(
        ["corpus-shard", "--docs", docs_dir, "--out", out,
         "--n-shards", "3"]
    )
    assert rc == 0
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
    ]
    assert sum(d["n_docs"] for d in lines) == 20
    assert [d["shard"] for d in lines] == sorted(d["shard"] for d in lines)
    for d in lines:
        assert os.path.exists(
            os.path.join(out, f"shard-{d['shard']:05d}.tar")
        )


def test_write_webdataset_multimodal_members(spark, tmp_path):
    """members={'txt': ..., 'bin': ...}: each key contributes adjacent
    {key}.bin/{key}.txt members (sorted extensions), binary columns
    pass through byte-exact, a NULL in ANY member column excludes the
    whole sample."""
    from warp_pipe_spark.datapipe.shards import write_webdataset

    rows = [
        (1, "caption one", bytearray(b"\x00\x01\xff")),
        (2, "caption two", bytearray(b"PNGish")),
        (3, None, bytearray(b"orphan binary")),  # NULL txt -> excluded
        (4, "no binary", None),                  # NULL bin -> excluded
    ]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, caption STRING, content BINARY"
    )
    out = str(tmp_path / "mm")
    m = write_webdataset(
        docs, out, n_shards=1,
        members={"txt": "caption", "bin": "content"},
    ).collect()
    assert len(m) == 1 and m[0]["n_docs"] == 2
    with tarfile.open(os.path.join(out, "shard-00000.tar")) as tar:
        names = [t.name for t in tar.getmembers()]
        assert names == [
            "000000000001.bin", "000000000001.txt",
            "000000000002.bin", "000000000002.txt",
        ]
        assert tar.extractfile("000000000001.bin").read() == b"\x00\x01\xff"
        assert tar.extractfile("000000000002.txt").read() == b"caption two"


def test_read_webdataset_round_trips_the_corpus(spark, tmp_path):
    """write -> read -> the member contents equal the source corpus,
    verified IN the engine (anti-join empty both ways)."""
    from pyspark.sql import functions as F

    from warp_pipe_spark.datapipe.shards import (
        read_webdataset,
        write_webdataset,
    )

    docs = spark.createDataFrame(
        [(i, f"text body {i}") for i in range(30)],
        "doc_id LONG, text STRING",
    )
    out = str(tmp_path / "rt")
    write_webdataset(docs, out, n_shards=3).collect()
    back = read_webdataset(spark, out).select(
        F.col("key").alias("doc_id"),
        F.decode("content", "utf-8").alias("text"),
    )
    assert back.count() == 30
    assert docs.exceptAll(back).count() == 0
    assert back.exceptAll(docs).count() == 0


def test_write_webdataset_clears_stale_shards(spark, tmp_path):
    """A re-run with fewer shards must not leave the previous run's
    tars behind: read_webdataset globs shard-*.tar, so stale files
    would resurface documents absent from the returned manifest."""
    from warp_pipe_spark.datapipe.shards import (
        read_webdataset,
        write_webdataset,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id LONG, text STRING"
    )
    out = str(tmp_path / "re")
    m0 = write_webdataset(docs, out, n_shards=8).collect()
    assert len(os.listdir(out)) == len(m0) >= 3
    # crashed-run leftover must go too
    open(os.path.join(out, "shard-00003.tar.tmp_999"), "wb").close()
    m = write_webdataset(docs, out, n_shards=2).collect()
    assert sorted(os.listdir(out)) == ["shard-00000.tar", "shard-00001.tar"]
    assert sum(r["n_docs"] for r in m) == 20
    assert read_webdataset(spark, out).count() == 20


def test_write_webdataset_rejects_non_integral_ids(spark, tmp_path):
    """Member keys are zero-padded integers (and read_webdataset
    int()s them back) — a string id must fail fast at the API with a
    message, not executor-side inside applyInPandas."""
    import pytest

    from warp_pipe_spark.datapipe.shards import write_webdataset

    docs = spark.createDataFrame(
        [("a1", "text one")], "doc_id STRING, text STRING"
    )
    with pytest.raises(ValueError, match="integral id_col"):
        write_webdataset(docs, str(tmp_path / "bad"))


def test_write_webdataset_failed_run_preserves_previous_shards(spark, tmp_path):
    """The staging-swap contract (ADVICE r12): the pre-r13 writer
    deleted every existing shard up front, so a failed job destroyed
    the previous valid shard set. Now a failing write must leave the
    old tars byte-identical on disk and clean up its staging dir."""
    import glob

    import pytest
    from pyspark.sql import functions as F

    from warp_pipe_spark.datapipe.shards import write_webdataset

    out = str(tmp_path / "wd")
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], "doc_id LONG, text STRING"
    )
    write_webdataset(docs, out, n_shards=2).collect()
    tars = sorted(glob.glob(os.path.join(out, "shard-*.tar")))
    assert len(tars) == 2
    before = {p: open(p, "rb").read() for p in tars}

    bad = docs.withColumn(
        "text",
        F.when(F.length("text") < 0, F.lit("x")).otherwise(
            F.raise_error(F.lit("boom"))
        ),
    )
    with pytest.raises(Exception, match="boom"):
        write_webdataset(bad, out, n_shards=2)

    after = {
        p: open(p, "rb").read()
        for p in sorted(glob.glob(os.path.join(out, "shard-*.tar")))
    }
    assert after == before
    assert not glob.glob(os.path.join(out, ".staging_*"))


def test_write_webdataset_sweeps_dead_writers_staging(spark, tmp_path):
    """Orphan sweep (ADVICE r13): a writer killed with SIGKILL can't
    run its finally-cleanup, so its .staging_<pid>_<uuid> dir would
    accumulate in out_dir forever. A successful publish sweeps staging
    dirs whose embedded pid is dead — and must KEEP a live writer's
    (pid-recycling errs toward keeping) and anything it can't parse."""
    import glob
    import subprocess

    from warp_pipe_spark.datapipe.shards import write_webdataset

    out = tmp_path / "wd"
    out.mkdir()
    # a genuinely dead pid: a real child that has already exited
    child = subprocess.Popen(["true"])
    child.wait()
    dead = out / f".staging_{child.pid}_deadbeef"
    dead.mkdir()
    (dead / "shard-00000.tar").write_bytes(b"torn")
    alive = out / f".staging_{os.getpid()}_cafe0001"
    alive.mkdir()
    weird = out / ".staging_notapid_x"
    weird.mkdir()

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id LONG, text STRING"
    )
    write_webdataset(docs, str(out), n_shards=2).collect()

    left = {os.path.basename(p) for p in glob.glob(str(out / ".staging_*"))}
    assert dead.name not in left
    assert alive.name in left
    assert weird.name in left


def test_parse_spark_bytes_full_grammar():
    """ADVICE r13: fan_out's threshold read only parsed '<n>[b]' and
    raised on the human forms Spark itself documents ('128m', '1g'),
    silently falling back to 128MB. The parser covers the JavaUtils
    byteStringAs grammar; garbage raises ValueError for the caller's
    explicit fallback, never a silent wrong size."""
    import pytest

    from warp_pipe_spark.io import parse_spark_bytes

    assert parse_spark_bytes("134217728") == 128 * 1024 * 1024
    assert parse_spark_bytes("134217728b") == 128 * 1024 * 1024
    assert parse_spark_bytes("128m") == 128 * 1024 * 1024
    assert parse_spark_bytes("128MB") == 128 * 1024 * 1024
    assert parse_spark_bytes("64mb") == 64 * 1024 * 1024
    assert parse_spark_bytes("1g") == 1024 ** 3
    assert parse_spark_bytes("2t") == 2 * 1024 ** 4
    assert parse_spark_bytes("1p") == 1024 ** 5
    assert parse_spark_bytes(" 512k ") == 512 * 1024
    for bad in ("", "mb", "12x", "1.5g", "128kk", "k128"):
        with pytest.raises(ValueError):
            parse_spark_bytes(bad)
