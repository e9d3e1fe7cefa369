"""Training-shard packaging: curated documents → WebDataset-style tar
shards, the layout multimodal/LLM data loaders stream
(shard-00000.tar containing {key}.txt members, one per document).

Scale shape: shard assignment is a pure hash column, the per-shard tar
bytes are built INSIDE applyInPandas on the executors (one group = one
shard = one tar), and only a manifest row (shard, n_docs, n_bytes,
sha256) returns to the plan — document bytes never pass through the
driver. Shards are byte-DETERMINISTIC: members sorted by doc_id,
zeroed uid/gid/mtime, fixed ustar format — the same corpus always
produces the same sha256 per shard, so a 100 TB re-run is verifiable
shard-by-shard against a previous manifest (the same rerun-equality
contract as the hash-keyed samplers).
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "shard LONG, n_docs LONG, n_bytes LONG, sha256 STRING"


def _shard_tar_bytes(rows: "list[tuple[str, bytes]]") -> bytes:
    """Deterministic tar: ustar, sorted members, zeroed metadata."""
    buf = io.BytesIO()
    with tarfile.open(
        fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
    ) as tar:
        for name, payload in sorted(rows):
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            tar.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def write_webdataset(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    members: "dict[str, str] | None" = None,
) -> DataFrame:
    """Write `docs` as `out_dir/shard-{i:05d}.tar` WebDataset shards
    and RETURN the manifest DataFrame (shard, n_docs, n_bytes,
    sha256). Shard membership = crc-free deterministic hash of the id
    (same md5-derived scheme as the samplers), so membership, member
    order, and therefore shard BYTES are reproducible run over run.

    `members` maps tar-member EXTENSION -> source column for
    multi-member samples — the actual WebDataset convention for
    multimodal data ({key}.png + {key}.txt + {key}.json grouped by
    key). Default: {"txt": text_col}. STRING columns encode UTF-8,
    BINARY columns pass through; a NULL in any member column excludes
    the whole sample (a tar member cannot be NULL; the pack_chunks
    precedent). Members of one key sit adjacently, sorted by
    extension — the grouped layout streaming readers rely on.

    Crash/concurrency safety (ADVICE r12): shards are written into a
    per-writer STAGING subdirectory and the visible shard set is
    swapped only AFTER the whole job succeeds — the pre-r13 version
    deleted every existing shard-*.tar up front, so a failed or
    interrupted write destroyed the previous valid shard set with no
    replacement, and two concurrent writers deleted each other's
    output mid-write. The swap (per-file atomic os.replace from
    staging FIRST, then remove stale tars incl. any orphaned .tmp_*)
    guarantees read_webdataset's glob never sees a half-written tar or
    a stale shard index after the call returns; a crash before the
    swap leaves the old shard set fully intact, and each writer stages
    under a unique token so concurrent writers can no longer destroy
    in-flight work (the last swap wins per file, as with any two
    writers to one directory). The swap itself is N independent
    renames, NOT atomic as a set (ADVICE r13): a crash mid-swap leaves
    a MIXED directory — some shards from the new set, the rest from
    the old, every file individually a valid tar — but never a missing
    shard both sets had, because replacement precedes deletion. Readers
    needing set-level atomicity should publish into a versioned
    subdirectory and flip a manifest pointer; for the training-shard
    use case a mixed-but-valid set after a mid-publish crash (rerun
    the publish to converge) is the deliberate trade. The sink is consequently EAGER — the
    write job runs inside this call and the returned manifest is a
    small local frame (n_shards rows), which is what every caller did
    with it anyway (.collect() immediately: a sink that only half-
    promises to have written on return is not a sink).

    out_dir must be a filesystem every executor can reach — on a real
    cluster that is the shared store, in local mode any directory.
    """
    if members is None:
        members = {"txt": text_col}
    exts = sorted(members)
    # Member names are {doc_id:012d}.{ext} and read_webdataset parses
    # the key back with int(): a string/float id_col would only fail
    # executor-side inside applyInPandas with an opaque ValueError, so
    # reject it here where the message can say what to do.
    id_type = docs.schema[id_col].dataType.typeName()
    if id_type not in ("byte", "short", "integer", "long"):
        raise ValueError(
            f"write_webdataset requires an integral id_col "
            f"({id_col!r} is {id_type}); tar member keys are zero-padded "
            f"integers — cast or renumber ids first"
        )
    import glob as _glob
    import shutil as _shutil
    import uuid as _uuid

    os.makedirs(out_dir, exist_ok=True)
    staging = os.path.join(
        out_dir, f".staging_{os.getpid()}_{_uuid.uuid4().hex[:8]}"
    )
    os.makedirs(staging)
    clean = docs
    for col in members.values():
        clean = clean.filter(F.col(col).isNotNull())
    clean = clean.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(members[e]).alias(f"_m_{e}") for e in exts],
        (
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % n_shards
        ).alias("shard"),
    )

    def _payload(v) -> bytes:
        return v.encode("utf-8") if isinstance(v, str) else bytes(v)

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        # NB: itertuples() renames underscore-prefixed columns to
        # positional fields — index the frame by column instead
        rows = [
            (f"{int(doc_id):012d}.{e}", _payload(v))
            for e in exts
            for doc_id, v in zip(pdf["doc_id"], pdf[f"_m_{e}"])
        ]
        n_keys = len(pdf)
        blob = _shard_tar_bytes(rows)
        # staging is private to this writer, but keep the tmp+fsync+
        # rename discipline anyway: a task retry must not leave a
        # torn file for the SWAP to publish
        path = os.path.join(staging, f"shard-{shard:05d}.tar")
        tmp = path + f".tmp_{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_docs": [n_keys],
                "n_bytes": [len(blob)],
                "sha256": [hashlib.sha256(blob).hexdigest()],
            }
        )

    try:
        manifest_rows = (
            clean.groupBy("shard")
            .applyInPandas(write_shard, schema=MANIFEST_SCHEMA)
            .collect()
        )
        # job succeeded: publish. Staged tars move in FIRST (per-file
        # atomic os.replace over any same-named stale tar), and only
        # then do stale tars from a previous (possibly wider-n_shards)
        # run and orphaned .tmp_* leave — replace-then-delete, not the
        # pre-r14 delete-then-replace, so a crash mid-swap can leave a
        # MIXED set (some new, some old tars) but never a MISSING
        # shard both sets had (ADVICE r13). The end state is identical:
        # read_webdataset's glob tracks the new manifest exactly.
        staged = sorted(_glob.glob(os.path.join(staging, "shard-*.tar")))
        staged_names = {os.path.basename(p) for p in staged}
        for src in staged:
            os.replace(src, os.path.join(out_dir, os.path.basename(src)))
        for stale in _glob.glob(
            os.path.join(out_dir, "shard-*.tar")
        ) + _glob.glob(os.path.join(out_dir, "shard-*.tar.tmp_*")):
            if os.path.basename(stale) not in staged_names:
                os.remove(stale)
        # orphan sweep (ADVICE r13): this process's finally below can't
        # run after SIGKILL/power loss, so .staging_* dirs from writers
        # that died hard would otherwise accumulate forever. A staging
        # dir whose embedded pid is no longer alive has no owner — a
        # RECYCLED pid belonging to some unrelated process reads as
        # alive and the dir is merely kept (safe direction: a live
        # concurrent writer's staging is never swept).
        for orphan in _glob.glob(os.path.join(out_dir, ".staging_*")):
            try:
                pid = int(os.path.basename(orphan).split("_")[1])
                os.kill(pid, 0)
            except (ValueError, IndexError):
                pass  # unrecognized name — not ours to judge
            except ProcessLookupError:
                _shutil.rmtree(orphan, ignore_errors=True)
            except PermissionError:
                pass  # pid alive under another uid
    finally:
        _shutil.rmtree(staging, ignore_errors=True)
    return docs.sparkSession.createDataFrame(
        manifest_rows, MANIFEST_SCHEMA
    )


def read_webdataset(spark, shard_dir: str) -> DataFrame:
    """Read WebDataset tar shards back into the engine: one row per
    (key, ext) member — the write_webdataset inverse, so shard
    integrity is verifiable IN the engine (read back, join against
    the source corpus, assert equality) instead of trusting the
    manifest alone.

    Scale shape: `binaryFile` scans the tar files as whole-file binary
    rows (shards are bounded by construction — n_shards controls file
    size), and an Arrow mapInPandas pass untars each into member rows.
    No driver-side I/O, no Python per-member boundary crossing beyond
    the in-memory tar walk. Output (shard, key, ext, content BINARY);
    pair text members back with `decode(content, 'utf-8')`.
    """
    import re

    files = spark.read.format("binaryFile").load(
        os.path.join(shard_dir, "shard-*.tar")
    ).select("path", "content")

    def untar(batches):
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                m = re.search(r"shard-(\d+)\.tar$", path)
                shard = int(m.group(1)) if m else -1
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                    for member in tar.getmembers():
                        key, _, ext = member.name.rpartition(".")
                        rows.append(
                            (
                                shard,
                                int(key),
                                ext,
                                tar.extractfile(member).read(),
                            )
                        )
            yield pd.DataFrame(
                rows, columns=["shard", "key", "ext", "content"]
            )

    return files.mapInPandas(
        untar, schema="shard LONG, key LONG, ext STRING, content BINARY"
    )
