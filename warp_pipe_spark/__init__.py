"""warp_pipe_spark — a PySpark-native engine with the capabilities of
perangel/warp-pipe (Postgres CDC: changeset capture, transform pipeline,
idempotent apply/merge, integrity verification), extended with the
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis).

Design: everything is declared through the DataFrame/SQL API so Catalyst
owns the physical plan (pushdown, pruning, join strategy, AQE). Python
touches data only through Arrow-batched Pandas UDFs, and only where the
built-in functions genuinely cannot express the semantics.

Reference parity map: see SURVEY.md §2 (operator ids S1..S12, P1..P9,
A1..A8, G1..G4, O1..O4 cited throughout the modules).
"""

from warp_pipe_spark.apply import merge_batch, replay, split_truncates
from warp_pipe_spark.axon import Axon
from warp_pipe_spark.changeset import (
    CHANGESET_SCHEMA,
    KIND_DELETE,
    KIND_INSERT,
    KIND_TRUNCATE,
    KIND_UPDATE,
    normalize_kind,
)
from warp_pipe_spark.decoders import (
    decode_audit_values,
    decode_debezium,
    decode_wal2json,
    decode_wal2json_v2,
)
from warp_pipe_spark.filters import ignore_tables, table_match, whitelist_tables
from warp_pipe_spark.pipeline import Pipeline
from warp_pipe_spark.session import get_spark
from warp_pipe_spark.skew import salted_agg, top_k
from warp_pipe_spark.store import ChangesetStore
from warp_pipe_spark.verify import table_digest, table_digest_scalable, verify_tables
from warp_pipe_spark.warp_pipe import WarpPipe, WarpPipeConfig

__all__ = [
    "CHANGESET_SCHEMA",
    "KIND_INSERT",
    "KIND_UPDATE",
    "KIND_DELETE",
    "KIND_TRUNCATE",
    "normalize_kind",
    "split_truncates",
    "decode_wal2json",
    "decode_wal2json_v2",
    "decode_debezium",
    "decode_audit_values",
    "whitelist_tables",
    "ignore_tables",
    "table_match",
    "Pipeline",
    "ChangesetStore",
    "replay",
    "merge_batch",
    "table_digest",
    "table_digest_scalable",
    "verify_tables",
    "salted_agg",
    "top_k",
    "WarpPipe",
    "WarpPipeConfig",
    "Axon",
    "get_spark",
]
