"""Live S1 demo: logical-replication socket → Structured Streaming.

    python examples/lr_live_tail_demo.py [sf_dir]

Chain under demonstration (the reference's LR mode, lr_listener.go):

    walsender socket ──LRClient──▶ JSONL drop dir ──wal2json_stream──▶
    Catalyst decode ──foreachBatch──▶ ParquetStateSink (LWW replay)

The walsender here is the wire-level fake from tests/test_lr_client.py
serving REAL wal2json documents derived from the testdata changeset
log — against a live Postgres, only the host/port/slot change; every
byte after the socket is the production path.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from pyspark.sql import functions as F

from test_lr_client import FakeWalsender  # wire-level fake walsender
from warp_pipe_spark import get_spark
from warp_pipe_spark.io import derive_changesets
from warp_pipe_spark.lr_client import LRClient, tail_to_drop_dir
from warp_pipe_spark.streaming import ParquetStateSink, wal2json_stream


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lr_demo", cpus=8, shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="wp_lr_demo_")

    # wal2json documents (one per changeset) from the real derived log
    cs = derive_changesets(spark, sf_dir).orderBy("id").limit(500)
    docs = [
        json.dumps(
            {
                "change": [
                    {
                        "id": r["id"],
                        "kind": r["action"].lower(),
                        "schema": r["schema_name"],
                        "table": r["table_name"],
                        "columnnames": ["pk", "value"],
                        "columntypes": ["bigint", "double precision"],
                        "columnvalues": [str(r["pk"]), str(r["value"])],
                        "oldkeys": None,
                    }
                ],
                "nextlsn": f"0/{r['id']:X}",
            }
        ).encode()
        for r in cs.collect()
    ]
    srv = FakeWalsender(docs, keepalive_every=50)
    print(f"fake walsender on 127.0.0.1:{srv.port} with {len(docs)} messages")

    client = LRClient("127.0.0.1", srv.port, "testdb", "demo", "wp_demo_slot")
    client.connect()
    print("identify_system:", client.identify_system())
    print("slot consistent point:", client.create_slot())
    drop = os.path.join(work, "drop")
    n = tail_to_drop_dir(client, drop, batch_rows=100)
    client.close()
    print(f"tailed {n} messages into {len(os.listdir(drop))} drop files; "
          f"confirmed LSNs: {srv.standby_lsns[:3]}…{srv.standby_lsns[-1:]}")

    sink = ParquetStateSink(
        spark, os.path.join(work, "state"), pk_cols=["pk"], n_buckets=8
    )
    decoded = wal2json_stream(spark, drop).select(
        F.col("id"),
        F.col("kind").alias("action"),
        F.col("table").alias("table_name"),
        F.get("new_values", 0)["value"].cast("long").alias("pk"),
        F.get("new_values", 1)["value"].cast("double").alias("value"),
    )
    q = (
        decoded.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    state = sink.read_state()
    print("replayed state rows:", state.count())
    state.orderBy("pk").limit(5).show()


if __name__ == "__main__":
    main()
