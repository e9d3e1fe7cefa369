"""S8 websocket broadcast sink: real RFC 6455 server, real client
sockets, per-changeset JSON frames (demo-service main.go parity)."""

import json

import pytest

from warp_pipe_spark.sinks import (
    WebSocketBroadcastSink,
    read_ws_frames,
    ws_handshake,
    ws_text_frame,
)


def test_frame_encoding_lengths():
    assert ws_text_frame(b"ab")[:2] == b"\x81\x02"
    f = ws_text_frame(b"x" * 300)
    assert f[0] == 0x81 and f[1] == 126 and int.from_bytes(f[2:4], "big") == 300


@pytest.fixture()
def sink():
    s = WebSocketBroadcastSink()
    yield s
    s.close()


def _await_clients(sink, n, tries=100):
    import time

    for _ in range(tries):
        if sink.n_clients() >= n:
            return
        time.sleep(0.05)
    raise TimeoutError(f"never saw {n} clients")


def test_handshake_and_broadcast_to_multiple_clients(sink):
    c1 = ws_handshake(sink.host, sink.port)
    c2 = ws_handshake(sink.host, sink.port)
    _await_clients(sink, 2)

    assert sink.broadcast(b'{"id":1}') == 2
    assert read_ws_frames(c1, 1) == ['{"id":1}']
    assert read_ws_frames(c2, 1) == ['{"id":1}']

    # a dropped client is pruned on the next broadcast, others unaffected
    c2.close()
    sink.broadcast(b'{"id":2}')
    sink.broadcast(b'{"id":3}')
    got = read_ws_frames(c1, 2)
    assert got == ['{"id":2}', '{"id":3}']
    c1.close()


def test_foreachbatch_sends_one_frame_per_changeset(spark, sink):
    client = ws_handshake(sink.host, sink.port)
    _await_clients(sink, 1)
    batch = spark.createDataFrame(
        [(1, "insert", "users"), (2, "update", "pets")],
        "id LONG, kind STRING, table_name STRING",
    )
    sink(batch, batch_id=0)  # foreachBatch signature
    frames = [json.loads(f) for f in read_ws_frames(client, 2)]
    assert frames == [
        {"id": 1, "kind": "insert", "table_name": "users"},
        {"id": 2, "kind": "update", "table_name": "pets"},
    ]
    client.close()
