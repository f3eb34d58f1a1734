"""ES bulk sink: payload shape, per-partition batching, doc ids."""

from __future__ import annotations

import json
import os
import tempfile

from flink_ecommerce_spark.sources import generator
from flink_ecommerce_spark.streaming.es_sink import EsBulkSink, bulk_payload


def test_bulk_payload_shape():
    body = bulk_payload([("id1", '{"a": 1}'), ("id2", '{"a": 2}')], index="tx")
    lines = body.strip().split("\n")
    assert len(lines) == 4
    action = json.loads(lines[0])
    assert action == {"index": {"_index": "tx", "_id": "id1"}}
    assert json.loads(lines[1]) == {"a": 1}
    assert body.endswith("\n")
    assert bulk_payload([]) == ""


def _file_transport(path):
    def post(body: str) -> None:
        with open(path, "a") as f:
            f.write(body)

    return post


def test_es_sink_indexes_every_row(spark):
    fd, path = tempfile.mkstemp()
    os.close(fd)
    os.unlink(path)
    df = generator.transactions(spark, n_rows=250, seed=31).coalesce(2)
    sink = EsBulkSink(_file_transport(path), id_col="transactionId", batch_docs=100)
    sink.write_batch(df)
    with open(path) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    actions = [l for l in lines if "index" in l and set(l) == {"index"}]
    sources = [l for l in lines if "transactionId" in l]
    assert len(actions) == 250 and len(sources) == 250
    ids = {a["index"]["_id"] for a in actions}
    src_ids = {s["transactionId"] for s in sources}
    assert ids == src_ids and len(ids) == 250
    assert all(a["index"]["_index"] == "transactions" for a in actions)
