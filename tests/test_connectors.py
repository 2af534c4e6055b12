"""Connector adapter plumbing, tested offline with injected fake clients.

The fakes implement the same client protocol the adapters drive
(consumer assign/poll, producer produce/flush, DB-API cursor, pymongo
collection), so the Ray-side fan-out — per-partition bounded specs,
offset ordering, batch chunking, keyed messages, append-vs-overwrite —
is exercised for real; only the wire is faked. Results written by fake
writers land in files (workers are separate processes)."""

import json
import os
import sys

import pyarrow as pa
import pytest
import ray.data
from ray import cloudpickle

# the fake classes live in this pytest module, which Ray workers cannot
# import — ship them by value instead of by reference
cloudpickle.register_pickle_by_value(sys.modules[__name__])

from etl_rs_ray.sources.connectors import (
    ConnectorUnavailable,
    read_kafka,
    write_kafka,
    write_mongo,
    write_postgres,
)


# --- fakes (module-level so cloudpickle ships them to workers) ---------------


class FakeMsg:
    def __init__(self, topic, partition, offset):
        self._t, self._p, self._o = topic, partition, offset

    def topic(self):
        return self._t

    def partition(self):
        return self._p

    def offset(self):
        return self._o

    def timestamp(self):
        return (0, 1_000 + self._o)

    def key(self):
        return f"k{self._o}".encode()

    def value(self):
        return json.dumps({"partition": self._p, "offset": self._o}).encode()

    def error(self):
        return None


class FakeConsumer:
    """100 messages per partition, offsets 0..99."""

    def __init__(self, conf):
        self.conf = conf
        self._queue = []

    def assign_bounded(self, topic, partition, offset):
        self._queue = [FakeMsg(topic, partition, o) for o in range(offset, 100)]

    def poll(self, timeout):
        return self._queue.pop(0) if self._queue else None


class FileSink:
    """Writer fakes append one JSON line per bulk call to a shared dir —
    visible across worker processes."""

    def __init__(self, out_dir):
        self.out_dir = out_dir

    def record(self, payload):
        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, f"{os.getpid()}_{os.urandom(4).hex()}.json")
        with open(path, "w") as f:
            json.dump(payload, f)


class FakeProducer(FileSink):
    def __init__(self, conf, out_dir):
        super().__init__(out_dir)
        self.conf = conf
        self.pending = []

    def produce(self, topic, key, value):
        self.pending.append({"topic": topic, "key": key.decode(), "value": value.decode()})

    def flush(self):
        self.record({"messages": self.pending})
        self.pending = []


class FakeCursor(FileSink):
    def executemany(self, sql, rows):
        self.record({"sql": sql, "rows": [list(r) for r in rows]})

    def execute(self, sql):
        self.record({"sql": sql, "rows": []})


class FakePgConn:
    def __init__(self, dsn, out_dir):
        self.out_dir = out_dir

    def cursor(self):
        return FakeCursor(self.out_dir)

    def commit(self):
        pass


class FakeMongoColl(FileSink):
    def insert_many(self, docs):
        self.record({"op": "insert", "docs": docs})

    def drop(self):
        self.record({"op": "drop"})


class FakeMongoClient:
    def __init__(self, uri, out_dir):
        self.out_dir = out_dir

    def __getitem__(self, db):
        return {"c": FakeMongoColl(self.out_dir), "coll": FakeMongoColl(self.out_dir)}


def _read_sink(out_dir):
    out = []
    for f in sorted(os.listdir(out_dir)):
        with open(os.path.join(out_dir, f)) as fh:
            out.append(json.load(fh))
    return out


# --- kafka -------------------------------------------------------------------


def test_read_kafka_bounded_partitions():
    ds = read_kafka(
        "t1",
        brokers="fake:9092",
        group_id="g",
        partition_offsets={0: (10, 20), 1: (0, 5), 2: (95, 100)},
        client_factory=FakeConsumer,
    )
    t = pa.Table.from_pylist(ds.take_all())
    by_part = {}
    for r in t.to_pylist():
        by_part.setdefault(r["partition"], []).append(r["offset"])
    # each partition drained exactly its [start, end) range, in order.
    # A range past the end of the topic now RAISES IncompleteReplayError
    # instead of silently truncating (ADVICE r2) — see
    # test_advice_r2_fixes.test_kafka_bounded_replay_raises_on_stall.
    assert by_part[0] == list(range(10, 20))
    assert by_part[1] == list(range(0, 5))
    assert by_part[2] == list(range(95, 100))
    assert t.schema.field("value").type == pa.binary()


def test_write_kafka_keyed_messages(tmp_path):
    out = str(tmp_path / "sink")
    ds = ray.data.from_items([{"k": f"key{i}", "v": f"val{i}"} for i in range(50)])

    def factory(conf, _out=out):
        return FakeProducer(conf, _out)

    n = write_kafka(ds, "topic-x", "fake:9092", key_col="k", value_col="v", client_factory=factory)
    assert n == 50
    msgs = [m for rec in _read_sink(out) for m in rec["messages"]]
    assert len(msgs) == 50
    assert {m["topic"] for m in msgs} == {"topic-x"}
    assert sorted(m["key"] for m in msgs) == sorted(f"key{i}" for i in range(50))


# --- postgres ----------------------------------------------------------------


def test_write_postgres_append_and_overwrite(tmp_path):
    out = str(tmp_path / "pg")
    ds = ray.data.from_items([{"a": i, "b": f"s{i}"} for i in range(30)])

    def factory(dsn, _out=out):
        return FakePgConn(dsn, _out)

    n = write_postgres(ds, "dsn://x", "tbl", mode="append", client_factory=factory, batch_size=10)
    assert n == 30
    recs = _read_sink(out)
    ins = [r for r in recs if r["sql"].startswith("INSERT")]
    assert sum(len(r["rows"]) for r in ins) == 30
    assert all('INSERT INTO "tbl" ("a", "b")' in r["sql"] for r in ins)

    n2 = write_postgres(ds, "dsn://x", "tbl", mode="overwrite", client_factory=factory)
    assert n2 == 30
    recs = _read_sink(out)
    assert any(r["sql"].startswith('TRUNCATE TABLE "tbl"') for r in recs)


def test_write_postgres_bad_mode():
    ds = ray.data.from_items([{"a": 1}])
    with pytest.raises(ValueError):
        write_postgres(ds, "dsn://x", "t", mode="upsert")


# --- mongo -------------------------------------------------------------------


def test_write_mongo_modes(tmp_path):
    out = str(tmp_path / "mg")
    ds = ray.data.from_items([{"doc": i} for i in range(25)])

    def factory(uri, _out=out):
        return FakeMongoClient(uri, _out)

    n = write_mongo(ds, "mongodb://fake", "db", "coll", mode="append", client_factory=factory)
    assert n == 25
    recs = _read_sink(out)
    assert sum(len(r["docs"]) for r in recs if r["op"] == "insert") == 25
    assert not any(r["op"] == "drop" for r in recs)

    write_mongo(ds, "mongodb://fake", "db", "coll", mode="overwrite", client_factory=factory)
    recs = _read_sink(out)
    assert any(r["op"] == "drop" for r in recs)


# --- missing client library --------------------------------------------------


def test_missing_client_raises_with_analogue_pointer():
    from etl_rs_ray.sources.connectors import (
        _default_kafka_consumer,
        _default_mongo_client,
        _default_pg_connect,
    )

    for fn, arg in [
        (_default_kafka_consumer, {}),
        (_default_pg_connect, "dsn"),
        (_default_mongo_client, "uri"),
    ]:
        with pytest.raises(ConnectorUnavailable) as ei:
            fn(arg)
        assert "analogue" in str(ei.value)


class FakePgCursorRead:
    """DB-API cursor over a fixed table, honoring the range WHERE clause."""

    ROWS = [(i, f"name{i}") for i in range(100)]

    def execute(self, sql):
        import re

        lo, hi = 0, 10**9
        m = re.search(r">= (\d+) AND \"?id\"? < (\d+)", sql)
        if m:
            lo, hi = int(m.group(1)), int(m.group(2))
        self._out = [r for r in self.ROWS if lo <= r[0] < hi]
        self.description = [("id",), ("name",)]

    def fetchall(self):
        return self._out


class FakePgConnRead:
    def __init__(self, dsn):
        self.dsn = dsn

    def cursor(self):
        return FakePgCursorRead()


def test_read_postgres_range_partitioned():
    from etl_rs_ray.sources.connectors import read_postgres

    ds = read_postgres(
        "dsn://x", "tbl", partition_col="id", bounds=(0, 99), num_partitions=4,
        client_factory=FakePgConnRead,
    )
    rows = sorted(r["id"] for r in ds.take_all())
    assert rows == list(range(100))  # every range slice covered exactly once


def test_read_postgres_full_scan_without_partition_col():
    from etl_rs_ray.sources.connectors import read_postgres

    ds = read_postgres("dsn://x", "tbl", client_factory=FakePgConnRead)
    assert len(ds.take_all()) == 100


class FakeMongoCollRead:
    DOCS = [{"_id": i, "x": i * 2} for i in range(60)]

    def find(self, q):
        # honor the $mod slice on the hashed _id the reader sends
        expr = q.get("$expr", {})
        mod = expr.get("$eq", [{}, 0])
        n = mod[0].get("$mod", [None, 1])[1] if isinstance(mod[0], dict) else 1
        i = mod[1]
        # fake "hashed index key" = the _id itself
        return [dict(d) for d in self.DOCS if d["_id"] % n == i]


class FakeMongoClientRead:
    def __init__(self, uri):
        pass

    def __getitem__(self, name):
        return {"coll": FakeMongoCollRead(), "c": FakeMongoCollRead()}


def test_read_mongo_partitioned():
    from etl_rs_ray.sources.connectors import read_mongo

    ds = read_mongo("mongodb://fake", "db", "coll", num_partitions=4,
                    client_factory=FakeMongoClientRead)
    rows = sorted(r["x"] for r in ds.take_all())
    assert rows == [i * 2 for i in range(60)]  # slices disjoint + complete
