"""Thin live-connector adapters: Kafka / Postgres / Mongo ⇄ Ray Dataset.

The engine's canonical storage is the Parquet event log + lake
(sources/event_log.py, sources/lake.py) — the sandbox has no brokers or
databases, so these adapters exist for users pointing at REAL services,
mapping them onto the same shapes the reference speaks:

- Kafka consumer/producer (lib-etl/src/kafka.rs:93-141, bounded
  partition+offset replay as in examples/kafka_jdd_to_mongo.rs:20-53)
- Postgres sink (examples/csv_jdd_to_postgres.rs:38-122: create table +
  row inserts)
- Mongo sink Overwrite/Append (examples/kafka_jdd_to_mongo.rs:68-95)

Ray-side design, independent of the client library:
- Reads fan out one task per partition/range spec
  (``ray.data.from_items(specs)`` → ``map_batches`` over specs); the
  client is opened ONCE per actor in ``__init__`` (actor pool), each task
  drains only its bounded range, batches are Arrow.
- Writes are actor-pool ``map_batches`` stages: client per actor, one
  bulk call per batch, a tiny count table out.

Client libraries resolve lazily; a missing package raises
``ConnectorUnavailable`` naming the pip package and the Parquet
analogue. Tests inject fake factories through the ``client_factory``
parameter, so the Ray plumbing (spec fan-out, ordering, batching,
key layout, overwrite-vs-append) is real and tested offline.
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa

KAFKA_SCHEMA = pa.schema(
    [
        ("topic", pa.string()),
        ("partition", pa.int32()),
        ("offset", pa.int64()),
        ("timestamp", pa.int64()),
        ("key", pa.binary()),
        ("value", pa.binary()),
    ]
)


class ConnectorUnavailable(Exception):
    def __init__(self, package: str, analogue: str):
        super().__init__(
            f"client library '{package}' is not installed (pip install {package}); "
            f"offline analogue: {analogue}"
        )


class IncompleteReplayError(Exception):
    """A bounded replay could not reach its end offset — the caller must
    retry or fail, never treat the partial result as the full range."""


def _qi(name: str) -> str:
    """Quote a SQL identifier (table/column name). Values stay %s-parameterized;
    identifiers can't be parameterized, so double-quote and escape embedded
    quotes — works for Postgres and ANSI SQL."""
    if "\x00" in name:
        raise ValueError(f"invalid identifier: {name!r}")
    return '"' + name.replace('"', '""') + '"'


class _ConfluentConsumerAdapter:
    """Consumer protocol used by the reader: ``assign_bounded(topic,
    partition, offset)`` + ``poll(timeout) -> msg | None``. This adapter
    maps it onto confluent-kafka; test fakes implement it directly."""

    def __init__(self, consumer, topic_partition_cls):
        self._c = consumer
        self._tp = topic_partition_cls

    def assign_bounded(self, topic: str, partition: int, offset: int) -> None:
        self._c.assign([self._tp(topic, partition, offset)])

    def poll(self, timeout: float):
        return self._c.poll(timeout)


def _default_kafka_consumer(conf: dict):
    try:
        from confluent_kafka import Consumer, TopicPartition  # type: ignore
    except ImportError as e:
        raise ConnectorUnavailable(
            "confluent-kafka", "sources/event_log.py read_event_log (offset-range replay)"
        ) from e
    return _ConfluentConsumerAdapter(Consumer(conf), TopicPartition)


def _default_kafka_producer(conf: dict):
    try:
        from confluent_kafka import Producer  # type: ignore
    except ImportError as e:
        raise ConnectorUnavailable(
            "confluent-kafka", "sources/event_log.py EventLogWriter (row index = offset)"
        ) from e
    return Producer(conf)


def _default_pg_connect(dsn: str):
    try:
        import psycopg2  # type: ignore
    except ImportError as e:
        raise ConnectorUnavailable("psycopg2-binary", "sources/lake.py LakeTable upsert") from e
    return psycopg2.connect(dsn)


def _default_mongo_client(uri: str):
    try:
        import pymongo  # type: ignore
    except ImportError as e:
        raise ConnectorUnavailable(
            "pymongo", "pipelines/cdc.py replay(mode='overwrite'/'delta') on the lake"
        ) from e
    return pymongo.MongoClient(uri)


# --- Kafka -------------------------------------------------------------------


class _KafkaPartitionReader:
    """Actor: one consumer per worker; each call drains ONE bounded
    (topic, partition, [start, end)) spec into Arrow rows in offset order
    — the reference's assigned-partition bounded replay
    (kafka_jdd_to_mongo.rs:26-31 TopicPartitionList + Offset::Offset)."""

    def __init__(
        self,
        brokers: str,
        group_id: str,
        client_factory=None,
        poll_timeout: float = 1.0,
        max_empty_polls: int = 10,
    ):
        factory = client_factory or _default_kafka_consumer
        self.consumer = factory(
            {
                "bootstrap.servers": brokers,
                "group.id": group_id,
                "enable.partition.eof": False,
                "enable.auto.commit": False,
            }
        )
        self.poll_timeout = poll_timeout
        self.max_empty_polls = max_empty_polls

    def __call__(self, specs: pa.Table) -> pa.Table:
        rows: dict[str, list] = {f.name: [] for f in KAFKA_SCHEMA}
        for spec in specs.to_pylist():
            topic, part = spec["topic"], spec["partition"]
            start, end = spec["start_offset"], spec["end_offset"]
            self.consumer.assign_bounded(topic, part, start)
            offset = start
            empty_polls = 0
            while offset < end:
                msg = self.consumer.poll(self.poll_timeout)
                if msg is None:
                    # a transient broker stall must not silently truncate a
                    # BOUNDED replay — retry up to a deadline, then fail loud
                    # (ADVICE r2: partial replay was invisible to the caller)
                    empty_polls += 1
                    if empty_polls >= self.max_empty_polls:
                        raise IncompleteReplayError(
                            f"{topic}[{part}]: replay stalled at offset {offset} "
                            f"of [{start}, {end}) after {empty_polls} empty polls "
                            f"({empty_polls * self.poll_timeout:.0f}s)"
                        )
                    continue
                empty_polls = 0
                if callable(getattr(msg, "error", None)) and msg.error():
                    continue
                if msg.offset() >= end:
                    break
                rows["topic"].append(msg.topic())
                rows["partition"].append(msg.partition())
                rows["offset"].append(msg.offset())
                rows["timestamp"].append(msg.timestamp()[1])
                rows["key"].append(msg.key())
                rows["value"].append(msg.value())
                offset = msg.offset() + 1
        return pa.table(rows, schema=KAFKA_SCHEMA)


def read_kafka(
    topic: str,
    brokers: str,
    group_id: str,
    partition_offsets: dict[int, tuple[int, int]],
    client_factory: Callable | None = None,
    concurrency: int = 4,
):
    """Bounded Kafka replay -> Dataset. ``partition_offsets`` maps
    partition -> (start, end) exactly like the event log's offset-range
    bounded replay (S5); one read task per partition, consumer opened
    once per actor."""
    import ray.data

    specs = [
        {"topic": topic, "partition": p, "start_offset": int(s), "end_offset": int(e)}
        for p, (s, e) in sorted(partition_offsets.items())
    ]
    ds = ray.data.from_items(specs).repartition(max(1, len(specs)))
    return ds.map_batches(
        _KafkaPartitionReader,
        fn_constructor_kwargs={
            "brokers": brokers,
            "group_id": group_id,
            "client_factory": client_factory,
        },
        batch_format="pyarrow",
        concurrency=min(concurrency, max(1, len(specs))),
        batch_size=1,
        num_cpus=0.5,  # IO-bound; a pool that exactly consumes the CPU
        # budget deadlocks the stream on small clusters
    )


class _KafkaBatchProducer:
    """Actor: one producer per worker; a batch becomes keyed messages
    (kafka.rs producer with key per record), flushed per batch so a
    retried task re-sends its whole batch (at-least-once)."""

    def __init__(self, brokers: str, topic: str, key_col: str, value_col: str, client_factory=None):
        factory = client_factory or _default_kafka_producer
        self.producer = factory({"bootstrap.servers": brokers})
        self.topic, self.key_col, self.value_col = topic, key_col, value_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_pylist()
        vals = batch.column(self.value_col).to_pylist()
        for k, v in zip(keys, vals):
            self.producer.produce(
                self.topic,
                key=k if isinstance(k, (bytes, type(None))) else str(k).encode(),
                value=v if isinstance(v, (bytes, type(None))) else str(v).encode(),
            )
        self.producer.flush()
        return pa.table({"produced": pa.array([batch.num_rows], pa.int64())})


def write_kafka(
    ds,
    topic: str,
    brokers: str,
    key_col: str,
    value_col: str,
    client_factory: Callable | None = None,
    concurrency: int = 4,
    batch_size: int = 10_000,
) -> int:
    """Produce every row as a keyed message; returns messages sent."""
    counts = ds.map_batches(
        _KafkaBatchProducer,
        fn_constructor_kwargs={
            "brokers": brokers,
            "topic": topic,
            "key_col": key_col,
            "value_col": value_col,
            "client_factory": client_factory,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    ).take_all()
    return sum(r["produced"] for r in counts)


# --- Postgres ----------------------------------------------------------------


class _PgRangeReader:
    def __init__(self, dsn: str, client_factory=None):
        self.conn = (client_factory or _default_pg_connect)(dsn)

    def __call__(self, specs: pa.Table) -> pa.Table:
        out = []
        cur = self.conn.cursor()
        for spec in specs.to_pylist():
            cur.execute(spec["sql"])
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
            out.append(pa.Table.from_pylist([dict(zip(cols, r)) for r in rows]))
        return pa.concat_tables(out, promote_options="permissive")


def read_postgres(
    dsn: str,
    table: str,
    partition_col: str | None = None,
    bounds: tuple[int, int] | None = None,
    num_partitions: int = 8,
    columns: list[str] | None = None,
    client_factory: Callable | None = None,
):
    """SELECT * partitioned into range slices on ``partition_col`` (the
    classic parallel-JDBC pattern) — one task per slice, connection per
    actor. Without a partition column it degrades to one full-scan task
    (the reference's SELECT * source is single-stream too)."""
    import ray.data

    proj = ", ".join(_qi(c) for c in columns) if columns else "*"
    if partition_col is None or bounds is None:
        specs = [{"sql": f"SELECT {proj} FROM {_qi(table)}"}]
    else:
        lo, hi = bounds
        step = max(1, (hi - lo + num_partitions) // num_partitions)
        pcol = _qi(partition_col)
        specs = [
            {
                "sql": f"SELECT {proj} FROM {_qi(table)} "
                f"WHERE {pcol} >= {int(lo + i * step)} AND {pcol} < {int(min(lo + (i + 1) * step, hi + 1))}"
            }
            for i in range(num_partitions)
            if lo + i * step <= hi
        ]
    ds = ray.data.from_items(specs).repartition(max(1, len(specs)))
    return ds.map_batches(
        _PgRangeReader,
        fn_constructor_kwargs={"dsn": dsn, "client_factory": client_factory},
        batch_format="pyarrow",
        concurrency=min(8, max(1, len(specs))),
        batch_size=1,
        num_cpus=0.5,
    )


class _PgBatchWriter:
    def __init__(self, dsn: str, table: str, client_factory=None):
        self.conn = (client_factory or _default_pg_connect)(dsn)
        self.table = table

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = batch.column_names
        placeholders = ", ".join(["%s"] * len(cols))
        sql = (
            f"INSERT INTO {_qi(self.table)} "
            f"({', '.join(_qi(c) for c in cols)}) VALUES ({placeholders})"
        )
        cur = self.conn.cursor()
        cur.executemany(sql, [tuple(r[c] for c in cols) for r in batch.to_pylist()])
        self.conn.commit()
        return pa.table({"written": pa.array([batch.num_rows], pa.int64())})


def write_postgres(
    ds,
    dsn: str,
    table: str,
    mode: str = "append",
    client_factory: Callable | None = None,
    concurrency: int = 4,
    batch_size: int = 5_000,
) -> int:
    """Append (or truncate-then-append for overwrite) batches into a
    table — examples/csv_jdd_to_postgres.rs:38-122's insert loop, one
    bulk executemany per Arrow batch."""
    if mode not in ("append", "overwrite"):
        raise ValueError(mode)
    if mode == "overwrite":
        conn = (client_factory or _default_pg_connect)(dsn)
        cur = conn.cursor()
        cur.execute(f"TRUNCATE TABLE {_qi(table)}")
        conn.commit()
    counts = ds.map_batches(
        _PgBatchWriter,
        fn_constructor_kwargs={"dsn": dsn, "table": table, "client_factory": client_factory},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    ).take_all()
    return sum(r["written"] for r in counts)


# --- Mongo -------------------------------------------------------------------


class _MongoBatchWriter:
    def __init__(self, uri: str, database: str, collection: str, client_factory=None):
        client = (client_factory or _default_mongo_client)(uri)
        self.coll = client[database][collection]

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.coll.insert_many(batch.to_pylist())
        return pa.table({"written": pa.array([batch.num_rows], pa.int64())})


def write_mongo(
    ds,
    uri: str,
    database: str,
    collection: str,
    mode: str = "append",
    client_factory: Callable | None = None,
    concurrency: int = 4,
    batch_size: int = 5_000,
) -> int:
    """Mongo sink with the reference's Overwrite/Append modes
    (kafka_jdd_to_mongo.rs:68-95: Overwrite drops the collection first,
    then both modes bulk insert_many per batch)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(mode)
    if mode == "overwrite":
        client = (client_factory or _default_mongo_client)(uri)
        client[database][collection].drop()
    counts = ds.map_batches(
        _MongoBatchWriter,
        fn_constructor_kwargs={
            "uri": uri,
            "database": database,
            "collection": collection,
            "client_factory": client_factory,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    ).take_all()
    return sum(r["written"] for r in counts)


def read_mongo(
    uri: str,
    database: str,
    collection: str,
    filter: dict | None = None,
    client_factory: Callable | None = None,
    num_partitions: int = 8,
):
    """Partitioned Mongo read: rows are sliced by a modulo on the hash of
    _id server-side ($mod on a hashed shard-key style bucket), one task
    per slice."""
    import ray.data

    specs = [{"i": i, "n": num_partitions} for i in range(num_partitions)]

    class _Reader:
        def __init__(self):
            client = (client_factory or _default_mongo_client)(uri)
            self.coll = client[database][collection]

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = []
            for spec in batch.to_pylist():
                q = dict(filter or {})
                q["$expr"] = {"$eq": [{"$mod": [{"$toHashedIndexKey": "$_id"}, spec["n"]]}, spec["i"]]}
                out.extend(self.coll.find(q))
            for r in out:
                r.pop("_id", None)
            return pa.Table.from_pylist(out)

    ds = ray.data.from_items(specs).repartition(num_partitions)
    return ds.map_batches(
        _Reader, batch_format="pyarrow", concurrency=min(8, num_partitions),
        batch_size=1, num_cpus=0.5,
    )
