"""Live-service smoke tests for the Kafka / Postgres / Mongo adapters.

Skipped by default: the sandbox has no brokers or databases, so the
adapters are normally exercised through injected fake clients
(test_connectors.py). Against real services, run

    docker compose -f configs/docker-compose.live.yml up -d
    ETL_LIVE_KAFKA_BROKERS=localhost:19092 \
    ETL_LIVE_PG_DSN="host=localhost port=15432 user=etl password=etl dbname=etl" \
    ETL_LIVE_MONGO_URI="mongodb://localhost:27017" \
    python -m pytest tests/test_live_services.py -v

Each test skips independently when its env var is unset or the client
library (confluent-kafka / psycopg2 / pymongo) is not installed, so a
partial stack still verifies what it can.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pytest

from etl_rs_ray.sources import connectors

KAFKA = os.environ.get("ETL_LIVE_KAFKA_BROKERS")
PG = os.environ.get("ETL_LIVE_PG_DSN")
MONGO = os.environ.get("ETL_LIVE_MONGO_URI")

pytestmark = pytest.mark.live


def _require(env_value, env_name, package):
    if not env_value:
        pytest.skip(f"{env_name} not set (live services absent)")
    pytest.importorskip(package)


def _fresh(name: str) -> str:
    return f"{name}_{uuid.uuid4().hex[:8]}"


@pytest.mark.skipif(not KAFKA, reason="ETL_LIVE_KAFKA_BROKERS not set")
def test_kafka_produce_then_bounded_replay(ray_session):
    """Keyed produce -> offset-bounded replay must return every message
    of the range in offset order per partition (S3+S5 live)."""
    _require(KAFKA, "ETL_LIVE_KAFKA_BROKERS", "confluent_kafka")
    import ray.data
    from confluent_kafka.admin import AdminClient, NewTopic

    topic = _fresh("etl_smoke")
    admin = AdminClient({"bootstrap.servers": KAFKA})
    admin.create_topics([NewTopic(topic, num_partitions=2, replication_factor=1)])[topic].result(30)

    rows = [{"k": f"key{i % 7}", "v": f"value-{i}"} for i in range(200)]
    ds = ray.data.from_items(rows)
    sent = connectors.write_kafka(ds, topic, KAFKA, key_col="k", value_col="v", concurrency=1)
    assert sent == 200

    # discover end offsets, then replay the full bounded range
    from confluent_kafka import Consumer, TopicPartition

    probe = Consumer({"bootstrap.servers": KAFKA, "group.id": _fresh("probe")})
    offsets = {}
    for p in (0, 1):
        lo, hi = probe.get_watermark_offsets(TopicPartition(topic, p), timeout=10)
        offsets[p] = (lo, hi)
    probe.close()
    assert sum(hi - lo for lo, hi in offsets.values()) == 200

    got = connectors.read_kafka(topic, KAFKA, _fresh("grp"), offsets).take_all()
    assert len(got) == 200
    vals = sorted(bytes(r["value"]).decode() for r in got)
    assert vals == sorted(r["v"] for r in rows)
    # per-partition offset order (Kafka's ordering contract)
    for p in (0, 1):
        part = [r["offset"] for r in got if r["partition"] == p]
        assert part == sorted(part)


@pytest.mark.skipif(not PG, reason="ETL_LIVE_PG_DSN not set")
def test_postgres_roundtrip_overwrite_and_partitioned_read(ray_session):
    """write_postgres overwrite + append, then a range-partitioned
    read_postgres must reproduce the rows (S6+S7 live)."""
    _require(PG, "ETL_LIVE_PG_DSN", "psycopg2")
    import psycopg2
    import ray.data

    table = _fresh("etl_smoke")
    conn = psycopg2.connect(PG)
    cur = conn.cursor()
    cur.execute(f'CREATE TABLE "{table}" (id BIGINT, name TEXT)')
    conn.commit()
    try:
        rows = [{"id": i, "name": f"n{i}"} for i in range(500)]
        n = connectors.write_postgres(ray.data.from_items(rows), PG, table, mode="overwrite")
        assert n == 500
        # overwrite truncates previous content
        n = connectors.write_postgres(ray.data.from_items(rows), PG, table, mode="overwrite")
        assert n == 500

        got = connectors.read_postgres(
            PG, table, partition_col="id", bounds=(0, 499), num_partitions=4
        ).take_all()
        assert sorted(r["id"] for r in got) == list(range(500))
        assert {r["name"] for r in got} == {f"n{i}" for i in range(500)}
    finally:
        cur.execute(f'DROP TABLE "{table}"')
        conn.commit()
        conn.close()


@pytest.mark.skipif(not MONGO, reason="ETL_LIVE_MONGO_URI not set")
def test_mongo_overwrite_append_read(ray_session):
    """Overwrite drops, append accumulates, partitioned read returns
    the union (S8 live)."""
    _require(MONGO, "ETL_LIVE_MONGO_URI", "pymongo")
    import ray.data

    coll = _fresh("etl_smoke")
    rows1 = [{"id": i, "name": f"a{i}"} for i in range(100)]
    rows2 = [{"id": 1000 + i, "name": f"b{i}"} for i in range(50)]

    n = connectors.write_mongo(ray.data.from_items(rows1), MONGO, "etl_test", coll, mode="overwrite")
    assert n == 100
    n = connectors.write_mongo(ray.data.from_items(rows2), MONGO, "etl_test", coll, mode="append")
    assert n == 50

    got = connectors.read_mongo(MONGO, "etl_test", coll, num_partitions=4).take_all()
    assert sorted(r["id"] for r in got) == sorted([r["id"] for r in rows1] + [r["id"] for r in rows2])

    # overwrite replaces everything
    n = connectors.write_mongo(ray.data.from_items(rows2), MONGO, "etl_test", coll, mode="overwrite")
    assert n == 50
    got = connectors.read_mongo(MONGO, "etl_test", coll, num_partitions=2).take_all()
    assert len(got) == 50

    import pymongo

    pymongo.MongoClient(MONGO)["etl_test"][coll].drop()
