"""A Python DataSource *wire twin* for the Kafka connector (test double).

``sources/kafka.py`` builds the A1 reader plan with
``format("kafka")`` — but the connector jar and a broker exist only in
production, and "kafka" is a reserved provider name Spark refuses to
re-register. This module registers ``kafka_stub``: a Python DataSource
(Spark 4 API) that emits records in the connector's EXACT output schema
(key/value binary + topic/partition/offset/timestamp/timestampType)
with reference wire-format JSON values (Message.java:26-43), so
``kafka_message_stream(..., source_format="kafka_stub")`` constructs
and RUNS its real reader plan end-to-end — same options, same
downstream decode — in any environment.

Lives in the package (not tests/) because Spark's Python workers must
be able to import the class by module name when the source is
deserialized executor-side.
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

# the Kafka connector's fixed output schema
KAFKA_RECORD_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)

WIRE_ROWS = [
    {"timestamp": 1704067200000, "channel": "click", "username": "u1",
     "message": "spark join"},
    {"timestamp": 1704067210000, "channel": "view", "username": "u2",
     "message": "fast merge"},
]


def wire_records() -> list[tuple]:
    """The stub topic: two valid wire records (key = epoch-millis string,
    Bot.java:136) plus one poison record the decode stage must drop."""
    recs = [
        (str(r["timestamp"]).encode(), json.dumps(r).encode(), "chat", 0, i,
         dt.datetime(2024, 1, 1), 0)
        for i, r in enumerate(WIRE_ROWS)
    ]
    recs.append((b"0", b"{not json", "chat", 0, 99, dt.datetime(2024, 1, 1), 0))
    return recs


class KafkaStubStreamReader(SimpleDataSourceStreamReader):
    def initialOffset(self):
        return {"offset": 0}

    def read(self, start):
        recs = wire_records()
        pos = start["offset"]
        # honor partial offsets: a restart from a mid-topic checkpoint
        # must replay the remaining records, not silently drop them
        return (recs[pos:], {"offset": len(recs)})


class KafkaStub(DataSource):
    @classmethod
    def name(cls):
        return "kafka_stub"

    def schema(self):
        # the reader options must arrive exactly as kafka_message_stream
        # wires them (option keys reach the source lower-cased)
        from .kafka import CONSUMER_GROUP

        opts = dict(self.options)
        assert opts.get("subscribe") == "chat", opts
        assert opts.get("kafka.bootstrap.servers") == "stub:9092", opts
        assert opts.get("kafka.group.id") == CONSUMER_GROUP, opts
        assert opts.get("startingoffsets") == "earliest", opts
        return KAFKA_RECORD_SCHEMA

    def simpleStreamReader(self, schema):
        return KafkaStubStreamReader()


def register(spark) -> None:
    """Idempotent per session; any OTHER registration failure is real
    and must surface here, not later as a provider-lookup error."""
    try:
        spark.dataSource.register(KafkaStub)
    except Exception as exc:
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(exc):
            raise
