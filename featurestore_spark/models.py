"""Domain model types (diamond/models/*.scala).

The reference ships these as case classes; no operator consumes
Journey/Stage/Task, and Fact/Event rows live as DataFrame rows in
practice. They're provided here as dataclasses + Spark schemas so a
user porting reference code has the same vocabulary, and so
DataFrames can be validated/constructed against the canonical shapes.

- Journey/Stage/Task: journey-analytics grouping hierarchy
  (Journey.scala:6, Stage.scala:6, Task.scala:6).
- Fact: versioned entity-attribute-value state change
  (Fact.scala:24-39); natural key (entity, attribute, ts, version).
- Event: like Fact plus session/task linkage (Event.scala:24-40).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import types as T


@dataclass
class Journey:
    id: str
    name: str


@dataclass
class Stage:
    id: str
    name: str
    journey: Journey


@dataclass
class Task:
    id: str
    name: str
    stages: list[Stage] = field(default_factory=list)


@dataclass
class Fact:
    entity: str
    attribute: str
    ts: datetime
    namespace: str
    value: str
    properties: str
    start_time: datetime
    end_time: datetime
    source: str
    process_type: str
    process_id: str
    process_date: datetime
    user_id: str
    rectype: str
    version: int

    # natural key ordering (Fact.scala:44-48 commented Ordered)
    def sort_key(self):
        return (self.entity, self.attribute, self.ts, self.version)


@dataclass
class Event:
    entity: str
    event_type: str
    ts: datetime
    session: int
    value: str
    properties: str
    start_time: datetime
    end_time: datetime
    source: str
    process_type: str
    process_id: str
    process_date: datetime
    user_id: str
    rectype: str
    version: int
    namespace: str = "default"
    task: Task | None = None


def _meta_fields() -> list[T.StructField]:
    return [
        T.StructField("start_time", T.TimestampType()),
        T.StructField("end_time", T.TimestampType()),
        T.StructField("source", T.StringType()),
        T.StructField("process_type", T.StringType()),
        T.StructField("process_id", T.StringType()),
        T.StructField("process_date", T.TimestampType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("rectype", T.StringType()),
        T.StructField("version", T.IntegerType()),
    ]


FACT_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("attribute", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("namespace", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("properties", T.StringType()),
    ]
    + _meta_fields()
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("namespace", T.StringType()),
        T.StructField("session", T.IntegerType()),
        T.StructField("value", T.StringType()),
        T.StructField("properties", T.StringType()),
    ]
    + _meta_fields()
)
