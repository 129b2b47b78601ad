"""Conformed-metadata column conventions for the Data Vault loaders.

Mirrors the reference's configurable metadata names
(diamond/load/DataLoader.scala:44-75, resources/application.conf
`data.meta`) as a plain dataclass — config here is Python, not HOCON.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class MetaColumns:
    """Names of the conformed metadata columns on every vault table."""

    entity_id: str = "entity_id"
    src_entity_id: str = "src_entity_id"
    dst_entity_id: str = "dst_entity_id"
    entity_type: str = "entity_type"
    id_type: str = "id_type"
    src_id_type: str = "src_id_type"
    dst_id_type: str = "dst_id_type"
    start_time: str = "start_time"
    end_time: str = "end_time"
    valid_start_time: str = "valid_start_time"
    valid_end_time: str = "valid_end_time"
    source: str = "source"
    process_type: str = "process_type"
    process_id: str = "process_id"
    process_date: str = "process_date"
    user_id: str = "user_id"
    hashed_value: str = "hashed_value"
    rectype: str = "rectype"
    version: str = "version"
    confidence: str = "confidence"


@dataclass(frozen=True)
class Rectype:
    """Record-type flags (DataLoader.scala:77-79)."""

    insert: str = "I"
    update: str = "U"
    delete: str = "D"


# Sentinel for open-ended validity (application.conf open-end-date-value,
# used at ParquetDataLoader.scala:89,100).
OPEN_END_DATE = "9999-12-31 00:00:00"

# Vault layer file names (application.conf `data` section).
HISTORY_FILE = "history.parquet"
CURRENT_FILE = "current.parquet"
PREV_FILE = "prev.parquet"
PROC_FILE = "proc.csv"
META_FILE = "meta.json"
NEW_FILE = "new.parquet"
CHANGED_FILE = "changed.parquet"
REMOVED_FILE = "removed.parquet"

META = MetaColumns()
RECTYPE = Rectype()


@dataclass
class ProcessInfo:
    """Lineage stamped onto every loaded row (ParquetDataLoader.scala:99-109)."""

    source: str = "unknown"
    process_type: str = "batch"
    process_id: str = "0"
    user_id: str = "system"
    extra: dict = field(default_factory=dict)
