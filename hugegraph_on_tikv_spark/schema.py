"""Schema registry + counters (SURVEY.md §1, phase 1).

The reference's schema store is 4 KV tables of schema rows (property keys,
vertex labels, edge labels, index labels — TikvStore.java:288-343) plus a
name→id secondary index and a counter table allocating monotonic ids per
schema type (increaseCounter/getCounter, TikvStore.java:319-330;
read-modify-write at TikvTables.java:58-62 / TikvStdSessions.java:396-405 —
synchronized per session, NOT atomic across clients).

Spark-first: schema is driver-side metadata (a registry object serializable
to JSON / a small parquet table) because schema rows are tiny and every
executor needs them — exactly the "broadcast small dimension" rule.  The
counter allocator is driver-serialized, which is strictly stronger than the
reference's cross-client non-atomicity (documented there as a caveat; we do
better by construction since allocation happens on one driver).
"""

from __future__ import annotations

import enum
import json
import threading
from dataclasses import asdict, dataclass, field


class DataTypeKind(str, enum.Enum):
    """Property value types (HugeGraph 0.13 public data model → Spark types)."""

    BOOLEAN = "boolean"
    BYTE = "tinyint"
    INT = "int"
    LONG = "long"
    FLOAT = "float"
    DOUBLE = "double"
    TEXT = "string"
    BLOB = "binary"
    DATE = "timestamp"
    UUID = "string"


class Cardinality(str, enum.Enum):
    SINGLE = "single"
    LIST = "list"   # → ArrayType
    SET = "set"     # → ArrayType + de-dup on write


class IndexType(str, enum.Enum):
    """The reference's 7 graph-store index families (TikvStore.java:361-380)."""

    SECONDARY = "secondary"
    VERTEX_LABEL = "vertex_label"
    EDGE_LABEL = "edge_label"
    RANGE = "range"       # typed int/float/long/double collapse to one kind
    SEARCH = "search"
    SHARD = "shard"
    UNIQUE = "unique"


@dataclass
class PropertyKey:
    id: int
    name: str
    data_type: DataTypeKind = DataTypeKind.TEXT
    cardinality: Cardinality = Cardinality.SINGLE


@dataclass
class VertexLabel:
    id: int
    name: str
    properties: list[str] = field(default_factory=list)
    ttl_ms: int = 0


@dataclass
class EdgeLabel:
    id: int
    name: str
    source_label: str = ""
    target_label: str = ""
    properties: list[str] = field(default_factory=list)
    sort_keys: list[str] = field(default_factory=list)
    ttl_ms: int = 0


@dataclass
class IndexLabel:
    id: int
    name: str
    base_label: str = ""
    index_type: IndexType = IndexType.SECONDARY
    fields: list[str] = field(default_factory=list)


_SCHEMA_TYPES = ("property_key", "vertex_label", "edge_label", "index_label")


class SchemaRegistry:
    """Dynamic, explicit schema — elements are created at runtime with ids
    from per-type counters, mirroring the schema store; queryable by id or
    name (the name path is the reference's schema-name secondary index,
    TikvTables.java:176-183)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: dict[str, int] = {t: 0 for t in _SCHEMA_TYPES}
        self._by_name: dict[str, dict[str, object]] = {t: {} for t in _SCHEMA_TYPES}
        self._by_id: dict[str, dict[int, object]] = {t: {} for t in _SCHEMA_TYPES}

    # counters (A3/A4) — atomic here (single driver), unlike the reference
    def next_id(self, schema_type: str) -> int:
        with self._lock:
            self._counters[schema_type] += 1
            return self._counters[schema_type]

    def get_counter(self, schema_type: str) -> int:
        return self._counters[schema_type]

    def _add(self, schema_type: str, element) -> None:
        with self._lock:
            if element.name in self._by_name[schema_type]:
                raise ValueError(f"{schema_type} {element.name!r} already exists")
            self._by_name[schema_type][element.name] = element
            self._by_id[schema_type][element.id] = element

    def create_property_key(self, name: str, data_type: DataTypeKind = DataTypeKind.TEXT,
                            cardinality: Cardinality = Cardinality.SINGLE) -> PropertyKey:
        pk = PropertyKey(self.next_id("property_key"), name, data_type, cardinality)
        self._add("property_key", pk)
        return pk

    def create_vertex_label(self, name: str, properties: list[str] | None = None,
                            ttl_ms: int = 0) -> VertexLabel:
        vl = VertexLabel(self.next_id("vertex_label"), name, properties or [], ttl_ms)
        self._add("vertex_label", vl)
        return vl

    def create_edge_label(self, name: str, source_label: str = "", target_label: str = "",
                          properties: list[str] | None = None,
                          sort_keys: list[str] | None = None, ttl_ms: int = 0) -> EdgeLabel:
        el = EdgeLabel(self.next_id("edge_label"), name, source_label, target_label,
                       properties or [], sort_keys or [], ttl_ms)
        self._add("edge_label", el)
        return el

    def create_index_label(self, name: str, base_label: str, index_type: IndexType,
                           fields: list[str]) -> IndexLabel:
        il = IndexLabel(self.next_id("index_label"), name, base_label, index_type, fields)
        self._add("index_label", il)
        return il

    def get(self, schema_type: str, name: str):
        return self._by_name[schema_type].get(name)

    def get_by_id(self, schema_type: str, id_: int):
        return self._by_id[schema_type].get(id_)

    def drop(self, schema_type: str, name: str) -> None:
        with self._lock:
            el = self._by_name[schema_type].pop(name, None)
            if el is not None:
                self._by_id[schema_type].pop(el.id, None)

    # persistence: tiny JSON blob — per SURVEY §1.4 schema rows are data, not DDL
    def to_json(self) -> str:
        return json.dumps({
            "counters": self._counters,
            "elements": {
                t: {name: asdict(el) for name, el in m.items()}
                for t, m in self._by_name.items()
            },
        }, default=str, sort_keys=True)

    @classmethod
    def from_json(cls, blob: str) -> "SchemaRegistry":
        data = json.loads(blob)
        reg = cls()
        reg._counters = dict(data["counters"])
        ctors = {
            "property_key": PropertyKey,
            "vertex_label": VertexLabel,
            "edge_label": EdgeLabel,
            "index_label": IndexLabel,
        }
        for t, elements in data["elements"].items():
            for name, attrs in elements.items():
                el = ctors[t](**attrs)
                reg._by_name[t][name] = el
                reg._by_id[t][el.id] = el
        return reg
