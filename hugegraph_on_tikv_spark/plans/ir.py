"""Query IR — a thin dataclass mirror of the reference's query classes.

The reference is entered with HugeGraph's `Query` hierarchy: `Query`
(scan-all / by-ids / limit / paging), `IdPrefixQuery`, `IdRangeQuery`,
`ConditionQuery` with an optional `Aggregate` (TikvTable.java:35-41, routed
at TikvTable.java:159-189).  Scan-type flags form a small predicate grammar
(TikvSessions.java:52-58): GTE = GT|0x08, LTE = LT|0x20, validated for
contradictory combinations (TikvStdSessions.java:542-584).

We keep the same IR shape for API parity, but it compiles to DataFrame plans
(plans/engine.py) — Catalyst, not byte-range arithmetic, does the pruning.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Sequence


class ScanType(enum.IntFlag):
    """Mirror of TikvSessions.java:52-58 (same composability rules)."""

    SCAN_ANY = 0x80
    SCAN_PREFIX_BEGIN = 0x01
    SCAN_PREFIX_END = 0x02
    SCAN_GT_BEGIN = 0x04
    SCAN_GTE_BEGIN = 0x04 | 0x08
    SCAN_LT_END = 0x10
    SCAN_LTE_END = 0x10 | 0x20

    def match(self, other: "ScanType") -> bool:
        return bool(self & other)


def validate_scan_type(scan_type: int, start: Any, end: Any) -> None:
    """Analyzer-time validation of flag combos (TikvStdSessions.java:542-584):
    rejects contradictory flags and null keys for flags that need them."""
    st = ScanType(scan_type)
    if st.match(ScanType.SCAN_PREFIX_BEGIN) and st.match(ScanType.SCAN_PREFIX_END):
        raise ValueError("invalid scan type: both PREFIX_BEGIN and PREFIX_END")
    if st.match(ScanType.SCAN_GT_BEGIN) and st.match(ScanType.SCAN_PREFIX_BEGIN):
        raise ValueError("invalid scan type: both GT_BEGIN and PREFIX_BEGIN")
    if st.match(ScanType.SCAN_PREFIX_BEGIN) and start is None:
        raise ValueError("start key required for PREFIX_BEGIN scan")
    if st.match(ScanType.SCAN_GT_BEGIN) and start is None:
        raise ValueError("start key required for GT(E)_BEGIN scan")
    if st.match(ScanType.SCAN_LT_END) and end is None:
        raise ValueError("end key required for LT(E)_END scan")


class Op(enum.Enum):
    """Condition relations.  The reference pushes down PREFIX/GT/GTE/LT/LTE on
    the id sysprop (TikvTables.java:242-278); EQ/IN/CONTAINS/CONTAINS_KEY are
    declared unsupported there (TikvFeatures.java:51-54, 71-79) and evaluated
    upstream — in our engine they are all plain Catalyst filters."""

    EQ = "="
    NEQ = "!="
    GT = ">"
    GTE = ">="
    LT = "<"
    LTE = "<="
    IN = "in"
    PREFIX = "prefix"
    CONTAINS = "contains"          # collection value contains element
    CONTAINS_KEY = "contains_key"  # map column has key
    TEXT_CONTAINS = "text_contains"  # full-text token match (search index)


@dataclass(frozen=True)
class Condition:
    column: str
    op: Op
    value: Any


class AggregateFunc(enum.Enum):
    COUNT = "count"
    MIN = "min"
    MAX = "max"
    SUM = "sum"
    AVG = "avg"


@dataclass(frozen=True)
class Aggregate:
    func: AggregateFunc
    column: str | None = None  # None = count(*)


@dataclass(frozen=True)
class Shard:
    """One parallel-scan shard = a key range (TikvTable.java:300-317 builds
    these from TiKV region boundaries)."""

    start: Any
    end: Any
    length: int = 0


@dataclass
class Query:
    """Scan-all (optionally paged/limited).  limit=None → noLimit."""

    table: str
    limit: int | None = None
    page: str | None = None
    aggregate: Aggregate | None = None


@dataclass
class IdQuery(Query):
    """Point get (1 id, TikvTable.java:207-214) / multi-id flat-map lookup
    (TikvTable.java:177-184).  Result order follows input id order
    (supportsQuerySortByInputIds, TikvFeatures.java:61-64)."""

    ids: Sequence[Any] = field(default_factory=tuple)


@dataclass
class IdPrefixQuery(Query):
    """All keys with `prefix`, optionally resuming from `start`
    (TikvTable.java:216-223)."""

    prefix: Any = None
    start: Any = None
    inclusive_start: bool = True


@dataclass
class IdRangeQuery(Query):
    """Keys in [start, end] with per-bound inclusivity (TikvTable.java:225-236)."""

    start: Any = None
    end: Any = None
    inclusive_start: bool = True
    inclusive_end: bool = False


@dataclass
class ConditionQuery(Query):
    """Condition scan.  The reference's base table only accepts a single
    `Scan` relation (shard scan, TikvTable.java:238-248); index tables accept
    PREFIX/range relations (TikvTables.java:242-278).  Our engine accepts any
    condition list — everything the reference's upstream evaluated in memory
    becomes a pushed-down Catalyst filter."""

    conditions: Sequence[Condition] = field(default_factory=tuple)
    shard: Shard | None = None
