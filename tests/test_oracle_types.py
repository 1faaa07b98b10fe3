"""Oracle type-hygiene lint: no HUGEINT/DECIMAL may survive to a projection.

DuckDB widens SUM(BIGINT) to HUGEINT and SUM(DOUBLE-money) paths to
DECIMAL; pandas renders both as float64, so a Spark int64 column
stringifies "179" while the oracle renders "179.0" — a driver hash
mismatch with identical values (the exact CORRECTNESS_r08
text_quality_suite failure).  The repo rule is "always CAST ... AS
BIGINT / AS DOUBLE in oracles"; this lint enforces it structurally.

`DESCRIBE <select>` only binds the query (no execution), so the whole
roster lints in seconds — cheap enough to run on every tree, unlike the
full oracle diff.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR
from tests.oracle_diff import duck_connection

_BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


def _banned_columns(con, sql: str) -> list[str]:
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    return [
        f"{name}: {ctype}"
        for name, ctype, *_ in desc
        if any(b in ctype.upper() for b in _BANNED)
    ]


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_oracle_projection_types_are_hash_safe(con, name):
    bad = _banned_columns(con, entrymod.oracle_sql()[name])
    assert not bad, (
        f"{name}: oracle projects {bad} — pandas renders these float64 and "
        "the driver's stringified hash diverges from Spark's integral "
        "rendering; CAST to BIGINT/DOUBLE in the oracle SQL"
    )


def test_lint_catches_uncast_window_sum(con):
    """Self-test: the r8 regression shape (uncast window SUM) must trip."""
    bad = _banned_columns(
        con,
        "SELECT SUM(n) OVER (ORDER BY k) - n AS strt "
        "FROM (SELECT 1 AS k, CAST(2 AS BIGINT) AS n)",
    )
    assert bad and "strt" in bad[0]
