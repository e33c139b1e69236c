"""Registry-wide schema guard: every oracle's column set must match its
Spark query's — the drift class behind round-1's hash mismatches.

Cheap version of the full oracle gate: DuckDB runs each oracle with
LIMIT 0 (schema only, no data) against sf0.001 views; Spark builds the
plan (no execution). Catches renamed/missing/extra columns in-suite.
"""

from __future__ import annotations

import duckdb
import pytest

from tower_parse_spark.queries import registry
from tower_parse_spark.session import TABLES, table_path

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(SF_DIR, t)}')"
        )
    yield con
    con.close()


def test_every_oracle_schema_matches_spark(spark, duck):
    mismatches = []
    for name, q in registry().items():
        scols = sorted(q.fn(spark, SF_DIR).columns)
        if q.oracle is None:
            continue
        res = duck.execute(f"SELECT * FROM ({q.oracle}) LIMIT 0")
        dcols = sorted(d[0] for d in res.description)
        if scols != dcols:
            mismatches.append((name, scols, dcols))
    assert not mismatches, mismatches


def test_registry_at_or_below_window_ceiling():
    """The driver oracle-checks exactly the FIRST 50 registry entries,
    and the rotation policy requires every entry driver-green within
    the last two rounds — which caps the registry at 100 (50-slot
    window x wholesale alternation). A 101st query would silently
    orphan one entry from ever being driver-checked again: additions
    must retire or merge an existing query first (COVERAGE.md r8
    rotation section)."""
    r = registry()
    assert len(r) <= 100, (
        f"registry has {len(r)} entries — past the two-round rotation "
        "ceiling; retire or merge a query"
    )
