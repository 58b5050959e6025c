"""Differential tests: every oracle-bearing query — the 50 driver-swept
registry entries AND the pytest-only EXTRA tier — runs on Spark and DuckDB
over the same parquet tables; results must match (order-insensitive,
float-tolerant) — the same gate the driver applies."""

from __future__ import annotations

import pytest

from ducktales_spark.registry import load_all, load_extra

from tests.oracle import compare, duckdb_conn

SPECS = {**load_all(), **load_extra()}
ORACLE_NAMES = sorted(SPECS)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, con, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    problems = compare(df, con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_registry_contract():
    """The driver sweeps EXACTLY 50 registry entries in registration order:
    more would silently drop the tail out of CORRECTNESS (round-1 lesson:
    sweep stopped at 50 of 79), fewer wastes covered slots. Every entry —
    registry and EXTRA — must carry an oracle: a regression to rows-only
    checking must be a deliberate choice, not an accident."""
    specs = load_all()
    assert len(specs) == 50, f"registry has {len(specs)} entries, driver sweeps 50"
    missing = [n for n, s in {**specs, **load_extra()}.items() if not s.oracle]
    assert not missing, f"entries without oracle SQL: {missing}"


def test_registry_covers_every_survey_id():
    """Registry rotations must never orphan a SURVEY.md §2 operator id: the
    DRIVER-SWEPT registry (not the EXTRA tier) must keep covering every id
    that has ever had a driver CORRECTNESS row. F12 is §2.8's 'not an
    engine op' and has no id anywhere by design."""
    required = {
        # §2 ids, grouped as in SURVEY.md §2 / VERDICT's coverage table
        "S1", "S2", "S3", "S4", "S5", "S6", "S7", "S8", "S9", "S10",
        "P1", "P2", "P3", "P4", "P5", "P6", "P7", "P8", "P9", "P10", "P11",
        "J1", "J2", "J3",
        "A1", "A2", "A3", "A4", "A5", "A6", "A7", "A8", "A9", "A10",
        "W1", "O1", "O2", "O3", "O4", "U1",
        "F1", "F2", "F3", "F4", "F5", "F6", "F7", "F8", "F9", "F10", "F11",
        "D1", "D2", "D3", "D4", "D5", "D6", "D7", "D8", "D9", "D10", "D11",
        "D12", "D13", "D14", "D15", "D16",
        "T1", "T2", "T3", "T4", "T5", "T6",
        "M1", "M2",
    }
    covered = {i for s in load_all().values() for i in s.survey_ids}
    orphaned = required - covered
    assert not orphaned, f"SURVEY §2 ids no longer driver-swept: {sorted(orphaned)}"
