"""Registry-wide oracle-SQL type lint.

The driver's value hash is type-sensitive: a DuckDB HUGEINT (INT128)
column hashes differently from BIGINT even when every numeral is
identical.  DuckDB widens a bare ``SUM(BIGINT)`` to HUGEINT, so any
oracle that forgets ``CAST(... AS BIGINT)`` fails the driver gate while
passing value-level local compares — the round-6 (`quality_model_score`)
and round-7 (`winsorize_cap`/`variant_json_query`/`mm_audio_energy`)
defect class.  This lint types every registered oracle through DuckDB's
planner (no execution) and fails on any INT128 column, making the class
structurally unrepeatable.
"""

from __future__ import annotations

import pytest

from hudi_spark_utilities_plus_spark.queries import ORACLES

from .oracle_utils import duckdb_conn


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_has_no_hugeint_column(name, con):
    rel = con.sql(ORACLES[name])
    bad = [
        c
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not bad, (
        f"{name}: oracle column(s) {bad} are HUGEINT/INT128 — add "
        "CAST(... AS BIGINT); the driver's value hash is type-sensitive"
    )
