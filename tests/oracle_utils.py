"""Local replica of the driver's DuckDB-oracle compare, so every query id
can be verified before the round gate runs it at sf0.01.

Compare contract (per __spark_entry__ docstring): row count + schema
(column names, sorted) + order-insensitive value comparison. Floats are
compared with a tiny absolute tolerance — the queries themselves round
any aggregate so the driver's exact hash also matches.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, Decimal):
        return ("f", float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", v)
    # Ints stay distinct from floats: the driver's hash is repr-strict, so
    # an oracle emitting 1040.0 against Spark's 1040 is a real failure this
    # pre-flight must catch (it bit pack_token_budget in round 3).
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_norm(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _norm(x)) for k, x in v.items())))
    return ("s", str(v))


def _rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def _approx_eq(a, b, tol=1e-6):
    if a == b:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        if a and a[0] == "f" and b[0] == "f":
            x, y = a[1], b[1]
            return abs(x - y) <= tol * max(1.0, abs(x), abs(y))
        return all(_approx_eq(x, y, tol) for x, y in zip(a, b))
    return False


def _spark_kind(dt) -> str | None:
    """Collapse a Spark type to a cross-engine comparability kind."""
    n = dt.typeName()
    if n in ("byte", "short", "integer", "long"):
        return "int"
    if n in ("float", "double"):
        return "float"
    if n == "decimal":
        return "decimal"
    return None


def _duck_kind(t) -> str | None:
    """Collapse a DuckDB type to a kind; HUGEINT is its own (always-fail)
    kind because the driver's value hash distinguishes INT128 from BIGINT
    even when the numerals are identical (round-7 red rows)."""
    s = str(t).upper()
    if "HUGEINT" in s:
        return "hugeint"
    if s in (
        "TINYINT",
        "SMALLINT",
        "INTEGER",
        "BIGINT",
        "UTINYINT",
        "USMALLINT",
        "UINTEGER",
        "UBIGINT",
    ):
        return "int"
    if s in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if s.startswith("DECIMAL"):
        return "decimal"
    return None


def check_types(spark_df, con, sql: str) -> tuple[bool, str]:
    """Type-strict cross-engine check: the driver's value hash is
    type-sensitive, so a DuckDB HUGEINT (or a DECIMAL-vs-BIGINT /
    BIGINT-vs-DOUBLE skew) fails the driver even when every numeral is
    identical.  Mirror that here so the local sweep catches it."""
    d_rel = con.sql(sql)
    d_kinds = {
        c.lower(): _duck_kind(t) for c, t in zip(d_rel.columns, d_rel.types)
    }
    s_kinds = {
        f.name.lower(): _spark_kind(f.dataType)
        for f in spark_df.schema.fields
    }
    for col, dk in sorted(d_kinds.items()):
        if dk == "hugeint":
            return False, (
                f"oracle column {col!r} is HUGEINT/INT128 — cast the SQL "
                "to BIGINT (DuckDB widens bare SUM(BIGINT); driver hash "
                "is type-sensitive)"
            )
        sk = s_kinds.get(col)
        if dk is not None and sk is not None and dk != sk:
            return False, (
                f"type-kind skew on {col!r}: spark={sk} duckdb={dk} — "
                "the driver's value hash treats these as different"
            )
    return True, "ok"


def compare(spark_df, con, sql: str, tol: float = 1e-6) -> tuple[bool, str]:
    """Compare a Spark DataFrame result with a DuckDB oracle result."""
    # type check first: it needs only planner metadata from both engines,
    # so a HUGEINT/kind-skew failure surfaces in milliseconds instead of
    # after a full Spark job
    ok, msg = check_types(spark_df, con, sql)
    if not ok:
        return False, msg
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [c[0].lower() for c in rel.description]
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    s_ms = _rows_to_multiset(s_rows, s_cols)
    d_ms = _rows_to_multiset(d_rows, d_cols)
    for i, (a, b) in enumerate(zip(s_ms, d_ms)):
        if not _approx_eq(a, b, tol):
            return False, f"value mismatch at sorted row {i}:\n  spark={a}\n  duck ={b}"
    return True, "ok"
