"""Skew-mitigation patterns: salted aggregation and salted join.

At 100 TB a handful of hot keys (one viral document source, one giant
customer) can pin a full shuffle partition to one task. AQE's skew-join
splitting covers sort-merge joins; for aggregations and broadcast-less
joins the standard fix is salting, packaged here as reusable operators.

``salted_agg`` is semantically identical to ``df.groupBy(keys).agg`` —
it adds a random-free deterministic salt (hash of the whole row modulo
``n_salts``), pre-aggregates on (key, salt) so every hot key splits into
``n_salts`` parallel partial groups, then merges. Only works for
algebraic aggregates (sum/count/min/max) — exactly the ones that
partial-aggregate anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of all columns —
    no RNG, so retried tasks produce identical output (exactly-once
    safety under speculative execution)."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column name → (phase1 aggregate over raw rows,
    phase2 merge over phase-1 partials named the same). Example::

        salted_agg(df, ["k"], {
            "n":   (F.count("*"),      F.sum("n")),
            "tot": (F.sum("x"),        F.sum("tot")),
            "mx":  (F.max("x"),        F.max("mx")),
        })
    """
    phase1 = (
        with_salt(df, n_salts)
        .groupBy(*keys, "__salt")
        .agg(*[c.alias(name) for name, (c, _) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[m.alias(name) for name, (_, m) in aggs.items()]
    )
