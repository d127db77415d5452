"""Recursive auto-flattening of nested schemas.

Reference parity: ``TransformUtils.flatten``
(``boxer-common/.../transforms/TransformUtils.scala:46-76``):

- first ``array<struct>`` column → ``explode_outer`` (parent row kept when
  the array is empty/null), recurse (array case, lines 56-64);
- first ``struct`` column → promote children to ``parent_child``
  top-level columns, recurse (struct case, lines 66-71);
- fixpoint when no struct / array-of-struct columns remain.

Rename rule (line 69): separator ``_``; the chars ``. $ space -`` are
normalized to ``_`` and runs of ``_`` collapse to one. Multiple
array-of-struct columns therefore produce a cartesian product of their
elements — documented behavior (``docs/document/01.MongoDB
Ingestion.md:134-147``), reproduced here.

Scale note: explode_outer and struct promotion are narrow (no shuffle);
flattening a 100 TB document table is embarrassingly parallel. Plain
arrays (non-struct elements) are left intact, as in the reference.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def _flat_name(parent: str, child: str) -> str:
    name = f"{parent}_{child}"
    name = re.sub(r"[.$ \-]", "_", name)
    return re.sub(r"_+", "_", name)


def flatten(df: DataFrame) -> DataFrame:
    """Flatten until no StructType / ArrayType(StructType) columns remain."""
    while True:
        fields = df.schema.fields
        arr = next(
            (
                f
                for f in fields
                if isinstance(f.dataType, ArrayType)
                and isinstance(f.dataType.elementType, StructType)
            ),
            None,
        )
        if arr is not None:
            df = df.withColumn(arr.name, F.explode_outer(F.col(f"`{arr.name}`")))
            continue
        st = next((f for f in fields if isinstance(f.dataType, StructType)), None)
        if st is not None:
            cols = []
            for f in fields:
                if f.name == st.name:
                    cols.extend(
                        F.col(f"`{f.name}`.`{c.name}`").alias(_flat_name(f.name, c.name))
                        for c in f.dataType.fields
                    )
                else:
                    cols.append(F.col(f"`{f.name}`"))
            df = df.select(*cols)
            continue
        return df
