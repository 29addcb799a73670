"""Small literal DataFrames as pure-Catalyst plans (r12, guide §4).

``spark.createDataFrame(list_of_rows, schema)`` parallelizes PICKLED
rows into a defaultParallelism-task Python-RDD scan: every task spins a
Python worker just to deserialize a handful of constants. Measured at
sf0.1 (stage metrics): the funnel's 4-row step frame planned as a
32-task stage costing ~50 s of task time for ~0.4 s of CPU — per-task
Python-worker startup, nothing else — and the same shape sat under
token_frequencies and the incremental dedup's driver-built drop list.

``literal_frame`` renders the rows as ONE SQL ``VALUES`` clause (a
single py4j call — a per-cell Column-expression build was measured
SLOWER than the RDD scan it replaced: thousands of py4j round trips)
and casts each column to the declared type, yielding a JVM-only
LocalRelation with zero Python workers and zero scan tasks. Cells may
be int / float / bool / str / None or flat lists of those; anything
else falls back to a ONE-slice pickled RDD, which still replaces the
32-task worker spin-up with a single reused worker.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _sql_literal(value) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        # repr is the shortest round-tripping decimal; Spark parses it
        # back to the identical double
        return repr(value)
    if isinstance(value, str):
        return "'" + value.replace("\\", "\\\\").replace("'", "''") + "'"
    if isinstance(value, (list, tuple)):
        return "array(" + ", ".join(_sql_literal(v) for v in value) + ")"
    raise TypeError(type(value).__name__)


def literal_frame(
    spark: SparkSession, rows: Sequence[tuple], schema: str
) -> DataFrame:
    """Typed literal rows without a Python-RDD scan. ``schema`` is a DDL
    string (the same form ``createDataFrame`` takes)."""
    struct_type = T._parse_datatype_string(schema)
    if not rows:
        # empty input: createDataFrame([], schema) is already a pure
        # LocalRelation (no RDD, no Python) — keep it
        return spark.createDataFrame([], struct_type)
    try:
        values = ", ".join(
            "(" + ", ".join(_sql_literal(v) for v in row) + ")"
            for row in rows
        )
    except TypeError:
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), struct_type
        )
    cols = ", ".join(
        f"CAST({f.name} AS {f.dataType.simpleString()}) AS {f.name}"
        for f in struct_type.fields
    )
    names = ", ".join(f.name for f in struct_type.fields)
    return spark.sql(
        f"SELECT {cols} FROM VALUES {values} AS _lit({names})"
    )
