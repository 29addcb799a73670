"""The one shared driver-like session recipe.

Both self-check tools (``oracle_check`` — value/dtype parity;
``driver_rehearsal`` — cold-run integration) build their session here so
they exercise the same surface the driver does: a deliberately
*unconfigured* SparkSession — non-UTC timezone, default shuffle
partitions, no build_session tuning.  Any query that silently depends on
build_session configs, cwd, or prior warmup fails under this recipe
before it fails under the driver.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def vanilla_session(app_name: str) -> SparkSession:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName(app_name)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark
