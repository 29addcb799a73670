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

import os

from pyspark.sql import SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def vanilla_session(app_name: str) -> SparkSession:
    """A driver-like unconfigured session. One deliberate exception to
    "unconfigured": PYTHONPATH must carry the repo root so forked
    Python UDF workers can unpickle closures that reference engine
    modules — the driver runs from the repo root and gets this for
    free; the rehearsal must not silently depend on its own cwd (4
    Pandas-UDF queries fail when launched from elsewhere otherwise)."""
    existing = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _REPO_ROOT + (os.pathsep + existing if existing else "")
        )
    spark = (
        SparkSession.builder.master("local[8]")
        .appName(app_name)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark
