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
    Pandas-UDF queries fail when launched from elsewhere otherwise).

    Ordering contract: the env mutation only reaches workers if the
    py4j gateway JVM has not been launched yet — call this BEFORE any
    other SparkSession in the process (asserted below rather than
    silently not working)."""
    from pyspark import SparkContext

    existing = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in existing.split(os.pathsep):
        if (
            SparkContext._gateway is not None
            and os.path.realpath(os.getcwd()) != os.path.realpath(_REPO_ROOT)
        ):
            # cwd == repo root covers workers by itself; otherwise a
            # pre-existing gateway means the fix can no longer land
            raise RuntimeError(
                "vanilla_session must run before any SparkSession in this "
                "process (or from the repo root): the JVM gateway is "
                "already up, so the PYTHONPATH fix for forked UDF workers "
                "cannot take effect"
            )
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
