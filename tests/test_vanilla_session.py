"""The driver harness builds its own SparkSession — the engine must work
on a vanilla session (no build_session configs). Runs in a subprocess so
the session-scoped pytest SparkSession isn't disturbed."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, ".")
from pyspark.sql import SparkSession

# a deliberately unconfigured session, with a non-UTC timezone to prove
# the engine pins its own event-time semantics
spark = (
    SparkSession.builder.master("local[4]").appName("vanilla")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "America/New_York")
    .getOrCreate()
)
import __spark_entry__ as e

df = e.entry(spark)
rows = df.count()
assert rows > 0, "entry returned no rows"
# hour buckets must be UTC-floored (multiple of 3600)
sample = df.select("hour_bucket").head(5)
assert all(r.hour_bucket % 3600 == 0 for r in sample)

# the riskiest query classes must also run on a vanilla session:
# a streaming replay (state partitions, staging) and Pandas-UDF-backed
# extension operators
qs = e.queries()
sf = "/root/testdata/sf0.001"
assert qs["streaming_hourly_rollup"](spark, sf).count() > 0
assert qs["cosine_topk"](spark, sf).count() > 0
assert qs["minhash_lsh_pairs"](spark, sf).count() >= 0
print("VANILLA_OK", rows)
spark.stop()
"""


def test_entry_runs_on_vanilla_session():
    result = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=".",
    )
    assert "VANILLA_OK" in result.stdout, (
        f"stdout: {result.stdout[-1000:]}\nstderr: {result.stderr[-2000:]}"
    )
