"""Capture .explain("formatted") for every registered query into
plans/r12/<name>_<tag>.txt  (tag = before/after).

Usage: python tools/r12_capture_plans.py <tag> [name ...]
Plan-only for batch queries (nothing executes). Streaming replay
queries execute on construction, so they are SKIPPED here — their
plan evidence is the streaming query progress/physical notes captured
separately.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from cassandra_iot_pipeline_spark.plans import formatted_plan  # noqa: E402
from cassandra_iot_pipeline_spark.session import build_session  # noqa: E402

STREAMING = {
    "streaming_hourly_rollup",
    "streaming_raw_passthrough",
    "streaming_sessionize",
    "streaming_conversion_pairs",
}
# queries that run driver-side actions on construction (bounded
# collects); their plan capture executes those actions — fine, just slow
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    spark = build_session("r12-plans")
    qs = entrymod.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(outdir, exist_ok=True)
    for name, fn in sorted(qs.items()):
        if name in STREAMING or (only and name not in only):
            continue
        try:
            plan = formatted_plan(fn(spark, SF_DIR))
        except Exception as exc:
            plan = f"ERROR: {exc}"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}_{tag}")
    spark.stop()


if __name__ == "__main__":
    main()
