"""Capture .explain("formatted") for registered queries into
plans/r13/<name>_<tag>.txt  (tag = before/after).

Usage: python tools/r13_capture_plans.py <tag> [name ...]

Unlike the r12 capture, streaming replay queries are INCLUDED when
named explicitly: they execute their bounded replay on construction
(a few seconds each) and the captured plan is the *returned read
DataFrame* — exactly the surface the r13 sink reconcile-skip changes
(Window + Exchange present before, absent after on single-epoch
replays). Batch queries stay plan-only (nothing executes).
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
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    spark = build_session("r13-plans")
    qs = entrymod.queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(outdir, exist_ok=True)
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        if name in STREAMING and not only:
            continue  # replays execute on construction; opt in by name
        try:
            plan = formatted_plan(fn(spark, SF_DIR))
        except Exception as exc:  # pragma: no cover - capture tool
            plan = f"ERROR: {exc}"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}_{tag}")
    spark.stop()


if __name__ == "__main__":
    main()
