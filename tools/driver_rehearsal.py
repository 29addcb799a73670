"""Full driver rehearsal: a cold, deliberately *unconfigured*
SparkSession (non-UTC timezone, default shuffle partitions) runs
``entry`` plus every ``queries()`` entry at the given sf — the exact
integration surface the driver exercises. Any query that depends on
build_session configs, cwd, or prior warmup fails here first.

Usage: python tools/driver_rehearsal.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

from vanilla import vanilla_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = vanilla_session("driver-rehearsal")
    import __spark_entry__ as e

    failures = 0
    t0 = time.time()
    n = e.entry(spark).count()
    print(f"entry: {n} rows ({time.time() - t0:.1f}s)")
    assert n > 0
    for name, fn in e.queries().items():
        t0 = time.time()
        try:
            rows = fn(spark, sf_dir).count()
            print(f"ok   {name}: {rows} rows ({time.time() - t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"FAIL {name}: {type(exc).__name__}: {str(exc)[:200]}")
    spark.stop()
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
