"""Schema Registry client (SURVEY §2.A S2).

The reference fetches the latest Avro schema for ``<topic>-value`` from
Confluent Schema Registry over HTTP at startup, *before* building the
streaming plan, because the decode expression needs the schema string at
plan-construction time (reference:
iot-cassandra-pipeline/src/spark_consumer.py:34-57). Same pattern here:
one plan-time HTTP GET (cached), with an offline fallback to the
module-level schema constants — the engine never does per-row registry
traffic.
"""

from __future__ import annotations

import json
from functools import lru_cache

from ..schemas import SENSOR_EVENT_AVRO


@lru_cache(maxsize=64)
def fetch_latest_schema(registry_url: str, subject: str, timeout_s: float = 5.0) -> str:
    """GET /subjects/{subject}/versions/latest -> schema string.
    Mirrors the reference's client (spark_consumer.py:39-57)."""
    import requests

    resp = requests.get(
        f"{registry_url.rstrip('/')}/subjects/{subject}/versions/latest",
        timeout=timeout_s,
    )
    resp.raise_for_status()
    return resp.json()["schema"]


def sensor_event_schema(registry_url: str | None = None) -> str:
    """The SensorEvent Avro schema: from the registry when one is
    configured, else the vendored contract (offline/test mode)."""
    if registry_url:
        try:
            return fetch_latest_schema(registry_url, "sensor-events-value")
        except Exception:
            pass  # registry unreachable -> vendored contract
    return SENSOR_EVENT_AVRO


def check_backward_compatible(old_schema: str, new_schema: str) -> list[str]:
    """Client-side BACKWARD compatibility check (the policy the
    reference's registry enforces: new readers must read old data —
    docs/data-contracts.md:70-92). Returns a list of violations; empty
    means compatible. Covers the record-of-primitives shape this engine
    uses: removed-without-default and added-without-default fields."""
    old = {f["name"]: f for f in json.loads(old_schema)["fields"]}
    new = {f["name"]: f for f in json.loads(new_schema)["fields"]}
    problems = []
    for name, field in new.items():
        if name not in old and "default" not in field:
            problems.append(f"added field {name!r} has no default")
    for name, field in old.items():
        if name not in new:
            # removal is fine for BACKWARD (new reader ignores old data
            # it no longer declares) — nothing to check
            continue
        if old[name]["type"] != new[name]["type"]:
            problems.append(f"field {name!r} changed type")
    return problems
