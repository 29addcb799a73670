"""Continuous schema-drift monitoring (streaming/schema_drift.py):
per-epoch field-presence reports match hand counts (corrupt lines
under the pseudo-field), a planted NEW upstream field alerts
'undeclared' at exactly its epoch, a declared field vanishing —
including dropping to ZERO rows (no stored row at all) — alerts
'vanishing' at its epoch, replay idempotence, compaction
invisibility, and the CUSUM loop closed at birth (the r8 lesson)."""

from __future__ import annotations

from cassandra_iot_pipeline_spark.operators.changepoints import (
    cusum_changepoints,
)
from cassandra_iot_pipeline_spark.streaming.schema_drift import (
    SchemaDriftPipeline,
)

DECLARED = "doc_id BIGINT, text STRING, source STRING"


def _lines(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value STRING")


def _clean(i):
    return f'{{"doc_id": {i}, "text": "t{i}", "source": "web"}}'


def test_report_matches_hand_counts(spark, tmp_path):
    pipe = SchemaDriftPipeline(str(tmp_path / "s"), DECLARED)
    lines = [
        _clean(1),
        '{"doc_id": 2, "source": "web"}',  # text missing
        "not json at all",  # corrupt
        '{"doc_id": 3, "text": "x", "source": "web", "lang": "en"}',
    ]
    pipe.write_batch(_lines(spark, lines), epoch_id=0)
    got = {
        r["field"]: (r["n_present"], r["n_rows"], r["declared"])
        for r in pipe.history(spark).collect()
    }
    assert got == {
        "doc_id": (3, 4, True),
        "text": (2, 4, True),
        "source": (3, 4, True),
        "lang": (1, 4, False),
        "_corrupt": (1, 4, False),
    }


def _planted(spark, tmp_path):
    pipe = SchemaDriftPipeline(str(tmp_path / "s"), DECLARED)
    # epochs 0-2: clean contract-shaped lines
    for e in range(3):
        pipe.write_batch(
            _lines(spark, [_clean(10 * e + j) for j in range(10)]), epoch_id=e
        )
    # epoch 3: upstream adds 'lang' to half the lines AND drops 'text'
    # entirely (zero presence — no stored row for it at all)
    drifted = [
        f'{{"doc_id": {j}, "source": "web", "lang": "en"}}'
        if j % 2 == 0
        else f'{{"doc_id": {j}, "source": "web"}}'
        for j in range(10)
    ]
    pipe.write_batch(_lines(spark, drifted), epoch_id=3)
    return pipe


def test_planted_drift_alerts_at_its_epoch(spark, tmp_path):
    pipe = _planted(spark, tmp_path)
    alerts = {
        (r["kind"], r["field"], r["epoch"]): r
        for r in pipe.drift(spark).collect()
    }
    assert ("undeclared", "lang", 3) in alerts
    assert abs(alerts[("undeclared", "lang", 3)]["frac"] - 0.5) < 1e-12
    v = alerts[("vanishing", "text", 3)]
    assert v["frac"] == 0.0 and v["baseline_frac"] == 1.0
    # quiet epochs stay quiet
    assert not any(e < 3 for (_, _, e) in alerts)


def test_replay_and_compaction_invisible(spark, tmp_path):
    pipe = _planted(spark, tmp_path)
    before = sorted(tuple(r) for r in pipe.history(spark).collect())
    pipe.write_batch(
        _lines(spark, [_clean(10 + j) for j in range(10)]), epoch_id=1
    )  # replay epoch 1
    assert sorted(tuple(r) for r in pipe.history(spark).collect()) == before
    assert pipe.compact(spark) == 3
    assert sorted(tuple(r) for r in pipe.history(spark).collect()) == before


def test_cusum_over_presence_series(spark, tmp_path):
    """The monitoring loop closed at birth: the presence-fraction
    series of the vanished declared field alarms 'down' at the drift
    epoch through cusum_changepoints (grid-filled zeros included)."""
    pipe = _planted(spark, tmp_path)
    h = pipe.history(spark)
    # fill the declared grid the way drift() does: feed text's series
    series = h.filter(h["field"] == "text").select("field", "epoch", "frac")
    # epoch 3 has no 'text' row; union the explicit zero the grid adds
    zero = spark.createDataFrame(
        [("text", 3, 0.0)], "field STRING, epoch BIGINT, frac DOUBLE"
    )
    alarms = cusum_changepoints(
        series.unionByName(zero),
        ["field"],
        "frac",
        k=0.05,
        h=0.3,
        baseline_n=3,
    ).collect()
    assert [(r["field"], r["epoch"], r["direction"]) for r in alarms] == [
        ("text", 3, "down")
    ]


def test_type_drift_alerts_as_coercion(spark, tmp_path):
    """Upstream re-types a declared field (doc_id becomes a string):
    presence is UNCHANGED — only the coercion counter sees it (Spark's
    permissive JSON parser nulls exactly the mismatched field, pinned
    here by construction). Alerts at exactly its epoch."""
    pipe = SchemaDriftPipeline(str(tmp_path / "s"), DECLARED)
    for e in range(2):
        pipe.write_batch(
            _lines(spark, [_clean(10 * e + j) for j in range(10)]), epoch_id=e
        )
    retyped = [
        f'{{"doc_id": "id-{j}", "text": "t{j}", "source": "web"}}'
        for j in range(10)
    ]
    pipe.write_batch(_lines(spark, retyped), epoch_id=2)
    h = {
        (r["epoch"], r["field"]): (r["n_present"], r["n_coerced"])
        for r in pipe.history(spark).collect()
    }
    assert h[(2, "doc_id")] == (10, 10)  # present everywhere, all nulled
    assert h[(1, "doc_id")] == (10, 0)
    alerts = {
        (r["kind"], r["field"], r["epoch"]): r["frac"]
        for r in pipe.drift(spark).collect()
    }
    assert alerts == {("coercion", "doc_id", 2): 1.0}


def test_genuine_json_nulls_are_not_coercion(spark, tmp_path):
    """A declared nullable field legitimately carrying JSON null
    ({"text": null}) parses to NULL exactly like a coercion-nulled one
    — the raw-side guard must keep it OUT of the coerced count, or a
    nullable field raises a perpetual false 'coercion' alert. A
    re-typed field in the same batch still counts."""
    pipe = SchemaDriftPipeline(str(tmp_path / "s"), DECLARED)
    lines = [
        f'{{"doc_id": {j}, "text": null, "source": "web"}}'
        for j in range(8)
    ] + [
        # doc_id genuinely re-typed -> real coercion rows
        f'{{"doc_id": "id-{j}", "text": "t{j}", "source": "web"}}'
        for j in range(2)
    ]
    pipe.write_batch(_lines(spark, lines), epoch_id=0)
    h = {
        r["field"]: (r["n_present"], r["n_coerced"])
        for r in pipe.history(spark).collect()
    }
    assert h["text"] == (10, 0)  # present (key exists), never coerced
    assert h["doc_id"] == (10, 2)  # only the re-typed rows count
    alerts = {
        (r["kind"], r["field"]) for r in pipe.drift(spark).collect()
    }
    assert ("coercion", "text") not in alerts
    assert ("coercion", "doc_id") in alerts


def test_streaming_wrapper_end_to_end(spark, tmp_path):
    import os

    from cassandra_iot_pipeline_spark.streaming.schema_drift import (
        streaming_schema_drift,
    )

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [_clean(j) for j in range(5)],
        [_clean(10 + j) for j in range(3)] + ['{"doc_id": 99, "lang": "en"}'],
    ]
    for i, lines in enumerate(batches):
        path = str(src / f"b{i}.txt")
        with open(path, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        os.utime(path, (1_700_000_000 + 10 * i,) * 2)
    q = streaming_schema_drift(
        spark,
        str(src),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
        DECLARED,
    )
    q.awaitTermination()
    pipe = SchemaDriftPipeline(str(tmp_path / "store"), DECLARED)
    got = {
        (r["epoch"], r["field"]): r["n_present"]
        for r in pipe.history(spark).collect()
    }
    assert got[(0, "doc_id")] == 5 and got[(1, "doc_id")] == 4
    assert got[(1, "lang")] == 1
    assert (1, "text") in got and got[(1, "text")] == 3
