"""Store lifecycle of the streaming near-dup pipeline
(streaming/dedup.py): compaction, the band-partitioned base layout,
bucket-stats maintenance, and the monotone-id watermark guard.

The contracts:

1. a long replay with a compaction cadence keeps store file counts
   bounded (base + a bounded tail of deltas, not one dir per epoch) —
   including the CURATED OUTPUT, which folds through the same
   delta+base lifecycle as the index stores;
2. compaction never changes what readers see — the curated corpus and
   the folded store contents are identical before/after;
3. the compacted band base is band-partitioned, so a band filter
   prunes at the partition level (the layout the probe needs to prune
   at high band counts);
4. a NEW epoch whose ids fall at or below the ingest watermark fails
   loudly (silent keep-first inversion is the bug class); replayed
   epochs stay exempt;
5. an epoch replay landing after its epoch was folded into the base
   does not double-count.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from cassandra_iot_pipeline_spark.streaming.dedup import NearDedupPipeline

TEXTS = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "lambda mu nu xi omicron pi rho sigma tau upsilon",
    "phi chi psi omega one two three four five six",
    "seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen",
]


def _batch(spark, lo: int, hi: int):
    rows = [
        (i, TEXTS[i % len(TEXTS)] + f" tail{i}", "en", "web", 50)
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )


def _store_dirs(base: str, kind: str) -> list[str]:
    return sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(base, kind, "*"))
    )


def test_compaction_bounds_files_and_preserves_reads(spark, tmp_path):
    """12 epochs with compact_every=4: at most one base + <4 epoch
    deltas per store at any point, and the curated corpus equals an
    uncompacted pipeline's on the same batches."""
    plain = NearDedupPipeline(str(tmp_path / "plain"), threshold=0.8)
    compacted = NearDedupPipeline(
        str(tmp_path / "compacted"), threshold=0.8, compact_every=4
    )
    for e in range(12):
        b = _batch(spark, e * 10, (e + 1) * 10)
        plain.write_batch(b, epoch_id=e)
        compacted.write_batch(b, epoch_id=e)
    for kind in ("bands", "shingles", "bucket_stats", "curated"):
        dirs = _store_dirs(str(tmp_path / "compacted"), kind)
        bases = [d for d in dirs if d.startswith("base_upto=")]
        epochs = [d for d in dirs if d.startswith("epoch=")]
        assert bases == ["base_upto=11"], (kind, dirs)
        assert len(epochs) == 0, (kind, dirs)
        plain_epochs = _store_dirs(str(tmp_path / "plain"), kind)
        assert len(plain_epochs) == 12  # what compaction saves us from
    got = sorted(r.doc_id for r in compacted.curated(spark).collect())
    expect = sorted(r.doc_id for r in plain.curated(spark).collect())
    assert got == expect and len(got) > 0
    # watermark history pruned to the latest epoch
    assert _store_dirs(str(tmp_path / "compacted"), "watermark") == ["epoch=11"]


def test_compaction_preserves_store_contents_and_probe_results(spark, tmp_path):
    """Folding is read-identity: band rows, shingle rows, and folded
    bucket stats are equal before and after compact(), and the next
    batch admits the same survivors either way."""
    a = NearDedupPipeline(str(tmp_path / "a"), threshold=0.8)
    b = NearDedupPipeline(str(tmp_path / "b"), threshold=0.8)
    for e in range(4):
        batch = _batch(spark, e * 10, (e + 1) * 10)
        a.write_batch(batch, epoch_id=e)
        b.write_batch(batch, epoch_id=e)
    b.compact(spark)

    def snap(pipe):
        bands = sorted(
            map(tuple, pipe._read_or_empty(spark, pipe.bands_dir, "bands").collect())
        )
        sh = sorted(
            (r["doc_id"], tuple(sorted(r["sh"])))
            for r in pipe._read_or_empty(
                spark, pipe.shingles_dir, "shingles"
            ).collect()
        )
        stats = sorted(map(tuple, pipe.bucket_stats(spark).collect()))
        return bands, sh, stats

    assert snap(a) == snap(b)
    # duplicate of doc 2's text: dropped by both pipelines
    nxt = spark.createDataFrame(
        [(1000, TEXTS[2 % len(TEXTS)] + " tail2", "en", "web", 50)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    a.write_batch(nxt, epoch_id=4)
    b.write_batch(nxt, epoch_id=4)
    got_a = {r.doc_id for r in a.curated(spark).collect()}
    got_b = {r.doc_id for r in b.curated(spark).collect()}
    assert got_a == got_b
    assert 1000 not in got_a  # near-dup of doc 2, suppressed by the store


def test_compacted_band_base_prunes_on_band(spark, tmp_path):
    """The compacted base is partitionBy(band): a band-equality filter
    lands in the scan's PartitionFilters and reads only that partition
    directory — the pruning a high-band-count probe relies on."""
    pipe = NearDedupPipeline(str(tmp_path / "s"), threshold=0.8)
    for e in range(3):
        pipe.write_batch(_batch(spark, e * 10, (e + 1) * 10), epoch_id=e)
    pipe.compact(spark)
    base = glob.glob(str(tmp_path / "s" / "bands" / "base_upto=*"))[0]
    assert sorted(os.path.basename(p) for p in glob.glob(base + "/band=*")) == [
        f"band={i}" for i in range(8)
    ]
    scan = spark.read.parquet(base).filter(F.col("band") == 3)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "band" in plan
    assert scan.count() > 0
    assert {r["band"] for r in scan.select("band").distinct().collect()} == {3}


def test_out_of_order_epoch_fails_loudly(spark, tmp_path):
    """A NEW epoch carrying ids at or below the watermark raises with a
    diagnosable message instead of silently inverting keep-first."""
    pipe = NearDedupPipeline(str(tmp_path / "w"), threshold=0.8)
    pipe.write_batch(_batch(spark, 0, 10), epoch_id=0)
    pipe.write_batch(_batch(spark, 10, 20), epoch_id=1)
    with pytest.raises(ValueError, match="out of order.*epoch 2"):
        pipe.write_batch(_batch(spark, 5, 8), epoch_id=2)
    # replaying epoch 1 (same ids, same epoch) stays exempt
    pipe.write_batch(_batch(spark, 10, 20), epoch_id=1)


def test_replay_after_compaction_does_not_double_count(spark, tmp_path):
    """Crash-replay of an epoch that compaction already folded: the
    re-created epoch dir is ignored by readers (epoch <= base upto),
    curated output is unchanged, and the next compact() clears the
    leftover."""
    pipe = NearDedupPipeline(str(tmp_path / "r"), threshold=0.8)
    for e in range(3):
        pipe.write_batch(_batch(spark, e * 10, (e + 1) * 10), epoch_id=e)
    pipe.compact(spark)
    before = sorted(r.doc_id for r in pipe.curated(spark).collect())
    bands_before = sorted(
        map(tuple, pipe._read_or_empty(spark, pipe.bands_dir, "bands").collect())
    )
    pipe.write_batch(_batch(spark, 20, 30), epoch_id=2)  # replay of epoch 2
    assert sorted(r.doc_id for r in pipe.curated(spark).collect()) == before
    assert (
        sorted(
            map(
                tuple,
                pipe._read_or_empty(spark, pipe.bands_dir, "bands").collect(),
            )
        )
        == bands_before
    )
    pipe.compact(spark)
    assert not glob.glob(str(tmp_path / "r" / "bands" / "epoch=*"))
