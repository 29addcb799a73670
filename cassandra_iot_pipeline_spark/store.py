"""Delta+base parquet store layout — the shared persistence shape of
the engine's incremental stores (the near-dup dedup store in
streaming/dedup.py, the ANN index in functions/ann_store.py).

Layout of one store directory:

- ``epoch=N/``       delta written by batch N (overwrite = idempotent
                     under at-least-once replay)
- ``base_upto=K/``   at most one compacted base folding epochs <= K

Readers (:func:`read_store`) pick the highest complete base plus every
epoch ABOVE its ``upto`` — so stale bases, folded epochs, and epoch
dirs re-created by a post-compaction replay are all ignored, which is
what makes every compaction crash window readable with no double
counts. Compaction (:func:`compact_store`) writes the new base to a
hidden ``.compacting`` dir (invisible to Spark's file listing), commits
with a single rename, and only then deletes the folded inputs.
:func:`compact_epochs` is the incremental sibling — it folds only the
delta TAIL into one epoch dir, leaving the base byte-untouched (O(tail)
work instead of O(store); for the associative fold families only).

All filesystem operations go through the Hadoop FileSystem API, so the
stores work on any Hadoop filesystem (file://, hdfs://, s3a://) —
an os.path listing would silently misreport on remote stores. NOTE:
the rename commit is atomic on local/HDFS; on S3 rename is
copy+delete — quiesce writers for the compaction there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path class) for ``path`` via the Hadoop FS API."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm.org.apache.hadoop.fs.Path


def list_children(spark: SparkSession, path: str) -> list[str]:
    fs, Path = hadoop_fs(spark, path)
    if not fs.exists(Path(path)):
        return []
    return [st.getPath().getName() for st in fs.listStatus(Path(path))]


def store_parts(
    spark: SparkSession, path: str, _recover: bool = True
) -> tuple[str | None, int, list[tuple[int, str]]]:
    """(base_path, base_upto, [(epoch, path) for epochs > upto]) — the
    reader's view of a delta+base store directory.

    If an interrupted :func:`compact_epochs` left a COMPLETE staged
    tail fold behind (``.tailfold=M.compacting`` with ``_SUCCESS``),
    the listing first finishes its commit — without this, a crash
    between the commit's epoch deletes and its rename would leave
    every reader silently undercounting until the next maintenance
    pass. Incomplete stages are left alone here: they are invisible
    to readers anyway, and a concurrent writer may still be producing
    one (only :func:`compact_epochs` itself discards those)."""
    names = list_children(spark, path)
    if _recover and any(
        n.startswith(".tailfold=") and n.endswith(".compacting")
        for n in names
    ):
        if recover_tail_fold(spark, path, discard_incomplete=False) is not None:
            names = list_children(spark, path)

    def _num(name: str, prefix: str) -> int | None:
        # Only pure-integer suffixes are parts: stray siblings (swap
        # leftovers, editor droppings) must be skipped, not crash the
        # listing.
        suffix = name[len(prefix):]
        return int(suffix) if suffix.isdigit() else None

    bases = sorted(
        n
        for n in (
            _num(name, "base_upto=")
            for name in names
            if name.startswith("base_upto=")
        )
        if n is not None
    )
    upto = bases[-1] if bases else -1
    base_path = f"{path}/base_upto={upto}" if bases else None
    epochs = sorted(
        (e, f"{path}/{name}")
        for e, name in (
            (_num(name, "epoch="), name)
            for name in names
            if name.startswith("epoch=")
        )
        if e is not None
    )
    return base_path, upto, [(e, p) for e, p in epochs if e > upto]


def read_store(spark: SparkSession, path: str, empty: DataFrame) -> DataFrame:
    """Base + newer epochs, projected and CAST to ``empty``'s schema —
    the cast matters for columns the base carries as partition
    directories (partition inference types them int, while the declared
    schema may say bigint; without the cast a base-only read would leak
    the narrower type to callers)."""
    from pyspark.sql import functions as F

    cols = [
        F.col(f.name).cast(f.dataType).alias(f.name) for f in empty.schema
    ]
    base_path, _, epochs = store_parts(spark, path)
    parts = []
    if base_path is not None:
        parts.append(spark.read.parquet(base_path).select(*cols))
    if epochs:
        parts.append(spark.read.parquet(*[p for _, p in epochs]).select(*cols))
    if not parts:
        return empty
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def delete_children_upto(
    spark: SparkSession, path: str, prefix: str, upto: int
) -> None:
    """Delete every ``<prefix><n>`` child of ``path`` with n <= upto
    (non-integer suffixes are skipped — the store_parts rule: stray
    siblings must never crash maintenance)."""
    fs, Path = hadoop_fs(spark, path)
    for n in list_children(spark, path):
        if not n.startswith(prefix):
            continue
        suffix = n[len(prefix):]
        if suffix.isdigit() and int(suffix) <= upto:
            fs.delete(Path(f"{path}/{n}"), True)


#: schema of one ingest-watermark row (epoch, running max id)
INGEST_WATERMARK_SCHEMA = "epoch BIGINT, max_id BIGINT"


class IngestWatermark:
    """Per-epoch ``(epoch, max_id)`` side-store backing the monotone-id
    ingest guard shared by the incremental dedup pipelines (text:
    streaming/dedup.py, embedding: streaming/ann.py).

    Both pipelines' keep-first survivorship is id-ordered (cluster
    minimum survives), which is only correct when every NEW batch's ids
    exceed every previously ingested id. Replays of an already-recorded
    epoch legitimately violate that (the store already holds the
    batch's own delta), so the guard keys on the epoch number: a batch
    whose epoch is ABOVE the recorded watermark but whose min id is at
    or below the recorded max fails loudly instead of silently
    inverting survivorship.

    Layout: ``<dir>/epoch=N`` one-row parquet per recorded epoch,
    written AFTER the epoch's data (a crash in between replays the
    epoch, which the guard exempts); :meth:`prune` keeps only the
    latest row (compaction cadence)."""

    def __init__(self, wm_dir: str, id_name: str = "doc_id", what: str = "ingest"):
        self.wm_dir = wm_dir
        self.id_name = id_name
        self.what = what

    def read(self, spark: SparkSession) -> tuple[int, int] | None:
        """(latest epoch, its running max id) or None before the first
        recorded batch."""
        names = list_children(spark, self.wm_dir)
        epochs = sorted(
            int(n[len("epoch="):])
            for n in names
            if n.startswith("epoch=") and n[len("epoch="):].isdigit()
        )
        if not epochs:
            return None
        row = spark.read.parquet(f"{self.wm_dir}/epoch={epochs[-1]}").first()
        return (epochs[-1], row["max_id"])

    def guard(
        self, spark: SparkSession, epoch_id: int, batch_min: int
    ) -> tuple[int, int] | None:
        """Raise on a genuinely out-of-order NEW epoch; return the
        current watermark (for :meth:`record`). Replayed epochs
        (epoch_id at or under the recorded epoch) are exempt."""
        wm = self.read(spark)
        if wm is not None and epoch_id > wm[0] and batch_min <= wm[1]:
            raise ValueError(
                f"{self.what} out of order: epoch {epoch_id} carries "
                f"{self.id_name} {batch_min} <= {wm[1]}, the max already "
                f"ingested through epoch {wm[0]}. Keep-first survivorship "
                f"is id-ordered (cluster minimum survives), so an id below "
                "the watermark would silently lose to a LATER-ingested "
                "store row with a larger id. Stage files in ascending id "
                "ranges (mtime order), or re-number the ingest sequence."
            )
        return wm

    def record(
        self,
        spark: SparkSession,
        epoch_id: int,
        batch_max: int,
        wm: tuple[int, int] | None,
    ) -> None:
        """Persist the epoch's watermark row (call AFTER the epoch's
        data writes — the crash window then replays, which the guard
        exempts)."""
        max_id = batch_max if wm is None else max(batch_max, wm[1])
        spark.createDataFrame(
            [(int(epoch_id), int(max_id))], INGEST_WATERMARK_SCHEMA
        ).write.mode("overwrite").parquet(f"{self.wm_dir}/epoch={epoch_id}")

    def prune(self, spark: SparkSession) -> None:
        """Drop all but the latest epoch row — only the running max
        matters; history is replay bookkeeping."""
        epochs = sorted(
            int(n.split("=", 1)[1])
            for n in list_children(spark, self.wm_dir)
            if n.startswith("epoch=")
        )
        if len(epochs) > 1:
            delete_children_upto(spark, self.wm_dir, "epoch=", epochs[-1] - 1)


def compact_store(
    spark: SparkSession,
    path: str,
    empty: DataFrame,
    fold: Callable[[DataFrame], DataFrame] | None = None,
    partition_by: str | None = None,
    n_files: int = 8,
) -> int | None:
    """Fold the store's base + epoch deltas into a fresh
    ``base_upto=N``; returns the new upto, or None when there was
    nothing to fold (replay leftovers at or under the current upto are
    still cleared). ``fold`` transforms the unioned frame before the
    write (e.g. re-aggregate summary rows); ``partition_by`` lays the
    base out as partition directories (readers recover the column from
    the dir names; probes get partition pruning)."""
    base_path, upto, epochs = store_parts(spark, path)
    if not epochs:
        if base_path is not None:
            delete_children_upto(spark, path, "epoch=", upto)
        return None
    new_upto = max(upto, epochs[-1][0])
    df = read_store(spark, path, empty)
    if fold is not None:
        df = fold(df)
    fs, Path = hadoop_fs(spark, path)
    tmp = f"{path}/.compacting"
    fs.delete(Path(tmp), True)  # crash leftover
    if partition_by is not None:
        (
            df.repartition(partition_by)
            .write.mode("overwrite")
            .partitionBy(partition_by)
            .parquet(tmp)
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    dest = Path(f"{path}/base_upto={new_upto}")
    fs.delete(dest, True)  # crash leftover with the same upto
    fs.rename(Path(tmp), dest)
    # committed — now drop the folded inputs
    if base_path is not None:
        fs.delete(Path(base_path), True)
    delete_children_upto(spark, path, "epoch=", new_upto)
    return new_upto


# --- tail compaction ---------------------------------------------------------


def _tail_tmp_name(m: int) -> str:
    return f".tailfold={m}.compacting"


def recover_tail_fold(
    spark: SparkSession, path: str, discard_incomplete: bool = True
) -> int | None:
    """Finish (or discard) an interrupted :func:`compact_epochs`.
    A COMPLETE staged fold (Spark's _SUCCESS marker present) contains
    every folded epoch's content, so recovery re-runs the commit —
    delete the folded epoch dirs, rename the stage in; an incomplete
    stage is discarded (the original epoch dirs are untouched until
    the commit starts, so nothing is lost either way). Returns the
    committed fold's epoch label, or None.

    ``discard_incomplete=False`` is the READ-path mode
    (:func:`store_parts` calls it on sight of a staged fold): it
    commits complete stages but leaves incomplete ones untouched,
    because a reader cannot distinguish a crashed partial stage from
    a live writer's in-progress one — deleting the latter would race
    the writer's own commit."""
    fs, Path = hadoop_fs(spark, path)
    for name in list_children(spark, path):
        if not (name.startswith(".tailfold=") and name.endswith(".compacting")):
            continue
        m = int(name[len(".tailfold=") : -len(".compacting")])
        tmp = f"{path}/{name}"
        if fs.exists(Path(f"{tmp}/_SUCCESS")):
            _, upto, epochs = store_parts(spark, path, _recover=False)
            for e, p in epochs:
                if e <= m:
                    fs.delete(Path(p), True)
            fs.rename(Path(tmp), Path(f"{path}/epoch={m}"))
            return m
        if discard_incomplete:
            fs.delete(Path(tmp), True)
    return None


def compact_epochs(
    spark: SparkSession,
    path: str,
    empty: DataFrame,
    fold: Callable[[DataFrame], DataFrame] | None = None,
    keep_recent: int = 0,
    n_files: int = 4,
) -> int | None:
    """Fold the store's epoch DELTAS (all but the ``keep_recent`` most
    recent) into one ``epoch=M`` dir, leaving the base byte-untouched
    — the incremental sibling of :func:`compact_store`, whose full
    rewrite is O(store) every time. At 100 TB the accumulated base
    dwarfs the delta tail; tail compaction bounds the read-side part
    count at O(1) deltas for O(tail) work per pass, and the occasional
    full :func:`compact_store` remains the deep-clean.

    ONLY for stores whose reads are order-free folds of the whole
    visible part set (the associative fold families: distinct, sum
    re-group, HLL union, MG trim, top-k) — relabeling epochs under the
    max folded number M is invisible to such readers (pinned in
    tests). Stores whose WRITE path reads "strictly older epoch dirs"
    by directory number (the SCD2 pipeline's ``_raw_before``) must NOT
    tail-fold mid-stream: relabeling changes what a replayed old epoch
    would see. Crash-recoverable via :func:`recover_tail_fold` (the
    staged dir carries every folded epoch's content; the commit is
    re-runnable). Returns M, or None when fewer than two epochs are
    foldable."""
    if keep_recent < 0:
        raise ValueError(f"keep_recent must be >= 0, got {keep_recent}")
    recover_tail_fold(spark, path)
    _, upto, epochs = store_parts(spark, path)
    # max(0, ...): keep_recent > len(epochs) must protect EVERY epoch
    # (a negative slice bound would silently fold the oldest ones,
    # defeating keep_recent's replay-protection purpose)
    foldable = epochs[: max(0, len(epochs) - keep_recent)]
    if len(foldable) < 2:
        return None
    m = foldable[-1][0]
    from pyspark.sql import functions as F

    cols = [
        F.col(f.name).cast(f.dataType).alias(f.name) for f in empty.schema
    ]
    df = spark.read.parquet(*[p for _, p in foldable]).select(*cols)
    if fold is not None:
        df = fold(df)
    fs, Path = hadoop_fs(spark, path)
    tmp = f"{path}/{_tail_tmp_name(m)}"
    fs.delete(Path(tmp), True)
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    # commit (re-runnable: recover_tail_fold performs this same walk)
    for e, p in foldable:
        fs.delete(Path(p), True)
    fs.rename(Path(tmp), Path(f"{path}/epoch={m}"))
    return m


# --- store doctor ------------------------------------------------------------


def store_stats(
    spark: SparkSession, path: str, count_rows: bool = False
) -> dict:
    """Operational report over one delta+base store directory — the
    maintenance view every store family shares (what a 100 TB operator
    asks before scheduling compaction):

    - ``base_upto`` / ``epochs``: the reader's visible part set;
    - ``files`` / ``bytes`` per part (Hadoop FS content summaries —
      works on file://, hdfs://, s3a://);
    - ``rows`` per part when ``count_rows=True`` (ONE Spark job over
      the visible parts, attributed by file path);
    - hygiene: ``shadowed_epochs`` (at or under the base's upto —
      replay leftovers, safe to delete), ``stale_bases`` (below the
      max upto), ``swap_leftovers`` (hidden staging dirs from an
      interrupted swap/tail-fold — run the matching recovery),
      ``stray`` (children that are neither parts nor hidden staging);
    - a one-line ``recommendation``.
    """
    fs, Path = hadoop_fs(spark, path)
    # store_parts first: it may commit a completed tail fold, which
    # the subsequent listing must reflect (not report as a leftover)
    base_path, upto, epochs = store_parts(spark, path)
    names = list_children(spark, path)

    def _num(name: str, prefix: str) -> int | None:
        suffix = name[len(prefix):]
        return int(suffix) if suffix.isdigit() else None

    shadowed = sorted(
        n
        for n in names
        if n.startswith("epoch=")
        and _num(n, "epoch=") is not None
        and _num(n, "epoch=") <= upto
    )
    stale_bases = sorted(
        n
        for n in names
        if n.startswith("base_upto=")
        and _num(n, "base_upto=") is not None
        and f"{path}/{n}" != base_path
    )
    swap_leftovers = sorted(
        n
        for n in names
        if n.startswith(".")
        and n.endswith((".compacting", ".old"))
    )
    stray = sorted(
        n
        for n in names
        if not n.startswith(".")
        and not (
            (n.startswith("epoch=") and _num(n, "epoch=") is not None)
            or (
                n.startswith("base_upto=")
                and _num(n, "base_upto=") is not None
            )
        )
    )
    visible = {}
    if base_path is not None:
        visible[base_path.rsplit("/", 1)[-1]] = base_path
    visible.update({p.rsplit("/", 1)[-1]: p for _, p in epochs})
    files, nbytes = {}, {}
    for name, p in visible.items():
        summary = fs.getContentSummary(Path(p))
        files[name] = int(summary.getFileCount())
        nbytes[name] = int(summary.getLength())
    rows: dict[str, int] | None = None
    if count_rows and visible:
        from pyspark.sql import functions as F

        per_file = (
            spark.read.parquet(*visible.values())
            .groupBy(F.input_file_name().alias("f"))
            .count()
            .collect()
        )
        rows = {name: 0 for name in visible}
        for r in per_file:
            for name, p in visible.items():
                if r["f"].startswith(f"file:{p}/") or f"/{name}/" in r["f"]:
                    rows[name] += int(r["count"])
                    break
    n_epochs = len(epochs)
    if swap_leftovers:
        rec = "recover first: interrupted swap/tail-fold staging present"
    elif n_epochs >= 16:
        rec = (
            "compact_store (deep clean) or compact_epochs (tail fold): "
            f"{n_epochs} epoch deltas widen every read"
        )
    elif n_epochs >= 4:
        rec = "compact_epochs: fold the delta tail (base stays untouched)"
    elif shadowed or stale_bases:
        rec = "delete shadowed/stale parts (replay leftovers)"
    else:
        rec = "healthy: no maintenance needed"
    return {
        "base_upto": upto if base_path is not None else None,
        "epochs": [e for e, _ in epochs],
        "files": files,
        "bytes": nbytes,
        "rows": rows,
        "shadowed_epochs": shadowed,
        "stale_bases": stale_bases,
        "swap_leftovers": swap_leftovers,
        "stray": stray,
        "recommendation": rec,
    }
