"""Multimodal column handling: image/audio/video as opaque binary.

Design: media payloads ride through the engine as a ``binary`` column
plus typed metadata columns — the same pattern the reference uses for
Avro-framed Kafka values (opaque bytes + schema-known fields). The
Spark-side plumbing is real and tested: schema contracts, partition-safe
Pandas-UDF batch shapes, frame-sampling fan-out. The *codec* step is a
stub (the runtime image ships no image/audio libraries): decode raises
``NotImplementedError`` unless the deterministic fake decoder is
requested, which derives metadata from the payload bytes so tests and
oracles stay exact.

Scale: mapInPandas streams Arrow batches per partition — payload bytes
never serialize through Python row-at-a-time, and nothing collects to
the driver. Frame sampling fans out rows inside the executor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"IMG0"
FRAME_SIZE = 256  # bytes per synthetic "frame"


def attach_binary_payload(documents: DataFrame) -> DataFrame:
    """Fixture adapter: synthesize a deterministic binary payload per
    document (magic header + utf-8 bytes) standing in for a real media
    blob column. In production this column arrives from the source."""
    return documents.select(
        "doc_id",
        (
            F.concat(F.lit(MAGIC), F.encode(F.col("text"), "utf-8"))
        ).alias("payload"),
    )


def media_metadata(documents: DataFrame) -> DataFrame:
    """Typed metadata over the opaque payload — pure Catalyst binary
    expressions (length, magic sniff, frame count), no Python."""
    with_payload = attach_binary_payload(documents)
    n_bytes = F.length(F.col("payload")).cast("long")
    return with_payload.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.decode(F.col("payload").substr(1, 4), "utf-8").alias("magic"),
        F.ceil((n_bytes - 4).cast("double") / FRAME_SIZE).cast("long").alias("n_frames"),
    )


def media_metadata_oracle() -> str:
    return f"""
        SELECT doc_id,
               CAST(4 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
               'IMG0' AS magic,
               CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / {FRAME_SIZE})
                   AS BIGINT) AS n_frames
        FROM documents
    """


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
    ]
)


def decode_media(documents: DataFrame, use_fake_codec: bool = True) -> DataFrame:
    """Decode step behind the codec boundary.

    ``use_fake_codec=True`` (tests): deterministic metadata derived from
    payload bytes. ``False`` selects the real-codec branch — a
    PERMANENT ADAPTER SEAM, not a to-do: this runtime ships no
    image/audio libraries, so the branch raises NotImplementedError with
    swap-in instructions. A deployment replaces exactly that branch with
    its codec call (e.g. PIL.Image.open over the payload bytes); every
    Spark-side concern — schema contract, Arrow batch shape,
    partitioning, memory profile — is identical on both branches and is
    what the tests pin.
    """
    payloads = attach_binary_payload(documents)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake_codec:
                raise NotImplementedError(
                    "real media codec not available in this runtime; "
                    "install a codec and replace this branch"
                )
            body_len = pdf["payload"].map(len) - len(MAGIC)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (body_len % 640 + 1).astype("int32"),
                    "height": (body_len % 480 + 1).astype("int32"),
                    "mode": "RGB",
                }
            )

    return payloads.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def media_decode(documents: DataFrame, use_fake_codec: bool = True) -> DataFrame:
    """`media_metadata` + `decode_media` in one driver-checkable plan:
    typed metadata (pure Catalyst binary expressions) joined to the
    decoded dimensions (Arrow-batched mapInPandas behind the codec
    boundary) on doc_id. The join shuffles only the tiny decoded tuples,
    never the payload bytes."""
    return media_metadata(documents).join(
        decode_media(documents, use_fake_codec), "doc_id"
    )


def media_decode_oracle() -> str:
    return f"""
        SELECT doc_id,
               CAST(4 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
               'IMG0' AS magic,
               CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / {FRAME_SIZE})
                   AS BIGINT) AS n_frames,
               CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
               CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
               'RGB' AS mode
        FROM documents
    """


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(documents: DataFrame, stride: int = 2) -> DataFrame:
    """Frame-sampling fan-out: split each payload into FRAME_SIZE-byte
    frames and keep every ``stride``-th — the video-keyframe plumbing
    shape (one input row -> many output rows, inside the executor)."""
    payloads = attach_binary_payload(documents)

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                body = bytes(payload)[len(MAGIC):]
                frames = [
                    body[i : i + FRAME_SIZE]
                    for i in range(0, len(body), FRAME_SIZE)
                ]
                for idx in range(0, len(frames), stride):
                    out_ids.append(doc_id)
                    out_idx.append(idx)
                    out_frames.append(frames[idx])
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return payloads.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


def frame_stats(documents: DataFrame, stride: int = 2) -> DataFrame:
    """Aggregate over the sampled frames (count + bytes per doc) — the
    oracle-checkable face of the frame-sampling plumbing.

    An empty document produces no frames; the left join back to the
    document list keeps it in the output with n_sampled = 0, matching
    the oracle (which emits a row per document unconditionally)."""
    frames = sample_frames(documents, stride)
    per_doc = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames_sampled"),
        F.sum(F.length(F.col("frame")).cast("long")).alias("frame_bytes"),
    )
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_frames_sampled"), F.lit(0)).alias("n_sampled"),
            F.coalesce(F.col("frame_bytes"), F.lit(0)).alias("sampled_bytes"),
        )
        .orderBy("doc_id")
    )


def frame_stats_oracle(stride: int = 2) -> str:
    # mirrored math: n_frames = ceil(len/256); sampled = ceil(n_frames/stride);
    # bytes = full frames except a possibly-short last frame when sampled.
    return f"""
        WITH sizes AS (
            SELECT doc_id,
                   octet_length(encode(text)) AS body,
                   CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE)
                        / {FRAME_SIZE}) AS BIGINT) AS n_frames
            FROM documents
        )
        SELECT doc_id,
               CAST(ceil(CAST(n_frames AS DOUBLE) / {stride}) AS BIGINT) AS n_sampled,
               CAST(
                 CASE WHEN (n_frames - 1) % {stride} = 0
                      THEN (ceil(CAST(n_frames AS DOUBLE) / {stride}) - 1) * {FRAME_SIZE}
                           + (body - (n_frames - 1) * {FRAME_SIZE})
                      ELSE ceil(CAST(n_frames AS DOUBLE) / {stride}) * {FRAME_SIZE}
                 END AS BIGINT) AS sampled_bytes
        FROM sizes
        ORDER BY doc_id
    """


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumbnail", T.BinaryType()),
    ]
)


def resize_media(
    documents: DataFrame, target_w: int = 64, target_h: int = 48
) -> DataFrame:
    """Resize step behind the codec boundary: emits a fixed-size
    "thumbnail" (deterministic byte sampling of the payload standing in
    for real pixel resampling — the Arrow batch shape, output schema,
    and executor-side memory profile are what production swaps in a real
    codec for)."""
    payloads = attach_binary_payload(documents)
    n_bytes = target_w * target_h // 8

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for payload in pdf["payload"]:
                body = bytes(payload)[len(MAGIC):]
                stride = max(1, len(body) // n_bytes)
                thumbs.append(body[::stride][:n_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "thumbnail": thumbs,
                }
            )

    return payloads.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(documents: DataFrame, n_bins: int = 8) -> DataFrame:
    """Feature extraction: an n_bins byte-histogram per payload,
    L1-normalized — the embedding-producing step of a media pipeline
    (deterministic, numpy-vectorized; production swaps in a model).
    Output feeds the similarity operators directly."""
    import numpy as np

    payloads = attach_binary_payload(documents)

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                body = np.frombuffer(bytes(payload)[len(MAGIC):], dtype=np.uint8)
                hist = np.bincount(body >> (8 - n_bins.bit_length() + 1), minlength=n_bins)[:n_bins]
                total = hist.sum()
                feats.append((hist / total).tolist() if total else [0.0] * n_bins)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return payloads.mapInPandas(feat_batches, schema=FEATURES_SCHEMA)
