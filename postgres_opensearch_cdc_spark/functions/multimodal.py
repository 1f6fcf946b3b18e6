"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
functions over mapInPandas (SURVEY north-star extensions; absent from
the reference).

The Spark-side plumbing — schemas, batch iteration, partition-parallel
UDF execution, output shapes — is real and tested. The actual codec
work (JPEG decode, audio resample, video frame extraction) requires
libraries not present in this container; each codec call routes through
``_decode_bytes``, which uses a DETERMINISTIC FAKE decoder by default
and raises NotImplementedError when a real codec is requested. Swapping
in PIL/ffmpeg is a one-function change; nothing in the distributed
plumbing moves.

Scale design: media payloads never shuffle — all transforms are
mapInPandas (narrow, partition-local); metadata-only operations project
away the binary column before any wide operation. Feature vectors
(small arrays) are the only thing that flows into joins/aggregations.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def _decode_bytes(content: bytes, kind: str, real_codec: bool = False):
    """Codec boundary. real_codec=True is the production hook (PIL /
    soundfile / pyav) — unavailable in this container by design.

    The deterministic fake maps bytes → a stable FEATURE_DIM float
    vector (byte-histogram moments), so tests of the distributed
    plumbing have exact expected values.
    """
    if real_codec:
        raise NotImplementedError(
            "real media codecs (PIL/ffmpeg) are not available in this "
            "environment; deterministic fake decoder is the test path"
        )
    if content is None:
        return None
    buckets = [0] * FEATURE_DIM
    for i, byte in enumerate(content):
        buckets[byte % FEATURE_DIM] += 1
    n = max(len(content), 1)
    # truncate (integer // then scale), never round(): truncation of an
    # integer ratio is bit-identical across Python / Spark / DuckDB,
    # while round() is banker's here and half-away-from-zero there —
    # this keeps the fake decoder's outputs ORACLE-REPRODUCIBLE
    return [(b * 1_000_000 // n) / 1_000_000 for b in buckets]


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """binary → feature vector via mapInPandas: Arrow-batched, partition
    -local, binary column consumed and dropped so downstream plans carry
    only (id, kind, n_bytes, features)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                _decode_bytes(c, k) for c, k in zip(pdf["content"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: same mapInPandas shape, fake 'resize'
    truncates/pads bytes deterministically (real path: PIL thumbnail).
    Output schema == input schema with updated meta dims."""
    import pandas as pd

    target = width * height

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf.copy()
            out["content"] = [
                (c[:target] + bytes(max(0, target - len(c)))) if c is not None else None
                for c in pdf["content"]
            ]
            out["meta"] = [
                {**(m or {}), "width": width, "height": height} for m in pdf["meta"]
            ]
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(run, media.schema)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling plumbing: one input row → N frame rows
    (fan-out inside mapInPandas; real path: pyav keyframe iteration).
    Fake frames are fixed-stride byte windows — deterministic."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                for i in range(min(max_frames, max(1, len(content) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(content[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(run, FRAME_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents fixture
    (text bytes as payload) — the test substrate while no binary fixture
    exists in the driver testdata."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )
