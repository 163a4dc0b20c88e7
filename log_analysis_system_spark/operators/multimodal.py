"""Multimodal column plumbing — training-data pipeline extension.

Images/audio/video travel as opaque ``binary`` columns with typed metadata
structs. The Spark-side machinery (schema, partition sizing, Arrow batch
shape, mapInPandas signatures) is real and tested; the codec step itself is
stubbed because decode libraries (PIL/librosa/av) are not in this container —
each stub either raises ``NotImplementedError`` (real codec path) or computes
a deterministic fake feature (test path) so the pipeline shape is verifiable.

Scale design: decode runs via ``mapInPandas`` so each Arrow batch holds a
bounded number of blobs (``spark.sql.execution.arrow.maxRecordsPerBatch``
should be lowered for large blobs); partition sizing by bytes, not rows, via
``spark.sql.files.maxPartitionBytes`` on the read side.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

#: Canonical multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("first_byte", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires an imaging library not present in this
    container. The Spark plumbing around it is fully wired; plug PIL/OpenCV
    here in a real deployment."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use fake_feature_batch for pipeline testing"
    )


def fake_feature_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Deterministic stand-in for decode+feature-extract: byte length, first
    byte, and a 4-dim 'feature' derived from byte statistics. Runs per Arrow
    batch — the exact shape a real decoder would use."""
    import pandas as pd

    payloads = pdf["payload"]
    byte_len = payloads.map(len)
    first = payloads.map(lambda b: int(b[0]) if len(b) else -1)
    feature = payloads.map(
        lambda b: [
            float(len(b)),
            float(b[0]) if len(b) else 0.0,
            float(b[-1]) if len(b) else 0.0,
            float(sum(b[:16]) % 256),
        ]
    )
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "byte_len": byte_len,
            "first_byte": first,
            "feature": feature,
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. Arrow-batched:
    Python sees pandas DataFrames of whole batches, never row-at-a-time."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield fake_feature_batch(pdf)

    return media.select("media_id", "payload").mapInPandas(gen, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads so the multimodal
    pipeline is exercisable against driver testdata (no image files exist)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        F.length("text").cast("long").alias("meta_width"),
        F.lit(1).cast("long").alias("meta_height"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing via mapInPandas. A real deployment decodes and
    resamples inside the batch function (PIL/OpenCV — not in this container);
    the deterministic stand-in crops/zero-pads the payload to width*height
    bytes so batch shape, schema, and metadata propagation are testable."""

    target = width * height

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: bytes(b[:target]).ljust(target, b"\x00")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "meta_width": width,
                    "meta_height": height,
                }
            )

    return media.select("media_id", "payload").mapInPandas(gen, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, frame_size: int, stride: int) -> DataFrame:
    """Frame sampling: one output row per frame at offsets 0, stride, 2*stride
    … while offset < byte length (video frame-sample plumbing; the stand-in
    'frame' is the payload byte slice a real demuxer would decode).

    Fan-out happens inside the Arrow batch (pure pandas, no Python loop over
    Spark rows); at scale the input should be repartitioned by bytes so one
    task never holds too many decoded frames."""

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(b)
                for k, off in enumerate(range(0, max(len(b), 1), stride)):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(b[off : off + frame_size])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return media.select("media_id", "payload").mapInPandas(gen, FRAME_SCHEMA)
