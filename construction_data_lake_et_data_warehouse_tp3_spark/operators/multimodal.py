"""Multimodal column plumbing (beyond-reference, SURVEY §7 M7).

Images/audio/video ride as opaque `binary` columns with typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas iterators over `mapInPandas` — the only operators in the engine
where Python in the dataflow is justified (per-byte media work has no
JVM builtin).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are stubbed: `decode_image_stub` raises NotImplementedError
when `strict`, else emits deterministic fake features. Everything
Spark-side — schema, batch iteration, partitioning, output contract — is
real and tested; swapping the stub for a real codec changes one inner
function.

Scale notes: mapInPandas streams Arrow batches (spark.sql.execution.arrow.
maxRecordsPerBatch bounds memory); media blobs never pass through the
driver; repartition(n) before the map spreads decode cost evenly — the
classic fix for skewed media sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media row contract: content + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (binary payload = repeated md5 bytes)
    for exercising the plumbing without codec libs."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("kind"),
            F.unhex(F.md5(F.col("id").cast("string"))).alias("content"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(1000).alias("duration_ms"),
        )
    )


def decode_image_stub(content: bytes, strict: bool = False) -> list[float]:
    """STUB decode kernel. Real deployment: PIL.Image.open + resize +
    normalize. Container has no codec libs, so `strict=True` raises and
    the default path emits a deterministic 8-dim byte-histogram feature
    (real Spark plumbing, fake pixels)."""
    if strict:
        raise NotImplementedError(
            "image decode requires PIL/ffmpeg — not available in this container"
        )
    histogram = [0.0] * 8
    for byte in content or b"":
        histogram[byte % 8] += 1.0
    total = sum(histogram) or 1.0
    return [v / total for v in histogram]


def extract_features(media: DataFrame, batch_partitions: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over media rows (Arrow-batched)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            features = [decode_image_stub(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "feature": features,
                }
            )

    if batch_partitions:
        media = media.repartition(batch_partitions)
    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling *plan*: explode the timeline into frame
    offsets JVM-side (sequence/explode), leaving only per-frame decode to
    the pandas kernel. Keeps the fan-out in Catalyst where it's free."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            "content",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )
