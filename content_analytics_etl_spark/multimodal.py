"""Multimodal columns (BASELINE extension): image/audio/video as opaque
``binary`` payloads with typed metadata, processed via Arrow-batched
``mapInPandas``.

The Spark-side plumbing is real and tested — schema, partition-parallel
batch iteration, UDF signatures, feature output shape. The actual codec
step is stubbed: this container has no image/audio libraries, so
``decode_payload`` raises ``NotImplementedError`` unless a decoder
library is importable, and the default feature extractor is a
deterministic byte-level fake standing in for "decode → embed". On a
real deployment only ``_decode_*`` changes; every plan shape stays.

At 100 TB: payloads stay in parquet binary columns (never strings),
feature extraction is ``mapInPandas`` over whatever partitioning the
scan produces (no shuffle), and metadata predicates (kind, width,
duration) push down to the parquet scan before any payload is touched.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "ASSET_SCHEMA",
    "FEATURE_DIM",
    "synthetic_assets",
    "decode_payload",
    "extract_features",
]

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8
KINDS = ("image", "audio", "video")


def synthetic_assets(documents: DataFrame) -> DataFrame:
    """Deterministic multimodal asset table derived from ``documents``:
    payload = utf-8 bytes of the text (a stand-in blob), kind cycles by
    doc_id, metadata derived arithmetically — all reproducible in SQL,
    so metadata queries stay oracle-checkable."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
            (F.lit(16000)).cast("int").alias("sample_rate"),
            (F.col("n_chars") / 100.0).alias("duration_s"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, kind: str):
    """Real codec hook — intentionally stubbed in this environment."""
    try:  # pragma: no cover - decoder libs absent in this container
        if kind == "image":
            import PIL.Image  # noqa: F401
        elif kind == "audio":
            import soundfile  # noqa: F401
        else:
            import av  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            f"no decoder available for kind={kind!r} in this environment; "
            "the Spark plumbing (schema/batching/UDF shape) is the tested part"
        ) from exc
    raise NotImplementedError("decoder integration point")  # pragma: no cover


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode→embed: bucketed byte histogram,
    L1-normalized. Pure bytes → floats; replaced by a real model/codec
    in production without touching the plan."""
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b % FEATURE_DIM] += 1
    total = float(len(payload)) or 1.0
    return [c / total for c in counts]


def extract_features(assets: DataFrame, batch_size_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes
    (``mapInPandas``): (asset_id, kind, n_bytes, features[FEATURE_DIM]).
    Runs partition-parallel with no shuffle; the iterator shape is the
    same one a GPU-batched decoder would use."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len),
                    "features": payloads.map(_fake_features),
                }
            )

    schema = (
        "asset_id long, kind string, n_bytes long, features array<double>"
    )
    return assets.select("asset_id", "kind", "payload").mapInPandas(run, schema=schema)
