"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as BinaryType columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched pandas
UDFs over mapInPandas.  The decode itself is STUBBED here (no image/audio
libraries in this environment) behind `decode_stub` — deterministic fake
features so the Spark-side plumbing (schema, batching, partition flow) is
real and tested; swap `_decode_payload` for a real decoder in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_payload(payload: bytes, kind: str) -> list[float]:
    """STUB decoder: deterministic 8-dim feature from the payload digest.

    Production: replace with PIL/torchvision (image), torchaudio (audio),
    or pyav frame sampling (video).  Raising NotImplementedError here would
    kill the pipeline; the deterministic fake keeps the plumbing testable.
    """
    d = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in d[:8]]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: the canonical multimodal operator.

    One Arrow batch per Python call; payloads never round-trip through the
    driver; partitioning of the input is preserved (no shuffle).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_payload(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": [
                        hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "payload_bytes": [len(p or b"") for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def text_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter used by tests/bench: treat utf-8 text bytes as an opaque
    payload so the multimodal path has real data to chew on."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
    )
