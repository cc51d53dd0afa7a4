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


# ----------------------------------------------------- header decoders
# Pluggable decoder registry: format name -> (sniff, parse).  These are
# REAL pure-Python header parsers (no image libs needed) — they populate
# meta_width/meta_height from actual bytes; pixel decode stays stubbed.


def _parse_ppm(b: bytes):
    # Netpbm P1-P6: magic, whitespace/comments, width, height
    if len(b) < 2 or b[0:1] != b"P" or b[1:2] not in b"123456":
        return None
    import re

    # strip comments, then the first two ints after the magic are w, h
    body = re.sub(rb"#[^\n]*", b" ", b[2:256])
    nums = re.findall(rb"\d+", body)
    if len(nums) < 2:
        return None
    return int(nums[0]), int(nums[1])


def _parse_bmp(b: bytes):
    if len(b) < 26 or b[:2] != b"BM":
        return None
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    return abs(w), abs(h)  # height may be negative (top-down rows)


def _parse_png(b: bytes):
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    return (
        int.from_bytes(b[16:20], "big"),
        int.from_bytes(b[20:24], "big"),
    )


def _parse_gif(b: bytes):
    if len(b) < 10 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    return (
        int.from_bytes(b[6:8], "little"),
        int.from_bytes(b[8:10], "little"),
    )


# sniffed in order; extensible via register_decoder
IMAGE_DECODERS: dict[str, object] = {
    "ppm": _parse_ppm,
    "bmp": _parse_bmp,
    "png": _parse_png,
    "gif": _parse_gif,
}


def register_decoder(name: str, parse_fn) -> None:
    """Plug in a decoder: parse_fn(payload: bytes) -> (width, height) | None.
    Real pixel decoders (PIL et al.) slot in here without touching the
    Spark plumbing."""
    IMAGE_DECODERS[name] = parse_fn


def decode_header(payload: bytes) -> tuple[str | None, int | None, int | None]:
    """Sniff the payload against the decoder registry; returns
    (format, width, height) or (None, None, None) for unknown bytes."""
    if payload:
        for name, parse in IMAGE_DECODERS.items():
            dims = parse(payload)
            if dims is not None:
                return name, int(dims[0]), int(dims[1])
    return None, None, None


META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("payload_bytes", T.LongType()),
    ]
)


def decode_meta(media: DataFrame) -> DataFrame:
    """Populate meta_width/meta_height from the payload bytes via the
    decoder registry (mapInPandas — payloads stay on executors).  Unknown
    formats keep NULL dims, they do not fail the batch."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs = [], [], []
            for p in pdf["payload"]:
                f, w, h = decode_header(bytes(p) if p is not None else b"")
                fmts.append(f)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "format": fmts,
                    "meta_width": pd.array(ws, dtype="Int32"),
                    "meta_height": pd.array(hs, dtype="Int32"),
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(_decode, META_SCHEMA)


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
