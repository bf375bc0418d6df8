"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake decode
(dimensions derived from the payload hash). Everything Spark-side — schema,
Arrow batch shape, mapInPandas partitioning, metadata extraction — is real
and tested, so swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("content_hash", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def decode_image_stub(payload: bytes, fake: bool = True) -> tuple[int, int]:
    """Placeholder for a real image decoder. With ``fake=True`` returns
    deterministic pseudo-dimensions from the content hash."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "container; wire a real decoder here"
        )
    h = hashlib.md5(payload or b"").digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def media_metadata(
    df: DataFrame, url_col: str = "url", bin_col: str = "payload",
    media_type: str = "image",
) -> DataFrame:
    """Binary column -> typed metadata rows via mapInPandas (Arrow batches;
    the binary never converts to Python objects row-by-row on the driver)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col]
            dims = [
                decode_image_stub(bytes(p)) if p is not None else (None, None)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "url": pdf[url_col],
                    "media_type": media_type,
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "content_hash": [
                        hashlib.md5(bytes(p)).hexdigest() if p is not None else None
                        for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.select(url_col, bin_col).mapInPandas(gen, MEDIA_META_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, url_col: str = "url",
    bin_col: str = "payload",
) -> DataFrame:
    """Deterministic frame sampling stand-in: slice the payload every
    ``every_n_bytes`` (a real video pipeline would seek keyframes; the Spark
    plumbing — 1->N expansion inside mapInPandas — is identical)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, nos, frames = [], [], []
            for u, p in zip(pdf[url_col], pdf[bin_col]):
                if p is None:
                    continue
                b = bytes(p)
                for i in range(0, max(len(b), 1), every_n_bytes):
                    urls.append(u)
                    nos.append(i // every_n_bytes)
                    frames.append(b[i : i + every_n_bytes])
            yield pd.DataFrame({"url": urls, "frame_no": nos, "frame": frames})

    return df.select(url_col, bin_col).mapInPandas(gen, FRAME_SCHEMA)
