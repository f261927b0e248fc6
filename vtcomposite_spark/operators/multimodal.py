"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batching via mapInPandas,
partition-preserving transforms; the *codec* step is a clearly marked stub
(the container ships no image/audio libraries). ``decode_image`` routes to
a deterministic fake decoder by default; passing ``codec="real"`` raises
NotImplementedError at the exact seam where Pillow/ffmpeg would plug in.

Binary payload layout for the deterministic fake (produced by
``synthesize_media``): b"IMG1" + width:uint16 + height:uint16 + pixel bytes
(row-major, 1 byte/px, generated from a seed). This keeps batch shapes and
sizes realistic so the plumbing (offsets, memory, skew) is actually
exercised.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_px", T.DoubleType()),
    T.StructField("histogram", T.ArrayType(T.LongType())),  # 16 bins
])


def synthesize_media(spark: SparkSession, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic fake image table; sizes vary 16x16..64x64 by id."""

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for i in pdf["id"]:
                i = int(i)
                w = 16 + (i * 7) % 49
                h = 16 + (i * 13) % 49
                rng = np.random.default_rng(i)
                px = rng.integers(0, 256, w * h, dtype=np.uint8)
                payload = b"IMG1" + struct.pack("<HH", w, h) + px.tobytes()
                out["media_id"].append(i)
                out["kind"].append("image")
                out["payload"].append(payload)
                out["meta"].append({"w": str(w), "h": str(h), "codec": "fake"})
            yield pd.DataFrame(out)

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_fake(payload: bytes):
    if payload[:4] != b"IMG1":
        raise ValueError("not an IMG1 fake payload")
    w, h = struct.unpack_from("<HH", payload, 4)
    px = np.frombuffer(payload, dtype=np.uint8, offset=8, count=w * h)
    return w, h, px


def decode_image(media: DataFrame, codec: str = "fake") -> DataFrame:
    """payload → (width, height, mean_px, 16-bin histogram), Arrow-batched.

    codec="real" is the seam for an actual decoder (Pillow/libvips) — not
    available in this environment.
    """
    if codec == "real":
        raise NotImplementedError(
            "real image codecs are not installed in this environment; "
            "plug Pillow/libvips in here — the Spark plumbing is identical")

    def kernel(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            ws, hs, means, hists, ids = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = _decode_fake(bytes(payload))
                ws.append(w)
                hs.append(h)
                means.append(float(px.mean()))
                hists.append(np.bincount(px >> 4, minlength=16).astype(np.int64))
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "width": ws, "height": hs, "mean_px": means,
                "histogram": hists,
            })

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=IMAGE_FEATURES_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize of the fake payloads (real plumbing: binary
    in → binary out through Arrow)."""

    def kernel(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            payloads = []
            for payload in pdf["payload"]:
                w, h, px = _decode_fake(bytes(payload))
                img = px.reshape(h, w)
                yi = (np.arange(height) * h // height)
                xi = (np.arange(width) * w // width)
                small = img[np.ix_(yi, xi)]
                payloads.append(b"IMG1" + struct.pack("<HH", width, height)
                                + small.astype(np.uint8).tobytes())
            yield pd.DataFrame({"media_id": pdf["media_id"].astype("int64"),
                                "payload": payloads})

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    return media.select("media_id", "payload").mapInPandas(kernel, schema)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling seam: with the fake codec each image is its own
    single frame; kept so the pipeline shape (1 row → N frame rows) is real."""

    def kernel(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "frame_no": np.zeros(len(pdf), dtype=np.int64),
                "payload": pdf["payload"],
            })

    schema = T.StructType([T.StructField("media_id", T.LongType()),
                           T.StructField("frame_no", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    return media.select("media_id", "payload").mapInPandas(kernel, schema)
