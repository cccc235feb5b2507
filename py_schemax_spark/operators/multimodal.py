"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step is STUBBED (no image/audio libraries in this
container): ``decode_image_batch`` raises ``NotImplementedError``
unless the deterministic fake decoder is selected. Everything
Spark-side — schema, Arrow batch shape, ``mapInPandas`` signature,
partition sizing — is real and tested; swapping the fake for
PIL/libvips later changes one function body, not the plan.

Scale notes: binary payloads dominate bytes; the operators here
project ONLY (key, payload) so column pruning keeps unrelated scans
payload-free, and ``maxRecordsPerBatch`` bounds Arrow batch memory
when payloads are MBs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def decode_image_real(payload: bytes):  # pragma: no cover - stub
    """Real decoder hook — requires an image library not present in
    this environment. Wire PIL/opencv here in production."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; use fake_decode for tests"
    )


def fake_decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic fake decoder: derives (w, h, c) and a tiny pixel
    block from the payload bytes — a stand-in with real data flow so
    the Spark plumbing (batching, schema, aggregation) is testable."""
    h0 = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    w = 16 + h0 % 64
    h = 16 + (h0 >> 8) % 64
    c = 3
    px = np.frombuffer(
        (payload * ((w * h * c) // max(len(payload), 1) + 1))[: w * h * c],
        dtype=np.uint8,
    )
    return w, h, c, px


def image_metadata(
    df: DataFrame,
    key_col: str = "url",
    payload_col: str = "html",
    decoder=fake_decode,
) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas``: Arrow-batched binary
    in, typed metadata out. One Python invocation per record batch."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf["k"], pdf["p"]):
                if payload is None:
                    continue
                w, h, c, px = decoder(bytes(payload))
                rows.append(
                    (str(key), w, h, c, len(payload), float(px.mean()))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields]
            )

    pruned = df.select(
        F.col(key_col).alias("k"), F.col(payload_col).alias("p")
    )
    return pruned.mapInPandas(extract, IMAGE_META_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target: tuple[int, int] = (8, 8),
    key_col: str = "url",
    payload_col: str = "html",
    decoder=fake_decode,
) -> DataFrame:
    """Resize via ``mapInPandas``: decode (stubbed), nearest-neighbor
    downsample with numpy index striding, re-emit raw pixel bytes.
    The resize math is the real production shape (vectorized per
    image, Arrow-batched across images); only the decode is fake."""
    tw, th = target

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf["k"], pdf["p"]):
                if payload is None:
                    continue
                w, h, c, px = decoder(bytes(payload))
                img = px[: w * h * c].reshape(h, w, c)
                yi = (np.arange(th) * h) // th
                xi = (np.arange(tw) * w) // tw
                small = img[yi][:, xi]
                rows.append((str(key), tw, th, small.tobytes()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    pruned = df.select(
        F.col(key_col).alias("k"), F.col(payload_col).alias("p")
    )
    return pruned.mapInPandas(work, RESIZED_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    key_col: str = "url",
    payload_col: str = "html",
    every_n: int = 10,
) -> DataFrame:
    """Video frame-sampling PLAN: emits (key, frame_index) fan-out rows
    for the decode stage — the fan-out/partitioning half of frame
    extraction, with the decoder stubbed as above. Frame count is
    derived deterministically from payload size."""
    n_frames = (F.length(F.col(payload_col)) / 100 + 1).cast("int")
    return df.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_index"),
    )
