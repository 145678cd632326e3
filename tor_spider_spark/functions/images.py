"""Arrow-batched image payload UDFs (SURVEY §2.9 #2; input_hint: image
processing as vectorized pandas UDFs, no per-row Python rows crossing the
JVM boundary).

``decode_image_stats`` decodes a binary image column and emits
(w, h, pixel mean, recomputed phash) for the payload-invariant judge;
``psnr_vs_reference`` scores a decoded payload against regenerated source
pixels.  Decoding uses the self-contained codecs in fixtures/images.py —
real PNG, documented lossy stand-in for JPEG (no image libs in this
container); swapping in PIL/libjpeg changes only that module.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..fixtures.images import decode_image, phash64, psnr

IMAGE_STATS = StructType(
    [
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("mean", DoubleType()),
        StructField("phash", LongType()),
    ]
)


@pandas_udf(IMAGE_STATS)
def decode_image_stats(data: pd.Series) -> pd.DataFrame:
    ws, hs, means, phashes = [], [], [], []
    for blob in data:
        if blob is None:
            ws.append(None), hs.append(None), means.append(None), phashes.append(None)
            continue
        px = decode_image(bytes(blob))
        ws.append(px.shape[1])
        hs.append(px.shape[0])
        means.append(float(px.mean()))
        phashes.append(phash64(px))
    return pd.DataFrame({"w": ws, "h": hs, "mean": means, "phash": phashes})


@pandas_udf(DoubleType())
def psnr_vs_source(data: pd.Series, image_id: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
    """PSNR of the decoded payload vs the regenerated source pixels
    (pixels_for is deterministic in image_id — FIXTURES.md §1)."""
    from ..fixtures.corpus import pixels_for

    out = []
    for blob, iid, ww, hh in zip(data, image_id, w, h):
        if blob is None or iid is None:
            out.append(None)
            continue
        out.append(psnr(pixels_for(iid, int(ww), int(hh)), decode_image(bytes(blob))))
    return pd.Series(out, dtype="float64")
