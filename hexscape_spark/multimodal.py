"""Multimodal (binary payload) plumbing.

Image/audio/video travel as opaque BinaryType columns with typed metadata.
The decode/feature-extract kernels are STUBBED (no imaging libs in this
container — clearly marked), but the Spark-side plumbing — schema,
Arrow-batched mapInPandas signature, partitioning, batch shape — is real
and tested: swapping the stub for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id LONG, kind STRING, payload BINARY, "
                "mime STRING, n_bytes LONG")

FEATURE_SCHEMA = ("media_id LONG, kind STRING, n_bytes LONG, "
                  "width INT, height INT, feature ARRAY<FLOAT>")


def _decode_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decode: deterministic fake in place of a real image decoder.

    Real implementation would be e.g. PIL.Image.open(BytesIO(payload)).
    Raises NotImplementedError for kinds we don't fake.
    """
    digest = hashlib.sha256(payload).digest()
    width = 16 + digest[0] % 64
    height = 16 + digest[1] % 64
    rng = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    feat = (rng - 127.5) / 127.5
    return width, height, feat[:16]


def extract_features(df: DataFrame, payload: str = "payload",
                     kind: str = "kind") -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    mapInPandas: one vectorized pass per Arrow batch; the pattern (and the
    tested contract) is identical for a real decoder.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, feats = [], [], []
            for payload_bytes, k in zip(pdf[payload], pdf[kind]):
                if k != "image":
                    raise NotImplementedError(
                        f"decode for media kind {k!r} is stubbed; only the "
                        "deterministic 'image' fake is implemented in this "
                        "container")
                w, h, f = _decode_stub(bytes(payload_bytes))
                ws.append(w)
                hs.append(h)
                feats.append(f.tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf[kind],
                "n_bytes": pdf[payload].map(len),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "feature": feats,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def synth_media(spark, n: int) -> DataFrame:
    """Deterministic fake media table (payload = hashed bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.concat(F.lit("IMGDATA:"), F.col("id").cast("string"),
                          F.lit(":"), F.md5(F.col("id").cast("string"))), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("mime"))
    return df.withColumn("n_bytes", F.length("payload").cast("long"))
