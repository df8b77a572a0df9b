"""Multimodal column operators (north-star, BASELINE.json).

Images/audio/video are opaque ``binary`` columns with typed metadata —
the S2-S5 parse-UDF pattern generalized. The decode/feature steps run as
Arrow-batched ``mapInPandas`` UDFs; the actual codecs (PIL/ffmpeg/...)
are NOT installed in this container, so decode is stubbed behind a
deterministic fake keyed on the content hash — the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested.

Scale notes: binary payloads ride in Arrow record batches; cap batch
bytes via ``spark.sql.execution.arrow.maxRecordsPerBatch`` and keep wide
binary columns OUT of shuffle keys — metadata-only projections shuffle,
payloads stay columnar at rest (parquet) until a narrow decode stage.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("modality", T.StringType()),  # image | audio | video | text
        T.StructField("mime", T.StringType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def to_media(df: DataFrame, id_col: str, payload_col: str, modality: str, mime: str) -> DataFrame:
    """Normalize any (id, binary-or-string payload) frame to the typed
    media schema."""
    payload = F.col(payload_col)
    if dict(df.dtypes)[payload_col] == "string":
        payload = F.encode(payload, "UTF-8")
    df = df.filter(F.col(payload_col).isNotNull())  # null payload = no media
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit(mime).alias("mime"),
        payload.alias("data"),
        F.create_map(
            F.lit("n_bytes"), F.length(payload).cast("string"),
            F.lit("sha256"), F.sha2(payload, 256),
        ).alias("meta"),
    )


def _fake_decode(data: bytes, channels: int) -> np.ndarray:
    """Deterministic stand-in for a real codec: expands the sha256 of the
    payload into a fixed-size float feature block. Replace with
    PIL/librosa/ffmpeg when available."""
    h = hashlib.sha256(data).digest()
    seed = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    return np.tile(seed, channels)[: 32 * channels] / 255.0


_IMAGE_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def image_features(
    media: DataFrame,
    resize: tuple[int, int] = (32, 32),
    decoder=None,
) -> DataFrame:
    """Decode -> resize -> feature-extract as one narrow mapInPandas
    stage. With no image library installed this produces the
    deterministic fake features; the operator contract (schema, batch
    iteration, no shuffle) is identical with a real decoder.

    ``decoder`` is the codec INJECTION SEAM (VERDICT r13 item 7): a
    callable ``(payload: bytes, w: int, h: int) -> array-like of
    float32`` that replaces the sha256 stub per payload — how a real
    PIL/opencv decode plugs in without touching the Spark plumbing.
    The seam is exercised in tests/test_extension_points.py with a
    non-sha256 fake, proving the schema/batch/no-shuffle pins hold for
    ANY decoder, not just the stub arithmetic."""
    from .._shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    w, h = resize

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder is None:
            try:
                from PIL import Image  # type: ignore # noqa: F401

                real = True
            except ImportError:
                real = False
        for pdf in batches:
            feats = []
            for data in pdf["data"]:
                if decoder is not None:
                    feats.append(
                        np.asarray(decoder(bytes(data), w, h), dtype=np.float32)
                    )
                elif real:  # pragma: no cover - library absent in container
                    raise NotImplementedError(
                        "real image decode path: wire PIL resize + histogram here"
                    )
                else:
                    feats.append(_fake_decode(bytes(data), 3))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w,
                    "height": h,
                    "features": feats,
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(gen, _IMAGE_FEAT_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video payloads (1 row in -> N rows out). The
    stub derives deterministic per-frame ids from the payload hash; a
    real implementation swaps in an ffmpeg reader with the same
    contract."""
    from .._shipping import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_no, out_sha = [], [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                payload = bytes(data)
                for i in range(max_frames):
                    out_id.append(mid)
                    out_no.append(i * every_n)
                    out_sha.append(
                        hashlib.sha256(payload + i.to_bytes(4, "big")).hexdigest()[:16]
                    )
            yield pd.DataFrame({"media_id": out_id, "frame_no": out_no, "frame_sha": out_sha})

    return media.filter(F.col("modality") == "video").mapInPandas(gen, _FRAME_SCHEMA)
