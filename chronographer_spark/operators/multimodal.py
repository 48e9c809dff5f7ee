"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with metadata (schemas.ASSET_SCHEMA).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` UDFs — the Spark-side plumbing (schema, partitioning, batch
shape, per-executor codec init) is real and tested; the actual codec is
STUBBED because image/audio libraries are not present in this container:

- `decode_image(..., stub=True)` produces deterministic fake features from
  the payload bytes (md5-derived), so pipelines exercise end-to-end.
- `decode_image(..., stub=False)` raises NotImplementedError at the decode
  site, marking exactly where PIL/libvips would plug in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), True),
        StructField("feat", ArrayType(DoubleType()), True),
        StructField("out_width", IntegerType(), True),
        StructField("out_height", IntegerType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_ms", LongType(), False),
        StructField("frame_fp", StringType(), False),
    ]
)


def _fake_features(payloads: pd.Series, dim: int) -> pd.Series:
    """Deterministic stub features from payload bytes, ENGINE-PORTABLE:
    feature j = (int(md5(payload + b"|j")[:8hex], 16) % 2_000_000
    - 1_000_000) / 1e6, uniform in [-1, 1). DuckDB replays this bit-for-bit
    via md5(text || '|' || j) when the payload is the utf-8 text bytes —
    the correctness gate verifies the whole decode pipeline, not just row
    counts (numpy-RNG features were gate-opaque)."""

    def feats(b) -> list[float]:
        if b is None:
            return []
        pb = bytes(b)
        return [
            (
                int(hashlib.md5(pb + b"|" + str(j).encode()).hexdigest()[:8], 16)
                % 2_000_000
                - 1_000_000
            )
            / 1e6
            for j in range(dim)
        ]

    return payloads.map(feats)


def decode_and_featurize(
    assets: DataFrame,
    dim: int = 16,
    target_size: tuple[int, int] = (224, 224),
    stub: bool = True,
) -> DataFrame:
    """binary payload -> feature vector + resized dims, via mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-executor "codec" init happens here once per task (lazy global
        # in a real deployment); the stub needs none.
        for pdf in batches:
            if not stub:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/torchaudio — "
                    "not available in this environment; use stub=True"
                )
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "feat": _fake_features(pdf["payload"], dim),
                    "out_width": target_size[0],
                    "out_height": target_size[1],
                }
            )
            yield out

    cols = ["asset_id", "modality", "payload"]
    return assets.select(*cols).mapInPandas(gen, schema=FEATURE_SCHEMA)


def sample_frames(
    assets: DataFrame, every_ms: int = 1000, stub: bool = True
) -> DataFrame:
    """video payload -> (frame_idx, frame_ms, fingerprint) rows.

    Frame times derive from duration_ms metadata (native explode of a
    sequence); the per-frame fingerprint is the stubbed decode."""
    frames = assets.filter(F.col("modality") == "video").select(
        "asset_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1, F.lit(0)),
            )
        ).alias("frame_idx"),
    ).withColumn("frame_ms", F.col("frame_idx").cast("long") * every_ms)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not stub:
                raise NotImplementedError("real video decode not available here")
            # portable fingerprint: md5(payload + "|f{idx}") — DuckDB
            # replays it as md5(text || '|f' || idx) on text-byte payloads
            fp = [
                hashlib.md5(
                    bytes(p) + b"|f" + str(int(i)).encode() if p is not None else b""
                ).hexdigest()
                for p, i in zip(pdf["payload"], pdf["frame_idx"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_ms": pdf["frame_ms"],
                    "frame_fp": pd.Series(fp, dtype="object", index=pdf.index),
                }
            )

    return frames.mapInPandas(gen, schema=FRAME_SCHEMA)


def assets_from_documents(docs: DataFrame, limit: int | None = None) -> DataFrame:
    """Deterministic asset table derived from the `documents` corpus: the
    binary payload is the utf-8 text bytes, modality cycles by doc_id, and
    video durations derive from n_chars. Gives the multimodal pipeline a
    reproducible input DuckDB can also construct, so decode features and
    frame fingerprints are gate-verified end-to-end."""
    from ..schemas import ASSET_SCHEMA  # noqa: F401  (shape contract)

    d = docs
    if limit is not None:
        d = d.filter(F.col("doc_id") < limit)
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3).cast("int") + 1,
    )
    return d.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("mime"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(64)).alias("width"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(48)).alias("height"),
        F.when(F.col("doc_id") % 3 == 2, F.col("n_chars") * 40)
        .cast("long")
        .alias("duration_ms"),
    )


def synthetic_assets(spark, n: int = 20, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests (binary payloads from seed)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
        rows.append(
            (
                i,
                modality,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                64 if modality == "image" else None,
                48 if modality == "image" else None,
                5000 if modality == "video" else None,
            )
        )
    from ..schemas import ASSET_SCHEMA

    return spark.createDataFrame(rows, ASSET_SCHEMA)


def phash_signatures(assets: DataFrame) -> DataFrame:
    """60-bit perceptual-hash signatures for binary assets — the
    image/audio near-dup KEY. The hash here is the md5-prefix stand-in
    (same honesty contract as decode_and_featurize: no image libs exist
    in this sandbox, so the DCT/aHash step that would normally produce a
    locality-sensitive fingerprint is replaced by a deterministic hash of
    the payload bytes; a real deployment swaps ONLY this expression for a
    Pandas-UDF pHash — column name, width, and everything downstream
    stay identical). The actual scale machinery — the block-partition
    banded Hamming join with its pigeonhole recall guarantee — is
    `dedup.simhash_candidates`, reused unchanged on the asset table:
    asset near-dup IS simhash dedup over a different signature source.

    Returns (asset_id, phash) with phash in [0, 2^60).
    """
    return assets.select(
        F.col("asset_id"),
        F.conv(F.substring(F.md5(F.col("payload")), 1, 15), 16, 10)
        .cast("long")
        .alias("phash"),
    )
