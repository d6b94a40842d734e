"""Multimodal-column queries: opaque binary + typed metadata in one relation
(SURVEY.md 2.9; plumbing in pipeline/multimodal.py).

The binary content is synthesized deterministically from the documents
fixture (no media files ship in the container); what's under test is the
real Spark plumbing - binary columns, mapInPandas batch shape, metadata
pushdown - not the decode, which is stubbed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions import pround
from ..pipeline.multimodal import extract_features, synthesize_assets
from ..registry import query


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS asset_id,
           ['image', 'audio', 'video'][(doc_id % 3) + 1] AS media_type,
           strlen(text) AS n_bytes,
           sha256(text) AS sha256_hex
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-column metadata path: blob byte length + content hash, all
    computed JVM-side on the binary column.  (media_type cycles image/
    audio/video from doc_id % 3 = 0/1/2, 1-based-indexed on both sides.)"""
    assets = synthesize_assets(load(spark, sf, "documents"))
    return assets.select(
        "asset_id",
        "media_type",
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.sha2("content", 256).alias("sha256_hex"),
    )


@query("multimodal_decode")  # rows-only: stub decoder is engine-specific
def multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Full decode pipeline through mapInPandas (Arrow-batched): binary in,
    fixed-width feature vector out.  Decode itself is the documented stub
    (pipeline/multimodal.decode_stub); shape and determinism are asserted
    in tests."""
    assets = synthesize_assets(load(spark, sf, "documents"))
    feats = extract_features(assets)
    return feats.select(
        "asset_id",
        "media_type",
        "n_bytes",
        "sha256",
        F.size("features").cast("long").alias("n_features"),
        pround(
            F.aggregate("features", F.lit(0.0), lambda acc, v: acc + v), 6
        ).alias("feat_sum"),
    )
