"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (north-star mandate, BASELINE.json:6).

The Spark-side structure is real and tested - schema, partitioning, Arrow
batch shape, mapInPandas signatures.  The actual media decode is STUBBED:
the container has no image/audio libraries, so `decode_stub` derives
deterministic fake features from the bytes (and the import-try below shows
where PIL/librosa would slot in).  Swapping the stub for a real decoder
changes no Spark plumbing.

Scale notes: media blobs make rows wide - the repartition knob on
extract_features keeps Arrow batches bounded; feature extraction is
embarrassingly parallel (mapInPandas, no shuffle); metadata stays in typed
columns so filters on it push down and never touch the blobs (parquet
column pruning skips the binary column entirely).
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoders, if the environment has them
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

# features extracted per blob; fixed width so the schema is static
N_FEATURES = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _make_stub_decoder(n_features: int = N_FEATURES):
    """Factory so the decoder is a *closure* (pickled by value): the consumer
    may build its SparkSession from a cwd where this package isn't
    importable, so nothing shipped to Python workers may be a module-level
    symbol of this package (cloudpickle would serialize it by reference)."""

    def decode(blob: bytes) -> list[float]:
        if blob is None:
            return None
        h = hashlib.sha256(blob).digest()
        return [
            int.from_bytes(h[i * 4 : i * 4 + 4], "big") / 2**32
            for i in range(n_features)
        ]

    return decode


#: Deterministic fake "decoded features" from raw bytes.  A real
#: implementation would decode pixels/samples here (PIL, librosa, pyav);
#: the stub hashes fixed-stride byte windows into [0, 1) floats so output
#: is reproducible and shaped like a real feature vector.
decode_stub = _make_stub_decoder()


def decode_real(blob: bytes) -> list[float]:
    """Where a real decoder goes; explicit NotImplementedError per the
    build mandate (media libs absent from this container)."""
    raise NotImplementedError("media decode requires PIL/librosa/pyav")


def extract_features(assets: DataFrame, partitions: int | None = None) -> DataFrame:
    """mapInPandas feature extraction over binary assets.

    Input schema: asset_id long, media_type string, content binary (+ any
    metadata columns, preserved nowhere - select them separately and join
    back on asset_id if needed).
    """
    if partitions:
        assets = assets.repartition(partitions)

    def _extract(batches):
        for pdf in batches:
            feats = pdf["content"].map(decode_stub)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "sha256": pdf["content"].map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "features": feats,
                }
            )

    return assets.mapInPandas(_extract, FEATURE_SCHEMA)


def synthesize_assets(documents: DataFrame) -> DataFrame:
    """Deterministic binary assets from the documents fixture (the container
    ships no media files): content = utf-8 bytes of the text, media_type
    cycles by doc_id.  Gives the binary-column path real bytes to move."""
    media = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        media.alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.col("lang"),
        F.col("n_chars"),
    )
