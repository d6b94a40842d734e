"""Structured Streaming ingest - the reference's push pipeline
(receiver.py:354-458) as readStream -> shared transforms -> foreachBatch.

The reference is at-most-once (produce failure swallowed,
receiver.py:444-456); Structured Streaming checkpointing upgrades this to
exactly-once per micro-batch (documented semantics upgrade, SURVEY.md 7.4.7).

In production the source is Kafka (`readStream.format("kafka")` fronted by an
HTTP->Kafka shim replacing the FastAPI endpoint); locally/in tests a file
source with the same JSON payloads drives identical plans.  The transform is
pipeline/nef.normalize_notifications - the batch-tested code path, reused
verbatim.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.nef import NOTIFICATION, normalize_notifications


def read_notification_stream(spark: SparkSession, json_dir: str) -> DataFrame:
    """File-source stream of NEF notification JSON (one object per line).
    Kafka variant: readStream.format('kafka') -> from_json(value, NOTIFICATION).
    """
    return (
        spark.readStream.schema(NOTIFICATION)
        .option("maxFilesPerTrigger", 1)
        .json(json_dir)
    )


def build_ingest_stream(
    spark: SparkSession,
    json_dir: str,
    subscriptions: DataFrame,
) -> DataFrame:
    """Streaming normalized-record relation: stream x broadcast dim join +
    the shared normalizer DAG.  Caller attaches the sink (foreachBatch for
    Kafka/keyed fan-out, memory for tests)."""
    raw = read_notification_stream(spark, json_dir)
    return normalize_notifications(raw, subscriptions)


def run_to_memory(
    stream: DataFrame, name: str, output_mode: str = "append"
) -> None:
    """Drain a bounded stream synchronously into an in-memory table (test
    harness; production sinks are foreachBatch -> Kafka / keyed fan-out)."""
    q = (
        stream.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


class DiscoveredFieldsAccumulator:
    """Cross-batch dynamic metric-field discovery (receiver.py:45-46,
    394-410): per micro-batch, union the set of non-null metric columns /
    JSON keys; `on_grow` fires when the set grows (the reference re-registers
    columns with the policy service there)."""

    def __init__(self, on_grow: Callable[[set[str]], None] | None = None) -> None:
        self.fields: set[str] = set()
        self.on_grow = on_grow

    def foreach_batch(self, keys_col: str) -> Callable[[DataFrame, int], None]:
        def _fn(batch: DataFrame, epoch_id: int) -> None:
            rows = (
                batch.select(F.explode(F.col(keys_col)).alias("k"))
                .distinct()
                .collect()
            )
            new = {r["k"] for r in rows} - self.fields
            if new:
                self.fields |= new
                if self.on_grow:
                    self.on_grow(set(self.fields))

        return _fn


def write_notifications_json(payloads: list[dict], out_dir: str) -> None:
    """Test helper: materialize notification payloads as JSON-lines files
    (one file per payload -> one micro-batch per payload with
    maxFilesPerTrigger=1)."""
    os.makedirs(out_dir, exist_ok=True)
    for i, p in enumerate(payloads):
        path = os.path.join(out_dir, f"notif_{i:04d}.json")
        with open(path, "w") as f:
            f.write(json.dumps(p) + "\n")
