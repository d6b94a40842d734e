"""Sinks: Kafka JSON-batch publish + keyed fan-out - the egress half of the
reference (receiver.py:442-456 Kafka produce; :207-242,451-452 WebSocket
per-subscription broadcast), as foreachBatch writers.

Delivery semantics are an upgrade over the reference's at-most-once
(produce failure swallowed, receiver.py:444-456): foreachBatch +
checkpointing gives exactly-once per micro-batch for idempotent sinks.

Kafka itself is gated behind an import-try (no broker/client in this image);
the JSON-batch *shape* - one array of records per (notif) key, matching
receiver.py:443 - is produced by pure column expressions and tested without
a broker.  The keyed fan-out writes one stream per key to a directory tree,
the file-system dual of topic-per-key / WS-per-subscription.  The Arrow
Flight writer (flight_foreach_batch, r15) is the wire-level egress this
image CAN exercise end-to-end: executor-side DoPut over a real gRPC
socket, same packed payload contract as the Kafka path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # confluent-kafka / kafka-python are not in this image
    from confluent_kafka import Producer  # type: ignore  # noqa: F401

    HAVE_KAFKA = True
except ImportError:
    HAVE_KAFKA = False

try:  # pyarrow.flight ships with the image's pyarrow (verified r15)
    import pyarrow.flight  # noqa: F401

    HAVE_FLIGHT = True
except ImportError:
    HAVE_FLIGHT = False


def pack_batches(records: DataFrame, key: str = "notifId") -> DataFrame:
    """One JSON array message per key per micro-batch (receiver.py:443:
    'serialize all records as ONE JSON array').  Deterministic order inside
    the array via array_sort on the leading ts_unix field."""
    rec_cols = [c for c in records.columns if c != key]
    rec = F.struct(*[F.col(c) for c in rec_cols])
    return records.groupBy(key).agg(
        F.to_json(F.array_sort(F.collect_list(rec))).alias("payload"),
        F.count("*").alias("n_records"),
    )


def _default_producer_factory(bootstrap: str):
    """Per-executor confluent producer; a plain function (not a lambda over
    module globals) so cloudpickle ships it by value to workers."""

    def make():
        from confluent_kafka import Producer as _P  # imported ON the worker

        return _P({"bootstrap.servers": bootstrap})

    return make


def kafka_foreach_batch(topic: str, bootstrap: str, producer_factory=None):
    """foreachBatch writer: pack per-key JSON arrays, produce one message per
    key - EXECUTOR-SIDE.  Each partition of the packed frame opens its own
    producer via foreachPartition, so payload bytes flow worker -> broker and
    never transit the driver (the previous spelling collected the whole
    micro-batch to a single driver producer - a bottleneck and OOM risk at
    scale).  Produce contract matches the reference: one JSON array message
    per notifId, keyed by notifId (receiver.py:443-448).

    `producer_factory`: zero-arg callable returning an object with
    .produce(topic, value=, key=) and .flush(timeout) - defaults to a
    per-partition confluent_kafka.Producer; injectable so the packing and
    partition wiring are testable without a broker."""

    def _write(batch: DataFrame, epoch_id: int) -> None:
        factory = producer_factory
        if factory is None:
            if not HAVE_KAFKA:
                raise NotImplementedError(
                    "confluent-kafka not installed in this image; use "
                    "file_fanout_foreach_batch, install the client, or "
                    "inject a producer_factory"
                )
            factory = _default_producer_factory(bootstrap)
        t = topic

        def _send(rows) -> None:
            # worker-side: everything referenced is a serialized-by-value
            # local (t, factory) - no package module symbols in the closure
            p = factory()
            n = 0
            for row in rows:
                p.produce(t, value=row["payload"], key=row["notifId"])
                n += 1
            if n:
                # PRODUCER_MAX_TIMEOUT=30 in the reference deployment.
                # flush() returns the number of messages STILL undelivered
                # at timeout - swallowing it would commit the micro-batch
                # past lost messages (at-most-once on broker failure).
                # Raising fails the task -> Spark retries the partition ->
                # the epoch replays: at-least-once, with the idempotent
                # epoch layout (file_fanout docstring) de-duplicating.
                undelivered = p.flush(30)
                if undelivered:
                    raise RuntimeError(
                        f"kafka flush timed out with {undelivered} "
                        f"undelivered message(s) to topic {t!r}"
                    )

        pack_batches(batch).foreachPartition(_send)

    return _write


def flight_foreach_batch(location: str, key: str = "notifId"):
    """Arrow Flight egress writer - the WIRE-level dual of the Kafka
    produce (receiver.py:442-456) that this image can actually exercise:
    no Kafka client or broker installs here (TESTDATA.md), but
    pyarrow.flight ships with the bundled pyarrow, so the packed
    one-JSON-array-per-key batches flow executor -> gRPC socket ->
    receiver as Arrow record batches, closing the previously
    environment-blocked wire-egress story with a real-socket test
    (tests/test_pipeline_components.py::TestFlightSink).

    EXECUTOR-SIDE like kafka_foreach_batch: each partition of the packed
    frame opens its own FlightClient and DoPuts one stream under
    descriptor path (key-root, epoch) - payload bytes never transit the
    driver.  A DoPut failure raises -> the task retries -> the epoch
    replays: at-least-once, deduplicable downstream by (epoch, key)
    exactly like the file fan-out's epoch layout.

    `location`: gRPC URI, e.g. "grpc://host:port".  The server side is
    any Flight endpoint accepting DoPut; FlightSpoolServer below is the
    in-process receiver used by tests and local ops."""

    def _write(batch: DataFrame, epoch_id: int) -> None:
        if not HAVE_FLIGHT:
            raise NotImplementedError(
                "pyarrow.flight unavailable; use file_fanout_foreach_batch"
            )
        loc, k, ep = location, key, int(epoch_id)

        def _send(rows) -> None:
            # worker-side: pyarrow imported ON the executor; everything in
            # the closure is serialized by value (loc, k, ep)
            import pyarrow as _pa
            import pyarrow.flight as _fl

            cols = {k: [], "payload": [], "n_records": []}
            for row in rows:
                cols[k].append(row[k])
                cols["payload"].append(row["payload"])
                cols["n_records"].append(row["n_records"])
            if not cols[k]:
                return
            tbl = _pa.table(
                {
                    k: _pa.array(cols[k], _pa.string()),
                    "payload": _pa.array(cols["payload"], _pa.string()),
                    "n_records": _pa.array(cols["n_records"], _pa.int64()),
                }
            )
            client = _fl.connect(loc)
            try:
                desc = _fl.FlightDescriptor.for_path(k, f"epoch={ep}")
                writer, _meta = client.do_put(desc, tbl.schema)
                writer.write_table(tbl)
                writer.close()  # raises on server/socket failure -> retry
            finally:
                client.close()

        pack_batches(batch, key).foreachPartition(_send)

    return _write


class FlightSpoolServer:
    """In-process Arrow Flight receiver for the egress tests and local
    ops: accepts DoPut streams and spools them per descriptor path -
    the broker stand-in on the far side of a REAL gRPC socket (unlike
    the injected fake producer the Kafka test must use)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0) -> None:
        import pyarrow.flight as fl

        spool = self

        class _Srv(fl.FlightServerBase):
            def do_put(self, context, descriptor, reader, writer):
                path = "/".join(p.decode() for p in descriptor.path)
                spool.tables.setdefault(path, []).append(reader.read_all())

        self.tables: dict[str, list] = {}
        self._server = _Srv(f"grpc://{host}:{port}")
        self.location = f"grpc://{host}:{self._server.port}"

    def rows(self, path: str) -> list[dict]:
        """All received rows under a descriptor path, as dicts."""
        out: list[dict] = []
        for t in self.tables.get(path, []):
            out.extend(t.to_pylist())
        return out

    def close(self) -> None:
        self._server.shutdown()

    def __enter__(self) -> "FlightSpoolServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def file_fanout_foreach_batch(out_dir: str, key: str = "notifId"):
    """Keyed fan-out sink: each key's records land under
    out_dir/epoch=<id>/<key>/ as JSON-lines - the reference's
    per-subscription WebSocket push (receiver.py:227-239) with files
    standing in for sockets.  Partitioned write keeps the fan-out
    distributed (no driver collect of record data).

    Exactly-once: the write is scoped to its epoch directory with
    overwrite mode, so a REPLAYED micro-batch (Spark re-runs the epoch
    after a failure between sink write and checkpoint commit) lands on the
    same path and replaces itself instead of appending duplicates - the
    idempotence foreachBatch needs to upgrade the reference's
    at-most-once delivery to exactly-once."""

    def _write(batch: DataFrame, epoch_id: int) -> None:
        (
            batch.withColumn("_k", F.col(key))
            .write.mode("overwrite")
            .partitionBy("_k")
            .json(os.path.join(out_dir, f"epoch={epoch_id}"))
        )

    return _write


def read_fanout(out_dir: str, key_value: str) -> list[dict]:
    """Test helper: read one key's fan-out stream back across all epochs."""
    records = []
    if not os.path.isdir(out_dir):
        return records
    for epoch in sorted(os.listdir(out_dir)):
        if not epoch.startswith("epoch="):
            continue
        d = os.path.join(out_dir, epoch, f"_k={key_value}")
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    for line in f:
                        if line.strip():
                            records.append(json.loads(line))
    return records
