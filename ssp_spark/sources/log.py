"""Kafka-shaped event log over files: append-only offset-named batches,
replayed as a Structured Stream with exactly-once resume.

The reference has no connectors at all (in-memory sources only,
datastream.go:15-41); this closes the "no Kafka-shaped source" gap with
the same CONTRACT a broker gives — (partition, offset) identity,
contiguous per-partition offsets, ordered replay, resume-from-checkpoint
— expressed over an append-only directory, so the engine side is plain
Structured Streaming with no external service:

- **Producer** (``log_append``): each call writes one batch file
  ``batch-<seq>.json`` (records stamped with contiguous per-partition
  offsets from a tiny meta file) via write-tmp-then-``os.replace`` —
  readers never observe partial batches. Single-producer contract, like
  a partition's lead broker.
- **Consumer** (``read_log_stream``): ``readStream.json`` with an
  explicit schema (no inference pre-scan) and ``maxFilesPerTrigger=1``
  — micro-batches replay in file (= append) order, and Spark's file
  source tracks consumed files in the stream CHECKPOINT, so a restarted
  query resumes exactly after the last committed batch: exactly-once
  per record into an idempotent sink, the Kafka group-offset semantics.

At scale the directory listing is the known cost of file-backed streams
(documented Spark trade); a real broker swaps in by replacing this
module's reader with ``format("kafka")`` — the downstream operator
surface (the whole of ssp_spark.streaming) is unchanged, which is the
point of shaping the source this way.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

LOG_SCHEMA = "partition INT, offset BIGINT, key STRING, value STRING"
_META = "_meta.json"


def _meta_path(path: str) -> str:
    return os.path.join(path, _META)


def log_append(path: str, records: list[tuple[int, str, str]]) -> int:
    """Append one producer batch: records are (partition, key, value);
    offsets are assigned contiguously per partition. Returns the batch
    sequence number. Atomic: the batch file appears all-or-nothing, and
    the meta file advances only after the batch is visible.

    Crash recovery (ADVICE r4, log.py:64): a producer that died between
    making ``batch-<seq>.json`` visible and advancing the meta leaves an
    ORPHAN batch whose filename the naive resume would reuse — and a
    consumer that already ingested the old file tracks it by name and
    would silently never see the replacement. Resume therefore ADOPTS
    any orphan instead of overwriting it: its offsets are rolled into
    the meta and its sequence number is skipped, so a consumed filename
    is never rewritten, offsets stay unique and contiguous, and the
    orphan's records keep their delivered identity — at-least-once with
    no silent loss."""
    os.makedirs(path, exist_ok=True)
    meta = {"seq": 0, "offsets": {}}
    if os.path.exists(_meta_path(path)):
        with open(_meta_path(path)) as f:
            meta = json.load(f)
    seq = meta["seq"]
    while os.path.exists(os.path.join(path, f"batch-{seq:09d}.json")):
        orphan = os.path.join(path, f"batch-{seq:09d}.json")
        with open(orphan) as f:
            for line in f:
                if not line.strip():
                    continue
                r = json.loads(line)
                p = str(r["partition"])
                meta["offsets"][p] = max(meta["offsets"].get(p, 0), r["offset"] + 1)
        # restamp the adopted batch too (ADVICE r5): a crash between
        # os.replace and os.utime leaves a wall-clock mtime far above
        # the synthetic stamps, and Spark's mtime-ordered file source
        # would replay the orphan AFTER every later batch — breaking
        # the "append order IS replay order" contract the stamping
        # exists to guarantee
        t = 1_700_000_000 + seq * 10
        os.utime(orphan, (t, t))
        seq += 1
    rows = []
    for part, key, value in records:
        off = meta["offsets"].get(str(part), 0)
        rows.append({"partition": part, "offset": off, "key": key, "value": value})
        meta["offsets"][str(part)] = off + 1
    fname = os.path.join(path, f"batch-{seq:09d}.json")
    tmp = fname + ".__tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.replace(tmp, fname)
    # Spark's file source orders micro-batches by modification time;
    # sub-second back-to-back appends would tie (and can merge into one
    # batch), so stamp each batch file with a strictly increasing mtime
    # derived from its sequence number — append order IS replay order.
    t = 1_700_000_000 + seq * 10
    os.utime(fname, (t, t))
    meta["seq"] = seq + 1
    tmp_meta = _meta_path(path) + ".__tmp"
    with open(tmp_meta, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_meta, _meta_path(path))
    return seq


def read_log_stream(spark: SparkSession, path: str) -> DataFrame:
    """The consumer: one micro-batch per appended file, in append order.
    Resume is the stream checkpoint's file-tracking (exactly-once into
    idempotent sinks). Explicit schema — no inference scan."""
    return (
        spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "batch-*.json")
        .json(path)
    )


def read_log_batch(spark: SparkSession, path: str) -> DataFrame:
    """Batch view of the full log (backfill / lag auditing)."""
    return (
        spark.read.schema(LOG_SCHEMA)
        .option("pathGlobFilter", "batch-*.json")
        .json(path)
    )
