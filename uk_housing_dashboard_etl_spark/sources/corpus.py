"""Corpus source formats for training-data pipelines.

- ``read_jsonl_corpus``  : newline-delimited JSON documents — the lingua
  franca of text-corpus interchange. Schema enforced (never inferred at
  scale: a schema-inference pass reads the whole corpus twice), corrupt
  lines quarantined instead of failing the job.
- ``read_tar_shards``    : WebDataset-style tar shards — the standard
  layout for multimodal corpora (millions of small files collapse into
  ~1 GB tar members; object stores and schedulers handle the shard
  count, not the file count). Spark's ``binaryFile`` source distributes
  whole shards; each executor unpacks its shards with the stdlib
  ``tarfile`` inside ``mapInPandas`` (Arrow batches out, payloads never
  land on the driver).

Scale notes: shard size (not document size) is the parallelism unit for
tars — size shards to ~0.5-2 GB so `binaryFile`'s one-row-per-file
layout gives even executor work. JSONL splits per-line like CSV, so
ordinary ``maxPartitionBytes`` sizing applies.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

JSONL_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType = JSONL_DOC_SCHEMA,
) -> DataFrame:
    """Distributed JSONL scan with an enforced schema.

    ``PERMISSIVE`` mode + ``_corrupt_record`` quarantines malformed
    lines as rows with a populated corrupt column — filter and route
    them to a dead-letter sink instead of failing a 100 TB job.
    """
    full = StructType(
        schema.fields + [StructField("_corrupt_record", StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantined_rows) from a PERMISSIVE jsonl read.

    The parsed frame is cached: Spark refuses corrupt-column-only
    queries against a raw file scan (the parser would otherwise need a
    wasted full pass just for the corrupt rows).
    """
    df = df.cache()
    clean = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.where(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return clean, bad


TAR_MEMBER_SCHEMA = StructType(
    [
        StructField("shard", StringType()),
        StructField("member_name", StringType()),
        StructField("sample_key", StringType()),
        StructField("extension", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def read_tar_shards(spark: SparkSession, glob_path: str) -> DataFrame:
    """Explode WebDataset-style tar shards into one row per member.

    ``sample_key``/``extension`` follow the WebDataset convention
    (``<key>.<ext>``): members sharing a key are one multimodal sample
    (e.g. ``000123.jpg`` + ``000123.txt`` + ``000123.json``).
    """
    shards = spark.read.format("binaryFile").load(glob_path)

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                shard_name = os.path.basename(r["path"])
                with tarfile.open(fileobj=io.BytesIO(r["content"])) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        payload = tf.extractfile(m).read()
                        stem, dot, ext = m.name.rpartition(".")
                        rows.append(
                            (
                                shard_name,
                                m.name,
                                stem if dot else m.name,
                                ext if dot else "",
                                len(payload),
                                payload,
                            )
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in TAR_MEMBER_SCHEMA.fields]
            )

    return shards.select("path", "content").mapInPandas(unpack, TAR_MEMBER_SCHEMA)


def samples_from_members(members: DataFrame) -> DataFrame:
    """Group tar members into multimodal samples: one row per
    (shard, sample_key) with a map extension → payload."""
    return (
        members.groupBy("shard", "sample_key")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("extension", "payload"))
            ).alias("parts"),
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )


def write_tar_shards(
    samples: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    key_col: str = "sample_key",
    parts_col: str = "parts",
) -> DataFrame:
    """Export multimodal samples as WebDataset-style tar shards — the
    inverse of :func:`read_tar_shards`.

    ``samples`` is (key, parts: map<extension, binary>) as produced by
    :func:`samples_from_members`. Each sample's shard is
    ``abs(xxhash64(key)) % n_shards`` and ``shard-K.tar`` contains
    exactly the keys whose computed shard is K: the repartition on the
    shard id puts all of a shard's rows in one task, and the writer
    keeps one open tar PER SHARD ID seen in its partition (hash
    partitioning can co-locate several shard ids in one task — writing a
    single tar per task would mis-attribute those samples). Streams
    through the stdlib ``tarfile`` (per-partition imperative I/O — the
    one place the DataFrame API genuinely can't express the work).
    Partitions are sorted by key first so shard contents are
    byte-deterministic run to run. Returns a small (shard_id, path,
    n_samples) manifest frame with exactly one row per non-empty shard.

    Scale notes: ``out_dir`` must be storage every executor can reach
    (DFS/object-store mount; local path only in local mode). Size
    ``n_shards`` so a shard lands at ~0.5-2 GB — the parallelism unit
    for whoever reads the shards next.

    Unexportable rows are FILTERED, not fatal (r10 sweep — a single
    NULL parts map used to kill the whole export task): a NULL key has
    no member name and a NULL parts map has no content, so neither can
    become a tar entry; NULL-valued members inside a map are skipped
    the same way. Callers needing loss accounting count them upstream
    (``where(key IS NULL OR parts IS NULL)``) — the write path must
    survive a contaminated corpus, failed fetches included.
    """
    samples = samples.where(
        F.col(key_col).isNotNull() & F.col(parts_col).isNotNull()
    )
    sh = samples.withColumn(
        "__shard", (F.abs(F.xxhash64(F.col(key_col))) % n_shards).cast("int")
    )
    rep = sh.repartition(n_shards, "__shard").sortWithinPartitions(key_col)
    manifest_schema = StructType(
        [
            StructField("shard_id", LongType()),
            StructField("path", StringType()),
            StructField("n_samples", LongType()),
        ]
    )

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # shard_id -> [tarfile, path, n_samples]; several shard ids can
        # hash into the same task, each gets its own tar
        tars: dict = {}
        for pdf in batches:
            for _, r in pdf.iterrows():
                sid = int(r["__shard"])
                ent = tars.get(sid)
                if ent is None:
                    os.makedirs(out_dir, exist_ok=True)
                    path = os.path.join(out_dir, f"shard-{sid:05d}.tar")
                    ent = tars[sid] = [tarfile.open(path, "w"), path, 0]
                for ext in sorted(r[parts_col]):
                    if r[parts_col][ext] is None:
                        continue  # NULL member: no content to write
                    data = bytes(r[parts_col][ext])
                    info = tarfile.TarInfo(
                        f"{r[key_col]}.{ext}" if ext else str(r[key_col])
                    )
                    info.size = len(data)
                    info.mtime = 0  # deterministic bytes
                    ent[0].addfile(info, io.BytesIO(data))
                ent[2] += 1
        rows = []
        for sid in sorted(tars):
            tf, path, count = tars[sid]
            tf.close()
            rows.append((sid, path, count))
        if rows:
            yield pd.DataFrame(
                rows, columns=["shard_id", "path", "n_samples"]
            )

    return rep.mapInPandas(write_partition, manifest_schema)
