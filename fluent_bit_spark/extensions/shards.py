"""WebDataset-style tar sharding — the de-facto shipping layout for
multimodal training corpora: a sample is the group of same-basename
members inside a POSIX tar ("000123.jpg" + "000123.txt" +
"000123.json"), and a corpus is a directory of sequentially numbered
shard tars a loader streams in order. Spark-side this is the terminal
layout step after dedup/quality/packing: the member table is plain
rows, the shard assignment is a column, and each executor writes its
own shards — no driver funnel, no shared state.

Pure stdlib ``tarfile`` on both sides. Writes are deterministic
(mtime 0, uid/gid 0, members sorted by (key, ext) within a shard) and
crash-safe, so a re-run produces byte-identical shards. Reads ride
Spark's binaryFile source: one row per shard file, fanned out to member
rows in an Arrow pass — a shard is the parallelism unit, which is the
format's own design point (shards are sized to stream, typically
100 MB–1 GB).

Paths are scheme-aware via ``pyarrow.fs`` (executor-side safe — no JVM
handle needed in the write task): plain paths and ``file://`` use the
local filesystem with attempt-unique tmp + atomic rename; object-store
schemes (``s3://``/``s3a://``/``gs://``/``gcs://``) publish with a
single direct PUT per shard, which those stores make atomic themselves
(readers never observe a partial object) — a tmp+rename dance there
would just double the write. ``hdfs://`` keeps tmp + rename. The tmp
name embeds the Spark task attempt number and a uuid so a retried or
speculative attempt of the same partition can never interleave with a
sibling attempt's half-written file.
"""

from __future__ import annotations

import io
import os
import tarfile
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEMBER_SCHEMA = (
    "shard string, key string, ext string, n_bytes bigint, content binary"
)
MANIFEST_SCHEMA = "shard string, n_members bigint, n_bytes bigint"

# schemes where a single-object PUT is atomic and rename is a copy —
# publish directly instead of tmp + rename (the same split dedup.py's
# manifest writer makes for its pointer flip)
_DIRECT_PUT_SCHEMES = {"s3", "s3a", "s3n", "gs", "gcs"}


def _split_scheme(path: str) -> tuple[str, str]:
    """(scheme, rest) — scheme is '' for plain local paths."""
    if "://" in path:
        scheme, rest = path.split("://", 1)
        return scheme.lower(), rest
    return "", path


def _shard_fs(path: str):
    """(pyarrow FileSystem, fs-local path, direct_put) for any supported
    URI. pyarrow.fs works executor-side (no py4j), unlike the driver's
    Hadoop FileSystem handle. s3a://, s3n:// and gcs:// are normalized
    to the schemes pyarrow registers (s3://, gs://)."""
    from pyarrow import fs as pafs

    scheme, rest = _split_scheme(path)
    if scheme == "":
        return pafs.LocalFileSystem(), path, False
    if scheme == "file":
        return pafs.LocalFileSystem(), "/" + rest.lstrip("/"), False
    norm = {"s3a": "s3", "s3n": "s3", "gcs": "gs"}.get(scheme, scheme)
    fs, p = pafs.FileSystem.from_uri(f"{norm}://{rest}")
    return fs, p, norm in _DIRECT_PUT_SCHEMES


def _publish(out_dir: str, name: str, data: bytes) -> None:
    """Write ``data`` as ``out_dir/name`` so readers never see a torn
    file: direct PUT where the store makes single-object writes atomic,
    attempt-unique tmp + atomic rename elsewhere."""
    fs, dir_path, direct = _shard_fs(out_dir)
    final = dir_path.rstrip("/") + "/" + name
    if direct:
        with fs.open_output_stream(final) as out:
            out.write(data)
        return
    try:
        from pyspark import TaskContext

        tc = TaskContext.get()
        attempt = tc.taskAttemptId() if tc is not None else 0
    except Exception:
        attempt = 0
    tmp = (
        dir_path.rstrip("/")
        + f"/.{name}.{attempt}-{uuid.uuid4().hex[:8]}.tmp"
    )
    with fs.open_output_stream(tmp) as out:
        out.write(data)
    try:
        fs.move(tmp, final)
    except OSError:
        # rename-to-existing is scheme-dependent: local rename
        # overwrites, HDFS-style filesystems refuse. A re-run (or a
        # retried attempt racing a completed sibling) produces
        # byte-identical shards by construction, so replace-and-retry
        # keeps the documented idempotent-republish contract instead of
        # aborting with tmp litter.
        fs.delete_file(final)
        fs.move(tmp, final)


def write_tar_shards(
    members: DataFrame,
    out_dir: str,
    n_shards: int,
    key_col: str = "key",
    ext_col: str = "ext",
    content_col: str = "content",
    shard_col: str | None = None,
) -> DataFrame:
    """Write member rows (key, ext, content) into ``n_shards`` POSIX tar
    shards under ``out_dir`` ("shard-000000.tar", ...), returning the
    manifest (shard, n_members, n_bytes) as a DataFrame. Shard
    assignment is ``shard_col`` if given (values must be 0..n_shards-1)
    else a deterministic hash of the key — NOT round-robin, so the
    layout is stable across re-runs and engines. Each member becomes
    "<key>.<ext>"; same-key members land in the same shard (WebDataset's
    grouping invariant) because assignment depends on the key alone.

    Executors write in parallel — the repartition puts each shard's
    rows in one task, the task builds the tar in memory (shards are
    loader-sized by construction: pick n_shards so corpus/n fits), and
    ``_publish`` makes each shard appear atomically on local, HDFS and
    object-store destinations alike."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    _ensure_dir(out_dir)
    shard_expr = (
        F.col(shard_col)
        if shard_col is not None
        else F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    )
    rows = members.select(
        shard_expr.cast("int").alias("__shard"),
        F.col(key_col).alias("key"),
        F.col(ext_col).alias("ext"),
        F.col(content_col).cast("binary").alias("content"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, list[tuple[str, str, bytes]]] = {}
        for pdf in batches:
            for sh, key, ext, content in zip(
                pdf["__shard"], pdf["key"], pdf["ext"], pdf["content"]
            ):
                acc.setdefault(int(sh), []).append(
                    (str(key), str(ext), bytes(content or b""))
                )
        out = []
        for sh, items in acc.items():
            items.sort(key=lambda t: (t[0], t[1]))
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w") as tf:
                for key, ext, content in items:
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(content)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tf.addfile(info, io.BytesIO(content))
            name = f"shard-{sh:06d}.tar"
            data = buf.getvalue()
            _publish(out_dir, name, data)
            out.append((name, len(items), len(data)))
        yield pd.DataFrame(out, columns=["shard", "n_members", "n_bytes"])

    # one task per shard id: the shuffle IS the shard layout
    return rows.repartition(n_shards, "__shard").mapInPandas(
        run, schema=MANIFEST_SCHEMA
    )


def _ensure_dir(out_dir: str) -> None:
    """Create the destination directory where that's a real concept
    (local/file/hdfs); object stores have no directories to create."""
    fs, path, direct = _shard_fs(out_dir)
    if not direct:
        fs.create_dir(path, recursive=True)


def read_tar_shards(spark, path: str) -> DataFrame:
    """Read a directory/glob of tar shards back to member rows (shard,
    key, ext, n_bytes, content) via the binaryFile source — one input
    row per shard, exploded in an Arrow pass, on any Hadoop-supported
    scheme (the binaryFile source carries the scheme handling). Member
    names without an extension get ext '' and the full name as key.
    Unreadable archives raise (a torn shard is data loss, not a row to
    skip — the writer's atomic publication makes them impossible in
    normal operation)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard", "key", "ext", "n_bytes", "content"]
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(str(p))
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(content)), mode="r"
                ) as tf:
                    for info in tf.getmembers():
                        if not info.isfile():
                            continue
                        data = tf.extractfile(info).read()
                        base, dot, ext = info.name.rpartition(".")
                        key = base if dot else info.name
                        out.append(
                            (shard, key, ext if dot else "", len(data), data)
                        )
            yield pd.DataFrame(out, columns=cols)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
        .mapInPandas(run, schema=MEMBER_SCHEMA)
    )


def group_samples(members: DataFrame) -> DataFrame:
    """(key, exts, sample): fold member rows back into WebDataset
    samples — one row per key with the sorted distinct extension list
    and an ext->content map. The loader-side view: a training sample is
    the whole group, and a key missing a modality is visible as a short
    ``exts`` list (filter on it for completeness gates).

    Duplicate (key, ext) members (the same member name present in two
    shards — a re-sharded corpus mid-migration) fold to ONE entry, the
    bytewise-min content, so the map build can never hit
    DUPLICATE_MAP_KEY at runtime: filter-don't-crash, and deterministic
    regardless of shard read order."""
    one_per_ext = members.groupBy("key", "ext").agg(
        F.min("content").alias("content")
    )
    return one_per_ext.groupBy("key").agg(
        F.array_sort(F.collect_list("ext")).alias("exts"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("ext", "content")))
        ).alias("sample"),
    )
