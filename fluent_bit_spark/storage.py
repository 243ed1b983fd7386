"""Dataset layout: partitioned, size-targeted, sorted parquet writes.

At 100 TB the storage layout IS the query plan: partition directories
give Catalyst partition pruning (a time/tag predicate never lists the
other directories), bounded file sizes keep task granularity even
(no 10 GB stragglers, no million-file listings), and sorting within
files clusters values so parquet row-group min/max statistics skip IO
for selective predicates. The reference's closest analog is out_s3's
$TAG-templated object keys + ~fixed upload sizes (plugins/out_s3/s3.c,
total_file_size); this module is that idea expressed as a Spark
dataset-layout contract.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_dataset(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    target_rows_per_file: int | None = None,
    approx_rows: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    compression: str | None = None,
    spread_factor: int = 4,
) -> None:
    """Write ``df`` as a pruned-layout dataset.

    - ``partition_by``: directory-partition columns (low-cardinality —
      date buckets, tag, source). Queries filtering on them prune at the
      file listing, before any IO.
    - ``sort_by``: cluster rows inside each file so row-group min/max
      statistics skip non-matching groups (poor man's z-order for one
      dimension; for the common (time, key) telemetry predicates sort by
      time first).
    - ``target_rows_per_file``: bound file sizes two ways — a
      repartition to ceil(approx_rows/target) shuffles the data into
      evenly-sized tasks (``approx_rows`` defaults to a cheap count), and
      ``maxRecordsPerFile`` caps stragglers a skewed partition column
      would otherwise produce.
    - ``spread_factor``: with ``partition_by``, bounds how many tasks a
      single partition value may land in (so file count scales
      ~spread_factor x n_partition_values, not parts x n_values — the
      unbounded spread was a small-files regression for many-valued
      partition columns like daily dates).
    """
    writer_df = df
    if target_rows_per_file:
        n = approx_rows if approx_rows is not None else df.count()
        parts = max(1, math.ceil(n / target_rows_per_file))
        if partition_by:
            # hash on (partition cols, spread bucket): the spread component
            # lets a hot partition value occupy multiple tasks — hashing on
            # the partition cols alone would pin each value to ONE task, so
            # maxRecordsPerFile could split its files but never its task.
            # Keyed on the sort columns when given (deterministic, and
            # pre-clusters the in-file sort) else on all columns.
            spread_src = [F.col(c) for c in (sort_by or df.columns)]
            n_spread = max(1, min(parts, int(spread_factor)))
            spread = F.pmod(F.xxhash64(*spread_src), F.lit(n_spread)).cast("int")
            writer_df = df.repartition(parts, *partition_by, spread)
        else:
            writer_df = df.repartition(parts)
    if sort_by:
        writer_df = writer_df.sortWithinPartitions(*sort_by)
    w = writer_df.write.mode(mode).format(fmt)
    if target_rows_per_file:
        w = w.option("maxRecordsPerFile", target_rows_per_file)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def with_date_bucket(
    df: DataFrame, ts_col: str = "ts", col_name: str = "dt"
) -> DataFrame:
    """Standard telemetry partition column: the event date as a string
    (directory-friendly, prunable by `dt >= '...'` range predicates)."""
    return df.withColumn(col_name, F.date_format(F.col(ts_col), "yyyy-MM-dd"))


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (hash-clustered) managed table.

    Bucketing pre-shuffles the data at write time: two tables bucketed on
    the same key with the same bucket count join WITHOUT a runtime
    exchange, and aggregations on the bucket key skip their shuffle too.
    The right call for the repeatedly-joined big fact tables (events by
    user_id, lineitem by orderkey) where one write-time shuffle amortizes
    over every downstream query. Requires saveAsTable (bucket metadata
    lives in the catalog, not the parquet files).
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    w = w.sortBy(*(sort_by or bucket_by))
    w.saveAsTable(table)


def zorder_key(a, b, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative int columns into
    one long sort key: sorting by it clusters BOTH dimensions, so parquet
    row-group min/max stats skip IO for predicates on either column —
    the multi-dimensional upgrade to a single-column sortWithinPartitions.

    Pure Catalyst bit arithmetic (shiftleft/or), codegen'd; ``bits`` per
    dimension (<= 31). Quantize continuous domains to ints first (e.g.
    seconds-since-epoch bucket, hashed key mod 2^bits).
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in 1..31")
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    a = a.cast("long")
    b = b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        key = (
            key.bitwiseOR(F.shiftleft(abit, 2 * i))
            .bitwiseOR(F.shiftleft(bbit, 2 * i + 1))
        )
    return key


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    hash_cols: list[str] | None = None,
) -> DataFrame:
    """Content diff between two dataset versions: (id, status) with
    status in added / removed / modified / unchanged — the audit step
    between corpus releases ("what changed since v3?") and the input to
    incremental re-processing (only touch added+modified).

    Rows are compared by an md5 over the named columns' canonical JSON
    (default: every shared non-id column). Scale shape: each side reduces
    to (id, hash) at scan speed, then ONE full-outer shuffle join on the
    id — no content moves through the shuffle."""
    if hash_cols is None:
        shared = [c for c in new.columns if c in set(old.columns)]
        hash_cols = sorted(c for c in shared if c != id_col)
    if not hash_cols:
        raise ValueError("no columns to compare")

    def hashed(df, alias):
        return df.select(
            F.col(id_col),
            F.md5(
                F.to_json(F.struct(*[F.col(c) for c in hash_cols]))
            ).alias(alias),
        )

    o = hashed(old, "__ho")
    n = hashed(new, "__hn")
    j = o.join(n, id_col, "full")
    status = (
        F.when(F.col("__ho").isNull(), "added")
        .when(F.col("__hn").isNull(), "removed")
        .when(F.col("__ho") != F.col("__hn"), "modified")
        .otherwise("unchanged")
    )
    return j.select(F.col(id_col), status.alias("status"))
