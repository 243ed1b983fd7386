"""Streaming sources.

- tail_source: the in_tail analog (plugins/in_tail/, ~7.7k LoC of glob
  scanning, rotation tracking, SQLite offset DB). In Spark the whole
  mechanism collapses to a file stream: glob discovery per micro-batch,
  offsets in the checkpoint, `maxFilesPerTrigger` as the rotation-scale
  valve, `input_file_name()` for the per-file context the reference keeps
  in its file state.
- dummy_source: in_dummy/in_random (synthetic records at a rate).
- kafka passthrough: in_kafka/out_kafka are native Spark connectors; the
  helper just standardizes the event envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluent_bit_spark.model import TAG_COL, TS_COL


def tail_source(
    spark: SparkSession,
    path_glob: str,
    fmt: str = "text",
    schema: T.StructType | str | None = None,
    tag_template: str = "tail.0",
    max_files_per_trigger: int | None = None,
    options: dict | None = None,
) -> DataFrame:
    """File-tail stream: each discovered file's lines/records become tagged
    events; `file` column carries the origin path (tail_file.c keeps this
    in per-file state). ``options`` passes reader options through — e.g.
    ``{"wholetext": "true"}`` to consume each file as ONE record (scrape
    pages, multiline payloads) instead of line-wise."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "text":
        reader = reader.schema("value string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    df = reader.format(fmt).load(path_glob)
    return (
        df.withColumn("file", F.input_file_name())
        .withColumn(TAG_COL, F.lit(tag_template))
        .withColumn(TS_COL, F.current_timestamp())
    )


def dummy_source(
    spark: SparkSession, rows_per_second: int = 10, tag: str = "dummy.0"
) -> DataFrame:
    """in_dummy analog: rate source re-shaped into the event envelope."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.lit(tag).alias(TAG_COL),
            F.col("timestamp").alias(TS_COL),
            F.col("value").alias("seq"),
        )
    )


def kafka_source(
    spark: SparkSession, bootstrap: str, topics: str, tag_from_topic: bool = True
) -> DataFrame:  # pragma: no cover - no broker in test env
    """in_kafka analog (plugins/in_kafka/): native connector, topic -> tag."""
    df = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topics)
        .load()
    )
    tag = F.col("topic") if tag_from_topic else F.lit("kafka.0")
    return df.select(
        tag.alias(TAG_COL),
        F.col("timestamp").alias(TS_COL),
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )


def random_source(
    spark: SparkSession,
    rows_per_second: int = 1,
    tag: str = "random.0",
    seed: int = 42,
) -> DataFrame:
    """in_random analog (plugins/in_random/random.c:52-105: one
    ``rand_value`` per interval). The reference draws from the OS entropy
    pool; a distributed engine needs reproducible values, so rand_value =
    xxhash64(seq, seed) — uniform over int64 and identical on re-run/retry
    (the property the engine actually needs from a test source)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.lit(tag).alias(TAG_COL),
            F.col("timestamp").alias(TS_COL),
            F.xxhash64(F.col("value"), F.lit(seed)).alias("rand_value"),
        )
    )


def head_source(
    spark: SparkSession,
    path: str,
    lines: int = 0,
    split_line: bool = False,
    key: str = "head",
    tag: str = "head.0",
) -> DataFrame:
    """in_head analog (plugins/in_head/in_head.c): the first ``lines``
    lines of each matched file, either as one record per file under
    ``key`` (joined) or one record per line (``split_line``,
    in_head.c:173-227). Batch source — the reference re-reads per
    interval; here one read per trigger/run is the engine's model."""
    # wholetext: one record per file, so line order is the file's byte order
    # (split files could interleave partition IDs and misorder line_no).
    # in_head reads a bounded buffer from the file head, so files are small
    # by construction and never need splitting.
    raw = spark.read.text(path, wholetext=True).withColumn("file", F.input_file_name())
    arr = F.split(F.col("value"), "\r\n|\r|\n")
    # a trailing newline yields one empty trailing element — drop it to
    # match line-reader semantics
    arr = F.when(
        (F.size(arr) > 1) & (F.element_at(arr, -1) == ""),
        F.slice(arr, 1, F.size(arr) - 1),
    ).otherwise(arr)
    df = raw.select(
        "file", F.posexplode(arr).alias("__p", "value")
    ).withColumn("__n", F.col("__p") + 1).drop("__p")
    if lines > 0:
        df = df.filter(F.col("__n") <= lines)
    if split_line:
        out = df.select(
            F.lit(tag).alias(TAG_COL),
            F.current_timestamp().alias(TS_COL),
            "file",
            F.col("__n").alias("line_no"),
            F.col("value").alias(key),
        )
    else:
        out = (
            df.groupBy("file")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("__n", "value"))),
                        lambda s: s["value"],
                    ),
                    "\n",
                ).alias(key)
            )
            .select(
                F.lit(tag).alias(TAG_COL),
                F.current_timestamp().alias(TS_COL),
                "file",
                key,
            )
        )
    return out


def exec_source(
    spark: SparkSession,
    records: list[dict] | None = None,
    tag: str = "exec.0",
    key: str = "exec",
    command: str | list[str] | None = None,
    allow_exec: bool = False,
    timeout_sec: float = 30.0,
    propagate_exit_code: bool = False,
) -> DataFrame:
    """in_exec analog (plugins/in_exec/in_exec.c): run a command, one
    record per stdout line under ``key``.

    Two modes:
    - captured (default): the caller supplies the output ``records`` — the
      envelope shape without any exec.
    - live (``command=`` + explicit ``allow_exec=True``): a DRIVER-side
      subprocess, mirroring the reference's collector-thread exec. Running
      commands is a cluster-policy decision, so it is opt-in and never
      executor-side. ``propagate_exit_code`` adds the exit code column
      (in_exec.c Propagate_Exit_Code).
    """
    exit_code = None
    if command is not None:
        if not allow_exec:
            raise PermissionError(
                "exec_source(command=...) requires allow_exec=True — running "
                "configured commands is an explicit opt-in (cluster policy)"
            )
        import subprocess

        proc = subprocess.run(
            command if isinstance(command, list) else ["/bin/sh", "-c", command],
            capture_output=True,
            text=True,
            timeout=timeout_sec,
        )
        records = proc.stdout.splitlines()
        exit_code = proc.returncode
    elif records is None:
        raise ValueError(
            "exec_source needs either captured `records` or a `command` "
            "with allow_exec=True; executor-side exec is never provided"
        )
    rows = [(tag, r if isinstance(r, str) else str(r)) for r in records]
    df = (
        spark.createDataFrame(rows, f"{TAG_COL} string, {key} string")
        .withColumn(TS_COL, F.current_timestamp())
    )
    if propagate_exit_code and exit_code is not None:
        df = df.withColumn("exit_code", F.lit(exit_code))
    return df


def warc_source(
    spark: SparkSession,
    path_glob: str,
    streaming: bool = True,
    tag_template: str = "warc.0",
    max_files_per_trigger: int | None = None,
    max_inflate: int | None = None,
    ts_from: str = "processing",
) -> DataFrame:
    """in_tail for crawl buckets: a directory (or glob) of .warc.gz /
    plain .warc files becomes a stream of PARSED WARC records — the
    on-disk CommonCrawl layout straight to typed rows. Each discovered
    file is read whole (binaryFile source), inflated member-by-member
    through the capped stdlib-zlib path, split by Content-Length
    framing, and parsed into (file, record_idx, warc_type, target_uri,
    warc_date, http_status, content_type, body) plus the tag/ts event
    envelope, so downstream chains (html_extract, the quality stack,
    dedup) compose unchanged in batch or streaming. ``streaming=False``
    returns the batch twin over the same files — identical plan after
    the source exchange.

    Scale shape: one whole-file read per archive (WARC members are not
    splittable mid-record), then Arrow-batched record explode — on a
    1000-executor cluster each executor owns whole archives, the
    natural crawl-bucket unit (~1 GB each). ``max_files_per_trigger``
    is the backpressure valve, exactly in_tail's rotation-scale knob.
    ``max_inflate`` caps one archive's inflated bytes (gzip-bomb guard;
    default 1 GB via warc_gz_records) — size it to your archives'
    INFLATED size (a ~1 GB compressed segment inflates to several GB),
    since a capped archive yields only its leading records (they carry
    truncated=true).

    ``ts_from``: 'processing' (default) stamps the event-envelope ts
    with current_timestamp(); 'warc_date' derives it from each record's
    WARC-Date header (ISO 8601, the actual CRAWL time) so event-time
    windowed aggregates + watermarks over a crawl stream work —
    downsampling fetch rates by when pages were fetched, not when the
    archive happened to be replayed. Records whose WARC-Date is missing
    or unparsable fall back to processing time (a NULL ts would
    silently drop them from watermarked aggregates)."""
    from fluent_bit_spark.extensions.html import warc_gz_records, warc_parse

    if ts_from not in ("processing", "warc_date"):
        raise ValueError(
            f"ts_from must be 'processing' or 'warc_date', got {ts_from!r}"
        )
    if streaming:
        reader = spark.readStream.format("binaryFile").schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    else:
        reader = spark.read.format("binaryFile")
    files = reader.load(path_glob).select(
        F.col("path").alias("file"), "content"
    )
    kwargs = {} if max_inflate is None else {"max_inflate": max_inflate}
    recs = warc_gz_records(
        files, content_col="content", id_col="file", id_type="string",
        **kwargs,
    )
    parsed = warc_parse(
        recs, raw_col="raw", id_col="file",
        extra_cols=("record_idx", "truncated"),
    ).withColumn(TAG_COL, F.lit(tag_template))
    ts = (
        warc_event_time()
        if ts_from == "warc_date"
        else F.current_timestamp()
    )
    return parsed.withColumn(TS_COL, ts)


def warc_event_time(col: str = "warc_date"):
    """The ts_from='warc_date' derivation (see warc_source): WARC-Date
    is ISO 8601 (WARC 1.0 whole-second 'Z', WARC 1.1 fractional, and
    the '+00:00' offset spelling writers emit) — try_to_timestamp (not
    to_timestamp, which RAISES under the ANSI default) NULLs unparsable
    input, and the coalesce falls back to processing time so malformed
    records keep flowing instead of vanishing at the watermark
    operator."""
    return F.coalesce(
        F.try_to_timestamp(F.col(col), F.lit("yyyy-MM-dd'T'HH:mm:ssX")),
        F.try_to_timestamp(F.col(col)),
        F.current_timestamp(),
    )
