"""SparkSession factory tuned for this engine.

Local test profile is ``local[N]`` but every knob is chosen to survive a
1000-executor cluster: AQE on (runtime re-plan, skew-join splitting,
partition coalescing), Arrow enabled for the pandas-UDF escape hatch, UTC
session timezone so results are reproducible against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "fluent_bit_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    At 100 TB the same settings hold: AQE chooses broadcast vs shuffle joins
    at runtime and splits skewed partitions; ``shuffle_partitions`` is only
    the pre-AQE starting point (AQE coalesces down / splits up).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Python workers must be able to import this package even when the
    # driver only put it on sys.path at runtime (cloudpickle serializes
    # module-level functions by reference). Locally that's the worker
    # PYTHONPATH; on a real cluster the same need is met by --py-files /
    # spark.submit.pyFiles shipping the package.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + pypath if pypath else "")
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # ns-precision parquet timestamps (events.ts) read as long;
        # model.load_table converts ns -> us (same truncation DuckDB applies)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # streaming state (windows, applyInPandasWithState throttle/
        # snapshot/multiline) goes to RocksDB: bounded heap at large key
        # cardinality, changelog checkpointing keeps commits incremental
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
