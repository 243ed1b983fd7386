"""Small filters: alter_size, static metadata enrichment, stdout debug.

Reference: plugins/filter_alter_size/ (take/drop the first N records of
each chunk — debug sampling), plugins/filter_aws/ / filter_ecs/ /
filter_sysinfo/ (attach environment metadata key-values resolved on the
driver), filter_stdout (debug passthrough print).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fluent_bit_spark.model import TAG_COL


def alter_size(
    df: DataFrame,
    n: int,
    op: str = "take",
    key: str = TAG_COL,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Keep ('take') or drop ('drop') the first n records per key group
    in order_by order — the per-chunk sampling filter. One keyed window,
    no global sort."""
    order = [F.col(c) for c in (order_by or [key])]
    w = Window.partitionBy(key).orderBy(*order)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    keep = F.col("__rn") <= n if op == "take" else F.col("__rn") > n
    return ranked.filter(keep).drop("__rn")


def static_metadata(df: DataFrame, values: dict[str, object], prefix: str = "") -> DataFrame:
    """Attach driver-resolved environment metadata as literal columns
    (the aws/ecs/sysinfo enrichment shape: constants per pipeline run,
    zero per-row cost after constant folding)."""
    for k, v in values.items():
        df = df.withColumn(f"{prefix}{k}", F.lit(v))
    return df


def debug_stdout(df: DataFrame, n: int = 20) -> DataFrame:
    """filter_stdout passthrough: print a sample, return df unchanged."""
    df.show(n, truncate=False)
    return df
