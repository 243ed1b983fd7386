"""processor_opentelemetry_envelope: wrap bare logs in OTel group structure.

Reference: plugins/processor_opentelemetry_envelope/otel_envelope.c:39-127 —
prepends a group-start record carrying {resource: {}, scope: {}} metadata
with resource_id=0 / scope_id=0, so downstream OTLP encoders know each
record's resource/scope.

Spark mapping (SURVEY §1.5 "log event groups"): no interleaved marker rows
— every record carries a ``group_metadata`` struct column instead (schema
over streams beats in-band markers; a groupBy(resource_id, scope_id)
reconstitutes the envelope exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def otel_envelope(
    df: DataFrame,
    resource_attributes: dict[str, str] | None = None,
    scope_name: str | None = None,
    scope_version: str | None = None,
) -> DataFrame:
    """Attach OTel resource/scope envelope columns to each record."""
    res_entries = []
    for k, v in (resource_attributes or {}).items():
        res_entries.extend([F.lit(k), F.lit(v)])
    resource = (
        F.create_map(*res_entries)
        if res_entries
        else F.create_map().cast("map<string,string>")
    )
    scope = F.struct(
        F.lit(scope_name).cast("string").alias("name"),
        F.lit(scope_version).cast("string").alias("version"),
    )
    meta = F.struct(
        F.lit(0).cast("long").alias("resource_id"),
        F.lit(0).cast("long").alias("scope_id"),
    )
    return (
        df.withColumn("group_metadata", meta)
        .withColumn("resource", resource)
        .withColumn("scope", scope)
    )


def explode_groups(df: DataFrame) -> DataFrame:
    """Inverse view: one row per (resource_id, scope_id) group with its
    record count — the OTLP envelope boundary reconstruction."""
    return df.groupBy(
        F.col("group_metadata.resource_id").alias("resource_id"),
        F.col("group_metadata.scope_id").alias("scope_id"),
    ).agg(F.count(F.lit(1)).alias("n_records"))
