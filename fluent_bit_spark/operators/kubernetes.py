"""filter_kubernetes: tag/journal -> pod metadata derivation + cached-API
enrichment, as Catalyst expressions plus one broadcast join.

Reference:
- kube_regex.h:25-30 — KUBE_TAG_TO_REGEX (pod_name/namespace_name/
  container_name/docker_id from the container-log file name embedded in the
  tag), KUBE_JOURNAL_TO_REGEX (from the journald CONTAINER_NAME key),
  DEPLOYMENT_REGEX (ReplicaSet name -> deployment).
- kube_meta.c:1786-1800 — the configured ``kube_tag_prefix`` (default
  ``kube.var.log.containers.``, kube_conf.h:66) is skipped BY LENGTH (no
  content check); a tag not longer than the prefix skips the filter.
- kube_meta.c:1855+ (extract_pod_meta) — regex results become the meta
  fields; the (namespace, podname[, container, docker_id]) tuple is the
  API-cache key. The cached API-server metadata (pod_id, host, labels,
  annotations, image, ownerReferences) is modeled here as a caller-provided
  ``pod_metadata`` DataFrame broadcast-joined on (namespace_name, pod_name)
  — the Spark analog of the TTL hash table the C filter keeps per worker.
- kube_meta.c:886-976 (search_workload) — workload = deployment name when
  the pod's owner is a ReplicaSet whose name matches DEPLOYMENT_REGEX,
  else the owner name, else podname, else container name.

Scale shape: the regex derivation is per-row codegen (regexp_extract);
the metadata join is an explicit ``broadcast`` (the pod table of a cluster
is dimension-sized: thousands of rows vs billions of log lines). No
shuffle of the log stream at any size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.model import TAG_COL

# kube_regex.h:25 — named groups renumbered (Java named groups reject '_'):
# 1=pod_name 2=namespace_name 3=container_name 4=docker_id
KUBE_TAG_TO_REGEX = (
    r"([a-z0-9](?:[-a-z0-9]*[a-z0-9])?(?:\.[a-z0-9](?:[-a-z0-9]*[a-z0-9])?)*)"
    r"_([^_]+)_(.+)-([a-z0-9]{64})\.log$"
)

# kube_regex.h:27 — 1=name_prefix 2=container_name 3=container_hash
# 4=pod_name 5=namespace_name
KUBE_JOURNAL_TO_REGEX = r"^([^_]+)_([^\._]+)(?:\.([^_]+))?_([^_]+)_([^_]+)_[^_]+_[^_]+$"

# kube_regex.h:29 — 1=deployment 2=replicaset hash id
DEPLOYMENT_REGEX = r"^(.+)-([bcdfghjklmnpqrstvwxz2456789]{6,10})$"

DEFAULT_KUBE_TAG_PREFIX = "kube.var.log.containers."  # kube_conf.h:66

_TAG_GROUPS = ("pod_name", "namespace_name", "container_name", "docker_id")
_JOURNAL_GROUPS = (
    "name_prefix",
    "container_name",
    "container_hash",
    "pod_name",
    "namespace_name",
)


def _extract_groups(src: Column, pattern: str, names: tuple[str, ...]) -> list[Column]:
    """One regexp_extract per named group, NULL when the pattern misses
    (regexp_extract returns '' on no-match; gate on rlike so an empty
    capture from a real match stays distinguishable)."""
    hit = src.rlike(pattern)
    return [
        F.when(hit, F.nullif(F.regexp_extract(src, pattern, i + 1), F.lit(""))).alias(n)
        for i, n in enumerate(names)
    ]


def kube_tag_meta(
    df: DataFrame,
    tag_col: str = TAG_COL,
    kube_tag_prefix: str = DEFAULT_KUBE_TAG_PREFIX,
) -> DataFrame:
    """Derive pod_name / namespace_name / container_name / docker_id from
    the container-log tag (kube_meta.c:1786-1800 + KUBE_TAG_TO_REGEX).

    The prefix is skipped by LENGTH, mirroring ``tag + kube_tag_len`` in C;
    a tag not longer than the prefix yields all-NULL meta (the reference
    skips the record)."""
    plen = len(kube_tag_prefix)
    # > plen, not > plen + 1: one character after the prefix is enough
    # for the C walk (tag_len > prefix_len) to attempt the regex
    rest = F.when(
        F.length(F.col(tag_col)) > plen, F.substring(F.col(tag_col), plen + 1, 1 << 30)
    )
    return df.select("*", *_extract_groups(rest, KUBE_TAG_TO_REGEX, _TAG_GROUPS))


def kube_journal_meta(df: DataFrame, container_name_col: str = "CONTAINER_NAME") -> DataFrame:
    """Journald mode (Use_Journal On): derive meta from the CONTAINER_NAME
    record key instead of the tag (kube_meta.c:1739-1782 +
    KUBE_JOURNAL_TO_REGEX)."""
    return df.select(
        "*", *_extract_groups(F.col(container_name_col), KUBE_JOURNAL_TO_REGEX, _JOURNAL_GROUPS)
    )


def workload_column(
    pod_name: Column,
    container_name: Column,
    owner_kind: Column,
    owner_name: Column,
) -> Column:
    """search_workload (kube_meta.c:886-976): ReplicaSet owners matching
    DEPLOYMENT_REGEX collapse to the deployment name; other owners pass
    through; otherwise fall back to pod then container name."""
    dep = F.nullif(F.regexp_extract(owner_name, DEPLOYMENT_REGEX, 1), F.lit(""))
    return (
        F.when(
            owner_name.isNotNull() & (owner_kind == "ReplicaSet"), F.coalesce(dep, owner_name)
        )
        .when(owner_name.isNotNull(), owner_name)
        .otherwise(F.coalesce(pod_name, container_name))
    )


def kubernetes_filter(
    df: DataFrame,
    pod_metadata: DataFrame | None = None,
    tag_col: str = TAG_COL,
    kube_tag_prefix: str = DEFAULT_KUBE_TAG_PREFIX,
    use_journal: bool = False,
    container_name_col: str = "CONTAINER_NAME",
    out_col: str = "kubernetes",
) -> DataFrame:
    """The filter_kubernetes pipeline stage: derive meta, enrich from the
    cached API table, pack the ``kubernetes`` struct.

    ``pod_metadata`` models the API-server cache: columns
    (namespace_name, pod_name) as the join key plus any of pod_id, host,
    container_image, labels, annotations, owner_kind, owner_name. It is
    always broadcast — the live-pod set is dimension-sized. Records whose
    tag yields no meta keep a NULL struct (the reference leaves the record
    untouched)."""
    meta = (
        kube_journal_meta(df, container_name_col)
        if use_journal
        else kube_tag_meta(df, tag_col, kube_tag_prefix)
    )
    fields: list[Column] = [F.col(c) for c in meta.columns if c not in df.columns]
    if pod_metadata is not None:
        dim_cols = [c for c in pod_metadata.columns if c not in ("namespace_name", "pod_name")]
        meta = meta.join(
            F.broadcast(pod_metadata), on=["namespace_name", "pod_name"], how="left"
        )
        fields += [F.col(c) for c in dim_cols if c not in ("owner_kind", "owner_name")]
        if "owner_kind" in dim_cols and "owner_name" in dim_cols:
            fields.append(
                workload_column(
                    F.col("pod_name"),
                    F.col("container_name"),
                    F.col("owner_kind"),
                    F.col("owner_name"),
                ).alias("workload")
            )
    packed = F.when(F.col("pod_name").isNotNull(), F.struct(*fields)).alias(out_col)
    return meta.select(*df.columns, packed)
