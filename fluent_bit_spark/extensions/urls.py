"""URL hygiene for corpus pipelines: parse, normalize, domain extraction,
blocklist filtering, URL-keyed dedup.

The C4/RefinedWeb-style preprocessing stage: crawled documents arrive
keyed by URL, and the first passes are (1) canonicalize the URL so the
same page crawled twice keys identically (case, default ports, tracking
params, trailing slashes), (2) extract the registrable domain for
blocklists and per-domain caps, (3) drop blocklisted domains, (4) keep
one document per canonical URL.

All deterministic Catalyst expressions — scan-speed projections with an
exact DuckDB replica for the oracle gate. Registrable-domain extraction
is the last-two-labels approximation (the public-suffix list is a data
file, not an algorithm; callers with the PSL can pass their own map).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"
# tracking parameters stripped during canonicalization (utm_* plus the
# common click identifiers) — present in the published C4 cleanup regimes
_TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def url_parts(col: Column) -> dict[str, Column]:
    """Decompose a URL into scheme/host/port/path/query/fragment columns.
    Unparseable URLs yield empty strings throughout (regexp_extract's
    no-match value) — callers treat an empty host as invalid."""
    scheme = F.lower(F.regexp_extract(col, _URL_RE, 1))
    hostport = F.lower(F.regexp_extract(col, _URL_RE, 2))
    return {
        "scheme": scheme,
        "host": F.regexp_replace(hostport, r":\d+$", ""),
        "port": F.regexp_extract(hostport, r":(\d+)$", 1),
        "path": F.regexp_extract(col, _URL_RE, 3),
        "query": F.regexp_extract(col, _URL_RE, 4),
        "fragment": F.regexp_extract(col, _URL_RE, 5),
    }


def url_normalize(col: Column) -> Column:
    """Canonical URL: lowercase scheme+host, default port stripped,
    fragment dropped, tracking params removed and the remaining query
    params SORTED (param order is transport noise), path '' -> '/' and
    trailing slash collapsed (except root). Empty result for URLs that
    don't parse."""
    p = url_parts(col)
    port = p["port"]
    keep_port = F.when(
        (port != "")
        & ~(
            ((p["scheme"] == "http") & (port == "80"))
            | ((p["scheme"] == "https") & (port == "443"))
        ),
        F.concat(F.lit(":"), port),
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(F.regexp_replace(p["query"], r"^\?", ""), "&"),
        lambda kv: (F.length(kv) > 0) & ~kv.rlike(_TRACKING_PARAM_RE),
    )
    query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(
        F.regexp_replace(p["path"], r"(.)/$", r"$1")
    )
    return F.when(
        p["host"] != "",
        F.concat(p["scheme"], F.lit("://"), p["host"], keep_port, path, query),
    ).otherwise(F.lit(""))


def registrable_domain(col: Column) -> Column:
    """Last-two-labels domain from a URL (www. stripped first): the
    blocklist/per-domain-cap key. An approximation of the public-suffix
    rules — exact for .com/.org/.net-style suffixes, one label short for
    ccSLDs like .co.uk (documented; PSL users join their own table)."""
    host = url_parts(col)["host"]
    bare = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_extract(bare, r"([^.]+\.[^.]+)$", 1)


def url_filter_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """The full URL stage: normalize -> drop unparseable -> drop
    blocklisted domains -> keep the min-id row per canonical URL.

    Scale shape: normalization/filtering are map-side; the dedup is ONE
    shuffle on the canonical URL (uniform key — URLs hash well), min-id
    window instead of groupBy+self-join, same pattern as exact_dedup."""
    out = df.withColumn("norm_url", url_normalize(F.col(url_col))).withColumn(
        "domain", registrable_domain(F.col(url_col))
    )
    out = out.filter(F.col("norm_url") != "")
    if blocklist:
        out = out.filter(~F.col("domain").isin(*blocklist))
    w = Window.partitionBy("norm_url")
    return (
        out.withColumn("__min_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("__min_id"))
        .drop("__min_id")
    )
