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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking parameters stripped during canonicalization (utm_* plus the
# common click identifiers) — present in the published C4 cleanup regimes
_TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def url_parts(col: Column) -> dict[str, Column]:
    """Decompose a URL into scheme/host/port/path/query/fragment columns.
    Unparseable URLs (no ``://``, malformed scheme, empty authority)
    yield empty strings throughout — callers treat an empty host as
    invalid.

    Deliberately regex-light: an earlier single-regex version evaluated
    the full URL pattern once PER EXTRACTED GROUP (Catalyst does not CSE
    across regexp_extract calls) and measured ~18 µs/row; this form is
    substring_index/instr chains — codegen intrinsics — with regexes only
    on the short scheme/port fragments."""
    scheme_raw = F.substring_index(col, "://", 1)
    valid = (F.instr(col, "://") > 0) & scheme_raw.rlike(r"^[a-zA-Z][a-zA-Z0-9+.\-]*$")
    scheme = F.lower(scheme_raw)
    rest = col.substr(F.length(scheme_raw) + 4, F.length(col))
    frag_at = F.instr(rest, "#")
    nofrag = F.when(frag_at > 0, F.substring_index(rest, "#", 1)).otherwise(rest)
    fragment = F.when(frag_at > 0, rest.substr(frag_at, F.length(rest))).otherwise(F.lit(""))
    q_at = F.instr(nofrag, "?")
    query = F.when(q_at > 0, nofrag.substr(q_at, F.length(nofrag))).otherwise(F.lit(""))
    hostpath = F.substring_index(nofrag, "?", 1)
    hostport = F.lower(F.substring_index(hostpath, "/", 1))
    path = F.when(
        F.instr(hostpath, "/") > 0,
        hostpath.substr(F.length(hostport) + 1, F.length(hostpath)),
    ).otherwise(F.lit(""))
    port_raw = F.substring_index(hostport, ":", -1)
    has_port = (F.instr(hostport, ":") > 0) & port_raw.rlike(r"^\d+$")
    host = F.when(has_port, F.substring_index(hostport, ":", 1)).otherwise(hostport)
    blank = F.lit("")

    def guard(c):
        return F.when(valid, c).otherwise(blank)

    return {
        "scheme": guard(scheme),
        "host": guard(host),
        "port": guard(F.when(has_port, port_raw).otherwise(blank)),
        "path": guard(path),
        "query": guard(query),
        "fragment": guard(fragment),
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
    # collapse ALL trailing slashes in one pass ('/x//' and '///' must be
    # fixed points after one normalize), then restore the bare root
    stripped = F.regexp_replace(p["path"], r"/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
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


def with_canonical_url(
    df: DataFrame, url_col: str = "url", validity_col: str | None = None
) -> DataFrame:
    """Add ``norm_url`` + ``domain`` via STAGED projections.

    Same semantics as the Column-level url_normalize/registrable_domain,
    but each parse level materializes as a real column before the next
    references it. The Column form inlines its parent expression at every
    reference site, and F.when branches block codegen subexpression
    elimination — measured on the bench query, the nested Column tree
    expanded the source expression ~80x and ran 5x SLOWER than even the
    regex-per-group version. Staged selects keep every step evaluated
    once; this is the dataset-scale path (url_filter_dedup uses it).

    ``validity_col``: when set, also emit a cheap boolean validity column
    under that name. Filter on IT, never on ``norm_url != ''`` — the
    optimizer pushes filters below the projection by RE-SUBSTITUTING the
    filtered expression, so a norm_url predicate re-evaluates the whole
    canonicalization per row (measured 5x on the bench query), while the
    validity flag re-expands to two short-string checks."""
    u = F.col(url_col)
    s1 = df.select(
        "*",
        F.substring_index(u, "://", 1).alias("__scheme_raw"),
    )
    s2 = s1.select(
        "*",
        (
            (F.instr(u, "://") > 0)
            & F.col("__scheme_raw").rlike(r"^[a-zA-Z][a-zA-Z0-9+.\-]*$")
        ).alias("__valid"),
        F.lower(F.col("__scheme_raw")).alias("__scheme"),
        F.substring_index(
            u.substr(F.length("__scheme_raw") + 4, F.length(u)), "#", 1
        ).alias("__nofrag"),
    )
    s3 = s2.select(
        "*",
        F.instr(F.col("__nofrag"), "?").alias("__q_at"),
        F.substring_index(F.col("__nofrag"), "?", 1).alias("__hostpath"),
    )
    s4 = s3.select(
        "*",
        F.when(
            F.col("__q_at") > 0,
            F.col("__nofrag").substr(F.col("__q_at") + 1, F.length("__nofrag")),
        ).otherwise(F.lit("")).alias("__qbody"),
        F.lower(F.substring_index(F.col("__hostpath"), "/", 1)).alias("__hostport"),
    )
    s5 = s4.select(
        "*",
        F.when(
            F.instr(F.col("__hostpath"), "/") > 0,
            F.col("__hostpath").substr(
                F.length("__hostport") + 1, F.length("__hostpath")
            ),
        ).otherwise(F.lit("")).alias("__path"),
        F.substring_index(F.col("__hostport"), ":", -1).alias("__port_raw"),
        F.instr(F.col("__hostport"), ":").alias("__colon_at"),
    )
    s6 = s5.select(
        "*",
        ((F.col("__colon_at") > 0) & F.col("__port_raw").rlike(r"^\d+$")).alias("__has_port"),
    )
    s7 = s6.select(
        "*",
        F.when(
            F.col("__has_port"), F.substring_index(F.col("__hostport"), ":", 1)
        ).otherwise(F.col("__hostport")).alias("__host"),
        F.when(
            F.col("__has_port")
            & ~(
                ((F.col("__scheme") == "http") & (F.col("__port_raw") == "80"))
                | ((F.col("__scheme") == "https") & (F.col("__port_raw") == "443"))
            ),
            F.concat(F.lit(":"), F.col("__port_raw")),
        ).otherwise(F.lit("")).alias("__portsuf"),
        F.filter(
            F.split(F.col("__qbody"), "&"),
            lambda kv: (F.length(kv) > 0) & ~kv.rlike(_TRACKING_PARAM_RE),
        ).alias("__params"),
        # all trailing slashes at once (idempotence: '/x//' -> '/x',
        # '///' -> '/'), bare root restored from the empty remainder
        F.when(
            F.regexp_replace(F.col("__path"), r"/+$", "") == "", F.lit("/")
        ).otherwise(F.regexp_replace(F.col("__path"), r"/+$", "")).alias("__pathn"),
    )
    s8 = s7.select(
        "*",
        F.when(
            F.col("__valid") & (F.col("__host") != ""),
            F.concat(
                F.col("__scheme"), F.lit("://"), F.col("__host"),
                F.col("__portsuf"), F.col("__pathn"),
                F.when(
                    F.size("__params") > 0,
                    F.concat(
                        F.lit("?"), F.array_join(F.array_sort("__params"), "&")
                    ),
                ).otherwise(F.lit("")),
            ),
        ).otherwise(F.lit("")).alias("norm_url"),
        F.when(
            F.col("__valid"),
            F.regexp_extract(
                F.regexp_replace(F.col("__host"), r"^www\.", ""),
                r"([^.]+\.[^.]+)$", 1,
            ),
        ).otherwise(F.lit("")).alias("domain"),
        *(
            [(F.col("__valid") & (F.col("__host") != "")).alias(validity_col)]
            if validity_col
            else []
        ),
    )
    return s8.drop(
        "__scheme_raw", "__valid", "__scheme", "__nofrag", "__q_at",
        "__hostpath", "__qbody", "__hostport", "__path", "__port_raw",
        "__colon_at", "__has_port", "__host", "__portsuf", "__params",
        "__pathn",
    )


def url_filter_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocklist: tuple[str, ...] = (),
) -> DataFrame:
    """The full URL stage: normalize -> drop unparseable -> drop
    blocklisted domains -> keep the min-id row per canonical URL.

    Scale shape — and WHERE the filters sit, which dominated measured
    cost: the unparseable-URL drop runs at the SCAN on the raw column
    (instr + a short-string scheme regex — no canonicalization involved),
    the dedup is one min_by groupBy shuffle on the canonical URL (uniform
    key, map-side partial agg), and the residual filters (rare empty-host
    group, blocklist) run on the ~|distinct URLs| post-aggregation rows
    behind a pushdown barrier. Filtering mid-pipeline on norm_url/domain
    instead re-substitutes the whole canonicalization chain into the
    pushed-down predicate and re-evaluates it per input row — measured 5x
    wall-clock on the bench query."""
    u = F.col(url_col)
    pre = df.filter(
        (F.instr(u, "://") > 0)
        & F.substring_index(u, "://", 1).rlike(r"^[a-zA-Z][a-zA-Z0-9+.\-]*$")
    )
    canon = with_canonical_url(pre, url_col)
    keep_cols = canon.columns
    out = (
        canon.groupBy("norm_url")
        .agg(F.min_by(F.struct(*keep_cols), F.col(id_col)).alias("__r"))
        .select("__r.*")
    )
    residual = F.col("norm_url") != ""
    if blocklist:
        residual = residual & ~F.col("domain").isin(*blocklist)
    # `| rand() < -1` is always false but marks the predicate
    # nondeterministic, which pins the filter HERE (post-agg, tiny row
    # set) — otherwise Catalyst pushes it below the aggregate and the
    # projections, re-expanding norm_url/domain per input row
    return out.filter(residual | (F.rand(7) < F.lit(-1.0)))


def parse_robots(
    df: DataFrame,
    text_col: str = "robots_txt",
    domain_col: str = "domain",
) -> DataFrame:
    """Parse robots.txt files into (domain, rule, path_prefix) rows for
    the '*' user-agent group — the crawl-compliance table a fetch/filter
    stage joins against.

    Grouping follows the REP draft (RFC 9309) shape: consecutive
    User-agent lines open a group; Allow/Disallow lines belong to the
    open group; a group applies here when ANY of its agents is '*'.
    Comments (#) and blank lines are ignored; an empty Disallow ("allow
    all") contributes no row. Only literal path prefixes are emitted
    (wildcard-bearing rules are kept verbatim — robots_filter handles
    '*' and '$').

    Scale shape: posexplode the lines, one per-domain window pass to
    assign group ids (robots files are KBs, domains are many — the
    shuffle key is the domain, perfectly distributable), then a
    group-membership semi-join."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(text_col), r"\r?\n")).alias("pos", "line"),
    ).select(
        "domain", "pos",
        F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"),
    ).filter(F.col("line") != "")
    typed = lines.select(
        "domain", "pos",
        F.lower(F.regexp_extract("line", r"(?i)^(user-agent|allow|disallow)\s*:", 1)).alias("kind"),
        F.trim(F.regexp_extract("line", r"(?i)^[a-z-]+\s*:\s*(.*)$", 1)).alias("val"),
    ).filter(F.col("kind") != "")
    w = Window.partitionBy("domain").orderBy("pos")
    # a UA line that follows a non-UA line starts a NEW group; consecutive
    # UA lines share one
    grouped = typed.withColumn(
        "new_group",
        (
            (F.col("kind") == "user-agent")
            & (F.coalesce(F.lag("kind").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn("gid", F.sum("new_group").over(w))
    star_groups = (
        grouped.filter((F.col("kind") == "user-agent") & (F.col("val") == "*"))
        .select("domain", "gid")
        .distinct()
    )
    return (
        grouped.join(star_groups, ["domain", "gid"], "left_semi")
        .filter(F.col("kind").isin("allow", "disallow") & (F.col("val") != ""))
        .select("domain", F.col("kind").alias("rule"), F.col("val").alias("path_prefix"))
        .distinct()
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Keep URLs the '*'-agent rules permit, RFC 9309 precedence: among
    all matching rules the LONGEST path prefix wins; ties prefer Allow;
    no match = allowed. Rule paths support '*' (any chars) and a
    terminal '$' (end anchor), translated to regexes.

    Scale shape: the join is keyed on the registrable domain — rules per
    domain are few (robots files are small), so this is a skew-tolerant
    key join followed by a per-URL max-length argmax, never a cartesian
    over unrelated domains."""
    u = urls.withColumn("__dom", registrable_domain(F.col(url_col))).withColumn(
        "__path",
        F.coalesce(
            F.nullif(F.regexp_extract(url_col, r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1), F.lit("")),
            F.lit("/"),
        ),
    )
    r = rules.select(
        F.col("domain").alias("__dom"), "rule", "path_prefix",
        F.length("path_prefix").alias("__plen"),
        F.concat(
            F.lit("^"),
            F.regexp_replace(
                # escape regex metachars; '*' becomes .*, '$' stays a raw
                # end anchor (robots semantics — a mid-path literal '$'
                # is vanishingly rare and documented as unsupported)
                F.regexp_replace("path_prefix", r"([.^+?(){}\[\]\\|])", r"\\$1"),
                r"\*", ".*",
            ),
        ).alias("__re"),
    )
    joined = u.join(r, "__dom", "left")
    matched = joined.withColumn(
        "__hit",
        F.col("__re").isNotNull()
        & F.regexp_like(F.col("__path"), F.col("__re")),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*[u[c] for c in urls.columns], "__dom", "__path")
    best = (
        matched.withColumn(
            "__best",
            F.max(F.when(F.col("__hit"), F.col("__plen")).otherwise(-1)).over(w),
        )
        .withColumn(
            "__verdict",
            F.max(
                F.when(
                    F.col("__hit") & (F.col("__plen") == F.col("__best")),
                    F.when(F.col("rule") == "allow", 2).otherwise(1),
                ).otherwise(0)
            ).over(w),
        )
    )
    return (
        best.filter(F.col("__verdict") != 1)
        .select(*urls.columns)
        .distinct()
    )
