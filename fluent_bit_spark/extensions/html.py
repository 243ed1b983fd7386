"""HTML text extraction — the WET-creation step a crawl corpus pipeline
runs FIRST (C4/RefinedWeb start from extracted page text, not raw HTML).

Scan-speed approximation of a DOM extractor: script/style/comment blocks
are removed, the title captured, tags stripped, the common HTML entities
decoded, and whitespace collapsed — all Catalyst regexp/replace
expressions inside whole-stage codegen (no parser library, no UDF). The
documented contract is "boilerplate-light text extraction", not HTML5
spec parsing: malformed markup degrades to leftover text, never to an
error. Patterns are RE2-safe so other engines replay them verbatim.

Scale shape: pure per-row projection over the scan; zero shuffles at any
corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["strip_tags", "decode_entities", "html_extract", "warc_parse"]

# non-greedy block removals; (?is) = case-insensitive + dotall
_BLOCK_RES = (
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)

_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: earlier entities must not double-decode
)


def strip_tags(col: Column) -> Column:
    """Remove script/style/comment blocks, then every remaining tag
    (replaced by a space so adjacent words don't fuse)."""
    out = col
    for pat in _BLOCK_RES:
        out = F.regexp_replace(out, pat, " ")
    return F.regexp_replace(out, r"(?s)<[^>]+>", " ")


def decode_entities(col: Column) -> Column:
    """Decode the common named entities (&amp; last, so '&amp;lt;' yields
    the literal '&lt;' instead of double-decoding to '<')."""
    out = col
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return out


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, title, body, n_links): extracted page text plus the link count
    (the link-density input to quality rules like Gopher's). ``body`` is
    the tag-stripped, entity-decoded, whitespace-collapsed page text;
    ``title`` the first <title> element's decoded text ('' when absent)."""
    html = F.col(html_col)
    title = F.trim(
        decode_entities(
            F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)
        )
    )
    # body excludes the whole <head> (title/meta are not page text)
    no_head = F.regexp_replace(html, r"(?is)<head\b[^>]*>.*?</head>", " ")
    body = F.trim(
        F.regexp_replace(decode_entities(strip_tags(no_head)), r"\s+", " ")
    )
    n_links = F.size(F.regexp_extract_all(html, F.lit(r"(?i)<a\s"), 0))
    return df.select(
        F.col(id_col),
        title.alias("title"),
        body.alias("body"),
        n_links.cast("int").alias("n_links"),
    )


def warc_parse(
    df: DataFrame,
    raw_col: str = "raw",
    id_col: str = "doc_id",
) -> DataFrame:
    """Parse WARC response records (ISO 28500, the crawl-archive format
    corpus pipelines ingest) from a string column holding one record
    each: the WARC header block, the HTTP header block, and the payload
    are separated by blank lines (CRLF or LF — real archives mix both).

    Emits (id, warc_type, target_uri, warc_date, http_status,
    content_type, body). Missing headers are NULL; a record without two
    header blocks yields NULL status and the remainder as body. Pure
    Catalyst regexes — scan speed, chaining directly into html_extract
    for the WARC -> WET step."""
    raw = F.col(raw_col)

    def header(name):
        return F.nullif(
            F.regexp_extract(raw, rf"(?im)^{name}:[ \t]*([^\r\n]+)", 1), F.lit("")
        )

    # split off the WARC header block, then the HTTP header block; the
    # \A anchor makes each pattern match at most once
    after_warc = F.regexp_replace(raw, r"(?s)\A.*?\r?\n\r?\n", "")
    body = F.regexp_replace(after_warc, r"(?s)\A.*?\r?\n\r?\n", "")
    status = F.nullif(
        F.regexp_extract(after_warc, r"(?m)\AHTTP/[0-9.]+[ \t]+(\d{3})", 1),
        F.lit(""),
    ).cast("int")
    content_type = F.nullif(
        F.regexp_extract(
            after_warc, r"(?im)^Content-Type:[ \t]*([^\r\n;]+)", 1
        ),
        F.lit(""),
    )
    return df.select(
        F.col(id_col),
        header("WARC-Type").alias("warc_type"),
        header("WARC-Target-URI").alias("target_uri"),
        header("WARC-Date").alias("warc_date"),
        status.alias("http_status"),
        F.trim(content_type).alias("content_type"),
        body.alias("body"),
    )
