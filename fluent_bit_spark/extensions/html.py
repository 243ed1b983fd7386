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

__all__ = ["strip_tags", "decode_entities", "html_extract", "html_blocks",
           "revise_block_labels", "warc_parse", "warc_gz_records",
           "make_warc_gz", "make_warc_record"]

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
    n_links = F.size(F.regexp_extract_all(html, F.lit(r"(?i)<a[\s>/]"), 0))
    return df.select(
        F.col(id_col),
        title.alias("title"),
        body.alias("body"),
        n_links.cast("int").alias("n_links"),
    )


def html_blocks(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_link_density: float = 0.2,
    near_good_tokens: int | None = None,
) -> DataFrame:
    """jusText-style boilerplate classification (Pomikálek 2011, the
    block-level heuristic corpus pipelines run between WET extraction
    and quality scoring): the page splits at block-level tag OPENINGS
    (p/div/li/h1-6/td/blockquote), each block's text is tag-stripped
    and entity-decoded, and blocks are labeled by the two core jusText
    signals — link density (links per token; nav bars and footers are
    links with connective words) and length:

      link_density > ``max_link_density``  -> 'boilerplate'
      n_tokens     < ``min_tokens``        -> 'short'
      otherwise                            -> 'good'

    ``near_good_tokens`` (None keeps the two-class core) adds jusText's
    fourth context-free class: blocks that clear the density bar but
    sit in [min_tokens, near_good_tokens) are 'near_good' — medium
    paragraphs whose fate the CONTEXT pass (revise_block_labels)
    decides from their neighbours.

    Emits (id, block_idx, text, n_tokens, n_links, link_density,
    label); block_idx is the split position (0 = the pre-first-tag
    prefix), empty blocks drop. Downstream, `good` blocks re-join into
    the page's prose (html_extract keeps EVERYTHING — this is the
    filter that drops the chrome). The context-sensitive second pass of
    full jusText lives in revise_block_labels — chain it after this
    when near_good_tokens is set.

    Scale shape: split + posexplode + per-row regex counts — scan
    speed, no shuffle, no Python; runs at any corpus size."""
    html = F.col(html_col)
    segs = F.split(html, r"(?i)<(?:p|div|li|h[1-6]|td|blockquote)\b[^>]*>")
    out = df.select(
        F.col(id_col), F.posexplode(segs).alias("block_idx", "__seg")
    )
    text = F.trim(
        F.regexp_replace(decode_entities(strip_tags(F.col("__seg"))), r"\s+", " ")
    )
    # [\s>/] and not \s alone: attribute-less anchors (<a>) are valid
    # HTML and exactly the chrome this classifier exists to catch
    n_links = F.size(
        F.regexp_extract_all(F.col("__seg"), F.lit(r"(?i)<a[\s>/]"), 0)
    )
    out = out.select(
        id_col, "block_idx", text.alias("text"), n_links.alias("n_links")
    ).where(F.length("text") > 0)
    n_tokens = F.size(F.split(F.col("text"), " "))
    density = F.round(
        F.col("n_links").cast("double")
        / F.greatest(n_tokens, F.lit(1)).cast("double"),
        6,
    )
    label = (
        F.when(density > max_link_density, "boilerplate")
        .when(n_tokens < min_tokens, "short")
    )
    if near_good_tokens is not None:
        label = label.when(n_tokens < near_good_tokens, "near_good")
    label = label.otherwise("good")
    return out.select(
        id_col,
        F.col("block_idx").cast("int").alias("block_idx"),
        "text",
        n_tokens.cast("int").alias("n_tokens"),
        F.col("n_links").cast("int").alias("n_links"),
        density.alias("link_density"),
        label.alias("label"),
    )


def revise_block_labels(
    blocks: DataFrame,
    id_col: str = "doc_id",
    block_col: str = "block_idx",
    label_col: str = "label",
) -> DataFrame:
    """jusText's CONTEXT-SENSITIVE second pass (Pomikálek 2011 §3;
    mirrors revise_paragraph_classification in the published jusText
    implementation) over html_blocks output with the four-class labels
    (near_good_tokens set): 'good' and 'boilerplate' are final; every
    'short' and 'near_good' block is absorbed by its NEIGHBOURHOOD —

      short:     both nearest good/boilerplate neighbours good -> good;
                 both boilerplate -> boilerplate; mixed -> good only
                 when a near_good block stands between it and the
                 boilerplate side (the bridge rule), else boilerplate
      near_good: boilerplate on BOTH sides -> boilerplate; else good

    'Nearest neighbour' skips short (and, for the first lookup,
    near_good) blocks, exactly the paper's get_neighbour walk; a page
    boundary counts as boilerplate. That walk is last()/first() with
    ignorenulls over two frames of ONE (id, block_idx) window — pure
    Catalyst, no Python, one exchange on id (r11 verdict task #5: the
    pass previously documented out of envelope).

    Emits the input columns with ``label`` revised to good/boilerplate
    and the context-free class preserved as ``cf_label``."""
    from pyspark.sql import Window

    lbl = F.col(label_col)
    gb = F.when(lbl.isin("good", "boilerplate"), lbl)
    gnb = F.when(lbl.isin("good", "boilerplate", "near_good"), lbl)
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy(block_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy(id_col)
        .orderBy(block_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    bad = F.lit("boilerplate")
    prev_gb = F.coalesce(F.last(gb, ignorenulls=True).over(w_prev), bad)
    next_gb = F.coalesce(F.first(gb, ignorenulls=True).over(w_next), bad)
    prev_gnb = F.coalesce(F.last(gnb, ignorenulls=True).over(w_prev), bad)
    next_gnb = F.coalesce(F.first(gnb, ignorenulls=True).over(w_next), bad)
    revised = (
        F.when(lbl.isin("good", "boilerplate"), lbl)
        .when(
            lbl == "short",
            F.when((prev_gb == "good") & (next_gb == "good"), "good")
            .when(
                (prev_gb == "boilerplate") & (next_gb == "boilerplate"),
                "boilerplate",
            )
            .when(
                ((prev_gb == "boilerplate") & (prev_gnb == "near_good"))
                | ((next_gb == "boilerplate") & (next_gnb == "near_good")),
                "good",
            )
            .otherwise("boilerplate"),
        )
        .otherwise(  # near_good
            F.when(
                (prev_gb == "boilerplate") & (next_gb == "boilerplate"),
                "boilerplate",
            ).otherwise("good")
        )
    )
    keep = [c for c in blocks.columns if c != label_col]
    return blocks.select(
        *keep,
        lbl.alias("cf_label"),
        revised.alias(label_col),
    )


def warc_parse(
    df: DataFrame,
    raw_col: str = "raw",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
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
        *[F.col(c) for c in extra_cols],
        header("WARC-Type").alias("warc_type"),
        header("WARC-Target-URI").alias("target_uri"),
        header("WARC-Date").alias("warc_date"),
        status.alias("http_status"),
        F.trim(content_type).alias("content_type"),
        body.alias("body"),
    )


# --------------------------------------------------------------------------
# warc.gz ingestion — the ON-DISK crawl layout (ISO 28500 Annex): a .warc.gz
# is a concatenation of gzip MEMBERS, canonically one member per record so
# archives support random access. Reading it needs (a) member-by-member
# inflate (zlib.decompressobj exposes unused_data at each member boundary —
# no guessing at 1f8b magics inside compressed data) and (b) record
# splitting by the WARC Content-Length header (which also handles the
# non-canonical whole-file-one-member layout some writers emit). Both are
# pure stdlib over Arrow batches; records then chain into warc_parse /
# html_extract exactly like pre-split strings.
# --------------------------------------------------------------------------
#: Default inflation ceiling for one .warc.gz payload (1 GB). Crawl
#: payloads are untrusted: a kilobyte-sized gzip bomb otherwise expands
#: fully into executor memory — the claims-vs-payload bound the other
#: parsers carry. Legitimate archives larger than this (a whole-file
#: CommonCrawl segment inflates to several GB) should raise the knob via
#: warc_gz_records(max_inflate=...) / their own split — a capped payload
#: yields only its LEADING records (the torn tail drops in framing).
_GZIP_MAX_OUT = 1 << 30


def _gzip_members_ex(
    b: bytes, max_out: int = _GZIP_MAX_OUT
) -> tuple[bytes, bool]:
    """Inflate every gzip member of a concatenated stream into one plain
    byte blob (members are self-delimiting; a torn trailing member yields
    what it held). Non-gzip input passes through unchanged (a plain
    .warc). Output is capped at ``max_out`` bytes, and the compressed
    input is fed in bounded WINDOWS (1 MB in / at most 8 MB out per
    step) — passing the whole remaining buffer to decompress(data,
    max_length) makes zlib copy the remainder into unconsumed_tail on
    every step, which is quadratic in archive size (measured: 7.5 s for
    a 128 MB member vs 0.26 s single-shot). Returns (plain, capped):
    ``capped`` is True when inflation STOPPED at the cap with compressed
    data left over — downstream must be able to tell a complete archive
    from one that silently lost its tail records to the bomb guard."""
    import zlib

    if b[:2] != b"\x1f\x8b":
        return b, False
    out = bytearray()
    pos = 0
    chunk_in = 1 << 20
    step_out = 8 << 20
    while pos + 2 <= len(b) and b[pos : pos + 2] == b"\x1f\x8b":
        if len(out) >= max_out:
            return bytes(out), True  # cap hit with whole members left
        d = zlib.decompressobj(31)
        try:
            while not d.eof:
                chunk = b[pos : pos + chunk_in]
                if not chunk:
                    return bytes(out), False  # torn trailing member
                data = chunk
                while data:
                    out += d.decompress(
                        data, min(step_out, max_out - len(out))
                    )
                    if len(out) >= max_out and not d.eof:
                        return bytes(out), True  # cap hit mid-member
                    data = d.unconsumed_tail
                    if d.eof:
                        break
                pos += len(chunk)
                if d.eof:
                    pos -= len(d.unused_data)  # next member starts here
        except zlib.error:
            return bytes(out), False  # corrupt member: keep what inflated
    return bytes(out), False


def _gzip_members(b: bytes, max_out: int = _GZIP_MAX_OUT) -> bytes:
    """Plain-bytes twin of _gzip_members_ex (see there)."""
    return _gzip_members_ex(b, max_out)[0]


def _split_warc_records(b: bytes) -> list[bytes]:
    """Split a plain WARC byte stream into records by each record's
    Content-Length header (the spec's framing — payloads may contain
    blank lines and even 'WARC/' strings, so scanning for separators is
    wrong). Malformed tails drop; filter, don't crash."""
    import re as _re

    out: list[bytes] = []
    i = 0
    n = len(b)
    while i < n:
        j = b.find(b"WARC/", i)
        if j < 0:
            break
        he = b.find(b"\r\n\r\n", j)
        sep = 4
        alt = b.find(b"\n\n", j)
        if he < 0 or (0 <= alt < he and b[alt - 1 : alt] != b"\r"):
            he, sep = alt, 2
        if he < 0:
            break
        header = b[j:he]
        m = _re.search(rb"(?im)^Content-Length:[ \t]*(\d+)", header)
        if m is None:
            break
        clen = int(m.group(1))
        end = he + sep + clen
        if end > n:
            break  # torn trailing record
        out.append(b[j:end])
        i = end
    return out


def warc_gz_records(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    id_type: str = "long",
    max_inflate: int = _GZIP_MAX_OUT,
) -> DataFrame:
    """(id, record_idx, raw, truncated): explode a BINARY column of
    .warc.gz (or plain .warc) payloads into per-record strings — the
    step between `spark.read.format('binaryFile')` over a crawl bucket
    and `warc_parse`. Arrow-batched; unparseable payloads emit nothing.
    ``id_type`` sets the id column's Spark type (``string`` when the id
    is the source file path, as in streaming.sources.warc_source).
    ``max_inflate`` caps one payload's inflated bytes (gzip-bomb guard,
    default 1 GB): a payload hitting the cap yields only its LEADING
    records, each carrying ``truncated = true`` so the silent-loss case
    is detectable downstream (filter or alert on it) — size the cap to
    your archives' inflated size, or split oversized archives
    upstream."""
    from typing import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [id_col, "record_idx", "raw", "truncated"]
        for pdf in batches:
            out = []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                try:
                    plain, capped = _gzip_members_ex(
                        bytes(content or b""), max_inflate
                    )
                    recs = _split_warc_records(plain)
                except Exception:
                    continue
                for k, r in enumerate(recs):
                    out.append((rid, k, r.decode("utf-8", "replace"), capped))
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(
        run,
        schema=f"{id_col} {id_type}, record_idx int, raw string, "
               "truncated boolean",
    )


def make_warc_gz(
    records: list[str], per_record_members: bool = True
) -> bytes:
    """Fixture writer: records (header already carrying the correct
    Content-Length) gzip-compressed one member per record (the canonical
    layout) or as one whole-stream member."""
    import gzip as _gzip

    if per_record_members:
        return b"".join(
            _gzip.compress(r.encode("utf-8"), mtime=0) for r in records
        )
    return _gzip.compress("".join(records).encode("utf-8"), mtime=0)


def make_warc_record(
    warc_type: str,
    target_uri: str,
    body: str,
    http_status: int | None = 200,
    content_type: str = "text/html",
    date: str = "2024-01-01T00:00:00Z",
) -> str:
    """One spec-framed WARC record string (Content-Length covers the
    whole payload block, HTTP headers included for response records)."""
    if http_status is not None:
        payload = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {content_type}\r\n\r\n{body}"
        )
    else:
        payload = body
    header = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(payload.encode('utf-8'))}\r\n"
    )
    return header + "\r\n" + payload + "\r\n\r\n"
