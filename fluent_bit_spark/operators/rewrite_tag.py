"""filter_rewrite_tag: re-tag records whose field matches a regex.

Reference: plugins/filter_rewrite_tag/rewrite_tag.c:356-425 (rule apply),
:590-604 (config: ``$key REGEX NEW_TAG KEEP``). The new-tag template can
reference regex captures ($0..$9) and tag parts ($TAG, $TAG[n]). KEEP=true
re-emits the original record too (union) — the reference uses an internal
emitter input for the re-tagged copy.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fluent_bit_spark.accessor import parse_accessor, resolve
from fluent_bit_spark.model import TAG_COL

_REF_RE = re.compile(r"\$(\d)|\$TAG(?:\[(\d+)\])?|([^$]+)")


def _render_template(template: str, key_col: Column, pattern: str, tag_col: str) -> Column:
    parts: list[Column] = []
    for m in _REF_RE.finditer(template):
        if m.group(1) is not None:  # $n capture ref
            parts.append(F.regexp_extract(key_col.cast("string"), pattern, int(m.group(1))))
        elif m.group(0).startswith("$TAG"):
            if m.group(2) is not None:
                # F.get + empty-string coalesce, not getItem: a tag
                # with fewer dot-parts than the template asks for must
                # render the part as '' (not abort the job under the
                # ANSI default, and not NULL the whole concat) — same
                # choice as accessor.tag_template
                parts.append(F.coalesce(
                    F.get(F.split(F.col(tag_col), r"\."), int(m.group(2))),
                    F.lit(""),
                ))
            else:
                parts.append(F.col(tag_col))
        else:
            parts.append(F.lit(m.group(3)))
    return F.concat(*parts) if parts else F.lit(template)


def rewrite_tag(
    df: DataFrame,
    rules: list[tuple[str, str, str, bool]],
    tag_col: str = TAG_COL,
) -> DataFrame:
    """rules: [(key_accessor, regex, new_tag_template, keep)].

    First matching rule wins per record (reference applies rules in order,
    rewrite_tag.c:356). Matching records are re-tagged; with keep=True the
    original-tag copy is also retained.
    """
    out = df
    keep_union: list[DataFrame] = []
    new_tag = F.col(tag_col)
    matched_any = F.lit(False)
    for key, pattern, template, keep in rules:
        r = resolve(df, parse_accessor(key))
        if r is None:
            continue
        key_col = r[0]
        m = F.coalesce(key_col.cast("string").rlike(pattern), F.lit(False)) & ~matched_any
        rendered = _render_template(template, key_col, pattern, tag_col)
        new_tag = F.when(m, rendered).otherwise(new_tag)
        if keep:
            keep_union.append(df.filter(m))
        matched_any = matched_any | F.coalesce(
            key_col.cast("string").rlike(pattern), F.lit(False)
        )
    out = df.withColumn(tag_col, new_tag)
    for orig in keep_union:
        out = out.unionByName(orig)
    return out
