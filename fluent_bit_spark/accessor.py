"""Record-accessor path language -> Column expressions.

Reference grammar: src/record_accessor/ra.y:63-99 — paths like ``$key``,
``$key['sub']['sub2']``, ``$key[0]`` (string keys and integer array indexes,
arbitrarily deep), plus the pseudo-keys ``$TAG`` and ``$TAG[n]`` (the n-th
dot-separated tag part, src/flb_record_accessor.c).

Spark mapping: struct field / map key -> ``getField``/``getItem``; array
index -> ``getItem(int)``; ``$TAG[n]`` -> ``split(tag, '\\.')[n]``.

Resolution is schema-aware: a path that cannot resolve against the
DataFrame's schema yields ``None`` ("missing key"), which the condition
engine folds to FALSE — fluent-bit's missing-key semantics
(src/stream_processor/flb_sp.c: conditions on absent keys never match).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluent_bit_spark.model import TAG_COL

BODY_COL = "body"  # schemaless (VariantType) body column, if present

_PATH_RE = re.compile(
    r"""^\$?(?P<name>[A-Za-z_][A-Za-z0-9_]*)(?P<subs>(\[('[^']*'|"[^"]*"|\d+)\])*)$"""
)
_SUB_RE = re.compile(r"""\[('(?P<s1>[^']*)'|"(?P<s2>[^"]*)"|(?P<i>\d+))\]""")


@dataclass(frozen=True)
class RecordAccessor:
    """A parsed record-accessor path."""

    name: str
    subkeys: tuple = field(default_factory=tuple)  # str (map/struct key) or int (index)

    @property
    def is_tag(self) -> bool:
        return self.name.upper() == "TAG"

    def display(self) -> str:
        """Flattened output name fluent-bit style (last path element)."""
        if self.is_tag:
            return "TAG" if not self.subkeys else f"TAG[{self.subkeys[0]}]"
        if self.subkeys:
            last = self.subkeys[-1]
            return str(last)
        return self.name


def parse_accessor(path: str) -> RecordAccessor:
    """Parse ``$key['a'][0]`` / ``key['a'][0]`` / ``$TAG[1]`` / bare ``key``.

    The SP dialect allows subscripted keys without the ``$`` sigil
    (sql.y record_key; see tests/internal/include/sp_select_subkeys.h)."""
    path = path.strip()
    if not path.startswith("$") and "[" not in path:
        return RecordAccessor(name=path)
    m = _PATH_RE.match(path)
    if not m:
        raise ValueError(f"invalid record accessor: {path!r}")
    subs: list = []
    for sm in _SUB_RE.finditer(m.group("subs") or ""):
        if sm.group("i") is not None:
            subs.append(int(sm.group("i")))
        else:
            subs.append(sm.group("s1") if sm.group("s1") is not None else sm.group("s2"))
    return RecordAccessor(name=m.group("name"), subkeys=tuple(subs))


def _field_type(dtype: T.DataType, key) -> T.DataType | None:
    """Descend one step into a Spark type; None if impossible."""
    if isinstance(key, int):
        if isinstance(dtype, T.ArrayType):
            return dtype.elementType
        return None
    if isinstance(dtype, T.StructType):
        for f_ in dtype.fields:
            if f_.name == key:
                return f_.dataType
        return None
    if isinstance(dtype, T.MapType):
        return dtype.valueType
    return None


def resolve(df: DataFrame, acc: RecordAccessor) -> tuple[Column, T.DataType] | None:
    """Resolve an accessor against a DataFrame schema.

    Returns (column, leaf_type) or None when the path provably does not
    exist in the schema (missing key). Map-typed steps always resolve
    (existence only known at runtime -> NULL, which conditions treat as
    no-match).
    """
    if acc.is_tag:
        if TAG_COL not in df.columns:
            return None
        col: Column = F.col(TAG_COL)
        if acc.subkeys:
            idx = int(acc.subkeys[0])
            return F.split(col, r"\.").getItem(idx), T.StringType()
        return col, T.StringType()

    schema = df.schema
    names = {f_.name: f_.dataType for f_ in schema.fields}
    if acc.name not in names:
        # schemaless fallback: VariantType body column (fluent-bit's
        # msgpack record map). Missing key -> SQL NULL; explicit JSON null
        # -> variant-null — the distinction the reference's IS NULL tests
        # rely on (tests/internal/include/sp_select_keys.h cond_null).
        if BODY_COL in names and isinstance(names[BODY_COL], T.VariantType):
            path = "$." + acc.name + "".join(
                f"[{k}]" if isinstance(k, int) else f".{k}" for k in acc.subkeys
            )
            return F.try_variant_get(F.col(BODY_COL), path, "variant"), T.VariantType()
        return None
    col = F.col(acc.name)
    dtype: T.DataType = names[acc.name]
    for key in acc.subkeys:
        if isinstance(dtype, T.VariantType):
            path = f"$[{key}]" if isinstance(key, int) else f"$.{key}"
            col = F.try_variant_get(col, path, "variant")
            continue
        nxt = _field_type(dtype, key)
        if nxt is None:
            return None
        col = col.getItem(key) if not isinstance(dtype, T.StructType) else col.getField(str(key))
        dtype = nxt
    return col, dtype


# strftime -> Spark date_format token map (the subset fluent-bit's key
# templates use; see plugins/out_s3/s3.c flb_get_s3_key)
_STRFTIME_TOKENS = [
    ("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
    ("%H", "HH"), ("%M", "mm"), ("%S", "ss"), ("%j", "DDD"),
]


def tag_template(
    template: str,
    tag_col: str | Column = TAG_COL,
    ts_col: str | Column | None = None,
) -> Column:
    """Expand a fluent-bit key/stream/index template into a Column:
    ``$TAG[n]`` -> the n-th dot-delimited tag part, ``$TAG`` -> the whole
    tag, strftime tokens (%Y %m %d %H %M %S ...) -> the record timestamp
    formatted accordingly. The accessor semantics of flb_get_s3_key
    (plugins/out_s3/s3.c) / flb_pack_msgpack_extract_log_key's tag path,
    shared by the s3 / cloudwatch / es templated sinks."""
    tag = (F.col(tag_col) if isinstance(tag_col, str) else tag_col).cast("string")
    out = F.lit(template)
    for n in range(10):
        token = f"$TAG[{n}]"
        if token in template:
            # F.get: NULL (not ANSI error) for out-of-range parts
            out = F.replace(out, F.lit(token), F.coalesce(
                F.get(F.split(tag, r"\."), n), F.lit("")))
    if "$TAG" in template:
        out = F.replace(out, F.lit("$TAG"), tag)
    if ts_col is not None and "%" in template:
        ts = (F.col(ts_col) if isinstance(ts_col, str) else ts_col).cast("timestamp")
        for strf, sparkf in _STRFTIME_TOKENS:
            if strf in template:
                out = F.replace(out, F.lit(strf), F.date_format(ts, sparkf))
    return out


def exists(df: DataFrame, acc: RecordAccessor) -> Column:
    """@record.contains(key) semantics: key present (and non-null) in record.

    Reference: sql.y:363-368 / flb_sp_record_function_add. In a typed
    DataFrame a missing JSON key reads back as NULL, so presence ==
    isNotNull; a path absent from the schema is constant FALSE.
    """
    r = resolve(df, acc)
    if r is None:
        return F.lit(False)
    col, _ = r
    return col.isNotNull()
