"""Tokenizer + recursive-descent parser for the SP SQL dialect.

Grammar source: src/stream_processor/parser/sql.y (rules cited inline) and
lexer sql.l. Statements:

  CREATE STREAM name [WITH (k='v',...)] AS <select>          (sql.y:109-121)
  CREATE SNAPSHOT name [WITH (...)] AS <select>              (sql.y:122-132)
  FLUSH SNAPSHOT name AS <select>                            (sql.y:134-144)
  SELECT keys FROM source [WHERE cond]
         [WINDOW TUMBLING (n UNIT) | HOPPING (n UNIT, ADVANCE BY m UNIT)]
         [GROUP BY keys] [LIMIT n] ';'                       (sql.y:146-278)

Keys: '*', bare identifiers, record-accessor paths ($key['a'][0]), AS
aliases, aggregates AVG/SUM/COUNT/MIN/MAX, TIMESERIES_FORECAST(k, t),
NOW(), UNIX_TIMESTAMP(), RECORD_TAG(), RECORD_TIME().
Conditions: =, !=, <>, <, <=, >, >=, AND, OR, NOT, parens, IS [NOT] NULL,
@record.contains(key), @record.time(), literals (bool/int/float/'string').
"""

from __future__ import annotations

import re

from fluent_bit_spark.accessor import RecordAccessor, parse_accessor
from fluent_bit_spark.sp import ast

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<float>\d+\.\d+)
  | (?P<int>\d+)
  | (?P<string>'(?:[^'\\]|\\.)*')
  | (?P<accessor>\$[A-Za-z_][A-Za-z0-9_]*(?:\[(?:'[^']*'|"[^"]*"|\d+)\])*
                |[A-Za-z_][A-Za-z0-9_]*(?:\[(?:'[^']*'|"[^"]*"|\d+)\])+)
  | (?P<record>@record\.(?:contains|time))
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
  | (?P<op><>|!=|<=|>=|=|<|>)
  | (?P<punct>[(),;*:])
    """,
    re.VERBOSE,
)

KEYWORDS = {
    "SELECT", "FROM", "WHERE", "WINDOW", "GROUP", "BY", "LIMIT", "AS",
    "AND", "OR", "NOT", "IS", "NULL", "TRUE", "FALSE",
    "CREATE", "STREAM", "SNAPSHOT", "FLUSH", "WITH",
    "TUMBLING", "HOPPING", "ADVANCE",
    "SECOND", "MINUTE", "HOUR", "TAG",
}

_UNIT_SEC = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600}


class Token:
    __slots__ = ("kind", "value")

    def __init__(self, kind: str, value: str):
        self.kind = kind
        self.value = value

    def __repr__(self):  # pragma: no cover
        return f"Token({self.kind},{self.value!r})"


def tokenize(text: str) -> list[Token]:
    toks: list[Token] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise SyntaxError(f"SP parse error at offset {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        val = m.group()
        if kind == "ident" and val.upper() in KEYWORDS:
            toks.append(Token("kw", val))  # original case kept; compared upper
        else:
            toks.append(Token(kind, val))
    toks.append(Token("eof", ""))
    return toks


class Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0

    # -- token helpers ---------------------------------------------------
    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, value: str | None = None) -> Token | None:
        t = self.peek()
        tv = t.value.upper() if kind == "kw" else t.value
        if t.kind == kind and (value is None or tv == value):
            return self.next()
        return None

    def expect(self, kind: str, value: str | None = None) -> Token:
        t = self.accept(kind, value)
        if t is None:
            got = self.peek()
            raise SyntaxError(f"expected {value or kind}, got {got.value!r}")
        return t

    def accept_kw(self, kw: str) -> bool:
        return self.accept("kw", kw) is not None

    def expect_kw(self, kw: str) -> None:
        self.expect("kw", kw)

    # -- grammar -----------------------------------------------------------
    def _ident(self) -> str:
        """Identifier position: plain idents plus non-reserved keywords
        (a column may be named 'tag', a stream 'window', ...)."""
        t = self.peek()
        if t.kind in ("ident", "kw"):
            return self.next().value
        raise SyntaxError(f"expected identifier, got {t.value!r}")

    def parse(self) -> ast.Command:
        if self.peek().kind == "kw" and self.peek().value.upper() == "CREATE":
            cmd = self._create()
        elif self.peek().kind == "kw" and self.peek().value.upper() == "FLUSH":
            cmd = self._flush_snapshot()
        else:
            cmd = ast.Command(kind="select", select=self._select())
        self.accept("punct", ";")
        self.expect("eof")
        return cmd

    def _create(self) -> ast.Command:
        self.expect_kw("CREATE")
        if self.accept_kw("STREAM"):
            kind = "create_stream"
        else:
            self.expect_kw("SNAPSHOT")
            kind = "create_snapshot"
        name = self._ident()
        props: dict = {}
        if self.accept_kw("WITH"):
            self.expect("punct", "(")
            while True:
                k = self._ident()
                self.expect("op", "=")
                v = self._string_value(self.expect("string").value)
                props[k] = v
                if not self.accept("punct", ","):
                    break
            self.expect("punct", ")")
        self.expect_kw("AS")
        return ast.Command(kind=kind, name=name, props=props, select=self._select())

    def _flush_snapshot(self) -> ast.Command:
        self.expect_kw("FLUSH")
        self.expect_kw("SNAPSHOT")
        name = self._ident()
        self.expect_kw("AS")
        return ast.Command(kind="flush_snapshot", name=name, select=self._select())

    def _select(self) -> ast.Select:
        self.expect_kw("SELECT")
        keys = self._keys()
        self.expect_kw("FROM")
        source = self._source()
        where = None
        window = None
        group_by: list[RecordAccessor] = []
        limit = None
        # the reference grammar permits WINDOW both before and after WHERE
        # (sp_window.h queries use 'WINDOW ... WHERE ...'); accept clauses
        # in any order
        while True:
            if where is None and self.accept_kw("WHERE"):
                where = self._expr()
            elif window is None and self.accept_kw("WINDOW"):
                window = self._window()
            elif not group_by and self.accept_kw("GROUP"):
                self.expect_kw("BY")
                group_by = [self._accessor_token()]
                while self.accept("punct", ","):
                    group_by.append(self._accessor_token())
            elif limit is None and self.accept_kw("LIMIT"):
                limit = int(self.expect("int").value)
            else:
                break
        sel = ast.Select(
            keys=keys, source=source, where=where, window=window,
            group_by=group_by, limit=limit,
        )
        _validate(sel)
        return sel

    def _keys(self) -> list[ast.SelectKey]:
        keys = [self._key()]
        while self.accept("punct", ","):
            keys.append(self._key())
        return keys

    def _key(self) -> ast.SelectKey:
        if self.accept("punct", "*"):
            return ast.SelectKey(kind="star")
        t = self.peek()
        # aggregate / time / record functions are plain idents followed by (
        if t.kind == "ident" and self.toks[self.i + 1].kind == "punct" and self.toks[self.i + 1].value == "(":
            fname = t.value.upper()
            if fname in ast.AGG_FUNCS:
                self.next()
                self.expect("punct", "(")
                if fname == "TIMESERIES_FORECAST":
                    acc = self._accessor_token()
                    self.expect("punct", ",")
                    num = self.accept("float") or self.expect("int")
                    offset = float(num.value)
                    self.expect("punct", ")")
                    return ast.SelectKey(
                        kind="agg", func=fname, accessor=acc,
                        forecast_offset=offset, alias=self._alias(),
                    )
                if self.accept("punct", "*"):
                    self.expect("punct", ")")
                    return ast.SelectKey(kind="agg", func=fname, count_star=True, alias=self._alias())
                acc = self._accessor_token()
                self.expect("punct", ")")
                return ast.SelectKey(kind="agg", func=fname, accessor=acc, alias=self._alias())
            if fname in ast.TIME_FUNCS or fname in ast.RECORD_FUNCS:
                self.next()
                self.expect("punct", "(")
                self.expect("punct", ")")
                return ast.SelectKey(kind="func", func=fname, alias=self._alias())
        acc = self._accessor_token()
        return ast.SelectKey(kind="key", accessor=acc, alias=self._alias())

    def _alias(self) -> str | None:
        if self.accept_kw("AS"):
            return self._ident()
        return None

    def _accessor_token(self) -> RecordAccessor:
        t = self.peek()
        if t.kind == "accessor":
            self.next()
            return parse_accessor(t.value)
        if t.kind in ("ident", "kw"):
            self.next()
            return RecordAccessor(name=t.value)
        raise SyntaxError(f"expected key, got {t.value!r}")

    def _source(self) -> ast.Source:
        # STREAM:name | TAG:'pattern'   (sql.y:240-250)
        kw = self.expect("kw")
        if kw.value.upper() not in ("STREAM", "TAG"):
            raise SyntaxError(f"expected STREAM: or TAG:, got {kw.value}")
        self.expect("punct", ":")
        if kw.value.upper() == "STREAM":
            return ast.Source(kind="stream", name=self._ident())
        pat = self._string_value(self.expect("string").value)
        return ast.Source(kind="tag", name=pat)

    def _window(self) -> ast.WindowSpec:
        if self.accept_kw("TUMBLING"):
            self.expect("punct", "(")
            n = int(self.expect("int").value)
            unit = self.expect("kw").value.upper()
            self.expect("punct", ")")
            return ast.WindowSpec(kind="tumbling", size_sec=n * _UNIT_SEC[unit])
        self.expect_kw("HOPPING")
        self.expect("punct", "(")
        n = int(self.expect("int").value)
        unit = self.expect("kw").value.upper()
        self.expect("punct", ",")
        self.expect_kw("ADVANCE")
        self.expect_kw("BY")
        m = int(self.expect("int").value)
        unit2 = self.expect("kw").value.upper()
        self.expect("punct", ")")
        return ast.WindowSpec(
            kind="hopping", size_sec=n * _UNIT_SEC[unit], advance_sec=m * _UNIT_SEC[unit2]
        )

    # -- conditions (sql.y:279-373) -----------------------------------------
    def _expr(self) -> ast.Expr:
        return self._or()

    def _or(self) -> ast.Expr:
        left = self._and()
        while self.accept_kw("OR"):
            left = ast.Logic(op="OR", left=left, right=self._and())
        return left

    def _and(self) -> ast.Expr:
        left = self._not()
        while self.accept_kw("AND"):
            left = ast.Logic(op="AND", left=left, right=self._not())
        return left

    def _not(self) -> ast.Expr:
        if self.accept_kw("NOT"):
            return ast.Not(operand=self._not())
        return self._predicate()

    def _predicate(self) -> ast.Expr:
        left = self._operand()
        t = self.peek()
        if t.kind == "op":
            op = self.next().value
            right = self._operand()
            return ast.Cmp(op=op, left=left, right=right)
        if t.kind == "kw" and t.value.upper() == "IS":
            self.next()
            negated = self.accept_kw("NOT")
            self.expect_kw("NULL")
            return ast.IsNull(operand=left, negated=bool(negated))
        # bare key/function = truthiness (e.g. @record.contains(k) alone)
        return left

    def _operand(self) -> ast.Expr:
        t = self.peek()
        if t.kind == "punct" and t.value == "(":
            self.next()
            e = self._expr()
            self.expect("punct", ")")
            return e
        if t.kind == "record":
            self.next()
            fn = t.value.split(".", 1)[1].upper()  # CONTAINS | TIME
            self.expect("punct", "(")
            key = None
            if fn == "CONTAINS":
                key = self._accessor_token()
            self.expect("punct", ")")
            return ast.RecordFunc(name=fn, key=key)
        if t.kind == "float":
            self.next()
            return ast.Lit(float(t.value))
        if t.kind == "int":
            self.next()
            return ast.Lit(int(t.value))
        if t.kind == "string":
            self.next()
            return ast.Lit(self._string_value(t.value))
        if t.kind == "kw" and t.value.upper() in ("TRUE", "FALSE"):
            self.next()
            return ast.Lit(t.value.upper() == "TRUE")
        if t.kind == "kw" and t.value.upper() == "NULL":
            self.next()
            return ast.Lit(None)
        if t.kind in ("accessor", "ident"):
            return ast.KeyRef(accessor=self._accessor_token())
        raise SyntaxError(f"unexpected token in condition: {t.value!r}")

    @staticmethod
    def _string_value(raw: str) -> str:
        return raw[1:-1].replace("\\'", "'").replace("\\\\", "\\")


def _validate(sel: ast.Select) -> None:
    """Aggregation-mix rules (flb_sp.c:232-289 sp_cmd_aggregated_keys):
    aggregates cannot mix with non-grouped bare keys; '*' cannot mix with
    aggregates.
    """
    if not sel.has_aggregates:
        return
    if sel.star:
        raise ValueError("SP analysis error: '*' cannot be mixed with aggregate functions")
    gb = {(a.name, a.subkeys) for a in sel.group_by}
    for k in sel.keys:
        if k.kind == "key":
            ident = (k.accessor.name, k.accessor.subkeys)
            if ident not in gb:
                raise ValueError(
                    f"SP analysis error: bare key {k.accessor.display()!r} "
                    "selected alongside aggregates without GROUP BY"
                )
        elif k.kind == "func" and k.func in ast.RECORD_FUNCS:
            # per-record functions have no value after groupBy().agg()
            # — the tag/time columns are gone; rejecting here replaces
            # an unresolved-column AnalysisException at compile time
            raise ValueError(
                f"SP analysis error: {k.func}() is per-record and cannot "
                "be mixed with aggregate functions"
            )


def parse_sql(text: str) -> ast.Command:
    return Parser(text).parse()
