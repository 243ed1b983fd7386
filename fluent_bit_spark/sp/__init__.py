"""Stream-processor SQL dialect (reference: src/stream_processor/).

Grammar transcribed from src/stream_processor/parser/sql.y (437 lines) +
lexer sql.l; EBNF in src/stream_processor/README.md. The parser here is a
hand-rolled tokenizer + recursive-descent parser producing a small AST
(fluent_bit_spark.sp.ast), compiled to DataFrame plans by
fluent_bit_spark.sp.compiler — Catalyst then owns optimization, which the
reference never had (it interprets the AST per record, flb_sp.c:1048).
"""

from fluent_bit_spark.sp.parser import parse_sql  # noqa: F401
from fluent_bit_spark.sp.engine import SPContext  # noqa: F401
