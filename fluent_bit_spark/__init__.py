"""fluent_bit_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of fluent/fluent-bit.

The reference (https://github.com/fluent/fluent-bit) is a C telemetry agent:
inputs -> parsers -> filters/processors -> SQL stream processor -> tag router
-> outputs. This package re-expresses that capability surface Spark-first:

- the stream-processor SQL dialect (reference src/stream_processor/) compiles
  to DataFrame plans (fluent_bit_spark.sp);
- every filter/processor plugin becomes a DataFrame -> DataFrame combinator
  (fluent_bit_spark.operators);
- the parsing layer (regex/json/ltsv/logfmt, typecast, record accessor)
  becomes Column-expression builders (fluent_bit_spark.functions,
  .accessor, .typecast);
- tag routing becomes predicate-split writes (fluent_bit_spark.operators.routing);
- streaming semantics map onto Structured Streaming (fluent_bit_spark.streaming);
- plus large-scale training-data-pipeline extensions: dedup, similarity
  search, text analysis, multimodal plumbing (fluent_bit_spark.extensions).

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, codegen and AQE; Python UDFs appear only where semantics genuinely
require them (and then as Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"

from fluent_bit_spark.session import get_spark  # noqa: F401
