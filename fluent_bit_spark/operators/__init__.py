"""Operator library: every fluent-bit filter/processor as a
DataFrame -> DataFrame combinator (SURVEY §2.4).

Operators compose in config order exactly like the reference's filter
chain (src/flb_filter.c:121 runs filters sequentially per chunk) — but
here each one only extends the logical plan, so Catalyst fuses the whole
chain into one stage where possible instead of rewriting buffers per row.
"""

from fluent_bit_spark.operators.grep import grep  # noqa: F401
from fluent_bit_spark.operators.modify import modify  # noqa: F401
from fluent_bit_spark.operators.nest import nest, lift  # noqa: F401
from fluent_bit_spark.operators.record_modifier import record_modifier  # noqa: F401
from fluent_bit_spark.operators.throttle import throttle, throttle_size  # noqa: F401
from fluent_bit_spark.operators.rewrite_tag import rewrite_tag  # noqa: F401
