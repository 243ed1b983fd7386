"""Config-driven pipelines — 'the config IS the plan'.

The reference has no logical plan; its plan is the config file
([INPUT] -> [FILTER]* -> router -> [OUTPUT]*, parsed by src/config_format/,
executed by the engine loop). Here the same YAML shape builds ONE Spark
logical plan per output route, and Catalyst optimizes across the whole
filter chain (the C engine rewrites msgpack buffers filter-by-filter).
"""

from fluent_bit_spark.pipeline.config import Pipeline, load_pipeline  # noqa: F401
