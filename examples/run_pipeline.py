"""Run the classic fluent-bit config through the Spark engine.

Usage: python examples/run_pipeline.py
Prints the per-route delivered row counts, exactly like fluent-bit's
out_counter would.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fluent_bit_spark import get_spark
from fluent_bit_spark.pipeline import load_pipeline

spark = get_spark("fbs-example")
pipe = load_pipeline(spark, str(Path(__file__).with_name("classic_pipeline.conf")))
for route, n in pipe.run_outputs().items():
    print(f"route {route!r}: {n} records")
