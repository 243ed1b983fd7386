"""Synthesize scaled copies of the documents/events/embeddings tables for
scaling measurements above the driver-provided sf0.1.

NOT a replacement for driver testdata (which is read-only and stops at
sf0.1): distributions mimic the measured sf0.1 shapes — documents drawn
from the same 31-word vocabulary at 16..100 words with lang/source from
the same value sets, events uniform over 5 types / sf-scaled users / 30
days with the {"k": n} props JSON, embeddings 64-dim with 10 labels —
and everything derives from xxhash64 of the row id, so any two
generated scales are self-consistent (sf1 is statistically 10x sf0.1,
not 10 concatenated copies, which would corrupt dedup workloads with
artificial exact duplicates).

All columns are Catalyst expressions over spark.range: generation runs
distributed at scan speed — sf1 (1M events / 50k docs / 20k vectors)
takes seconds.

Usage: python tools/gen_sf.py SF OUT_DIR   (e.g. gen_sf.py 1 /tmp/sf1)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

# the sf0.1 document vocabulary (measured: 31 distinct words)
VOCAB = (
    "spark line column order small sort fast value scan hash slow group "
    "batch part agg filter query table key stream window join vector data "
    "the a customer app log index merge"
).split()
LANGS = ["en", "en", "en", "de", "fr", "es"]  # en-heavy like the source
EVENT_TYPES = ["view", "click", "purchase", "error", "signup"]


def _pick(arr: list[str], h):
    return F.element_at(
        F.array(*[F.lit(x) for x in arr]), (F.pmod(h, F.lit(len(arr))) + 1).cast("int")
    )


def gen_documents(spark, n: int):
    did = F.col("id")
    n_words = (F.pmod(F.xxhash64(did, F.lit("len")), F.lit(85)) + 16).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda j: _pick(VOCAB, F.xxhash64(did, j)),
    )
    text = F.array_join(words, " ")
    return spark.range(n).select(
        did.alias("doc_id"),
        text.alias("text"),
        _pick(LANGS, F.xxhash64(did, F.lit("lang"))).alias("lang"),
        F.concat(
            F.lit("src"), F.pmod(F.xxhash64(did, F.lit("src")), F.lit(20)).cast("string")
        ).alias("source"),
        F.length(text).cast("int").alias("n_chars"),
    )


def gen_events(spark, n: int, n_users: int):
    eid = F.col("id")
    # ~30 days of event time in id order with sub-second jitter
    span_us = 30 * 86400 * 1_000_000
    ts = F.timestamp_micros(
        (F.unix_timestamp(F.lit("2024-01-01 00:00:00")) * 1_000_000
         + (eid * F.lit(span_us) / F.lit(n)).cast("long")
         + F.pmod(F.xxhash64(eid, F.lit("j")), F.lit(1_000_000))).cast("long")
    )
    return spark.range(n).select(
        eid.alias("event_id"),
        ts.alias("ts"),
        F.pmod(F.xxhash64(eid, F.lit("u")), F.lit(n_users)).alias("user_id"),
        _pick(EVENT_TYPES, F.xxhash64(eid, F.lit("t"))).alias("event_type"),
        (F.pmod(F.xxhash64(eid, F.lit("v")), F.lit(56021)) / 100.0).alias("value"),
        F.concat(
            F.lit('{"k": '),
            F.pmod(F.xxhash64(eid, F.lit("k")), F.lit(100)).cast("string"),
            F.lit("}"),
        ).alias("props"),
    )


def gen_embeddings(spark, n: int, dim: int = 64):
    vid = F.col("id")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            (F.pmod(F.xxhash64(vid, j), F.lit(1_000_000)) / 500_000.0) - 1.0
        ).cast("float"),
    )
    return spark.range(n).select(
        vid.alias("vec_id"),
        emb.alias("embedding"),
        F.pmod(F.xxhash64(vid, F.lit("l")), F.lit(10)).cast("int").alias("label"),
    )


def main() -> None:
    from fluent_bit_spark import get_spark

    sf = float(sys.argv[1])
    out = sys.argv[2]
    spark = get_spark("gen-sf")
    scale = sf / 0.1  # sf0.1 row counts are the reference point
    specs = {
        "documents": gen_documents(spark, int(5_000 * scale)),
        "events": gen_events(spark, int(100_000 * scale), int(1_500 * scale)),
        "embeddings": gen_embeddings(spark, int(2_000 * scale)),
    }
    for name, df in specs.items():
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: {spark.read.parquet(f'{out}/{name}.parquet').count()} rows")


if __name__ == "__main__":
    main()
