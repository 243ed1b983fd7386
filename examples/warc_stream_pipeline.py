"""On-disk crawl archives to training corpus, batch AND streaming — the
text twin of media_pipeline.py (crawl_pipeline.py covers the batch WET
front end from pre-parsed records; THIS example starts from the .warc.gz
BYTES on disk and proves the streaming twin). The quartet
composed the way a web-corpus build consumes it:

  1. archive ingestion       (warc_source: a directory of .warc.gz read
                              whole-file, capped member inflate +
                              Content-Length framing + WARC/HTTP parse)
  2. Unicode hygiene         (normalize_unicode: mojibake repair with
                              the strict-roundtrip + shrink rule, NFC,
                              control/zero-width strip — the corpus is
                              planted MANGLED, utf-8-read-as-latin-1)
  3. quality filtering       (quality_score >= 0.5: the length-band /
                              punctuation / stopword composite — the
                              synthetic corpus carries no English
                              stopwords, so the Gopher 2-of-8 rule
                              would zero it out; the composite keeps
                              the length-band split meaningful)
  4. near-dup dedup          (minhash_dedup within the corpus/batch +
                              dedup_against_history across batches —
                              padded duplicates of every 10th document
                              are planted in a LATER archive, so the
                              streaming run must drop them via the
                              HISTORY store, not the within-batch join)
  5. training accounting     (documents + whitespace token totals — the
                              numbers a data-mixing stage consumes)

Every stage is the oracle-verified operator behind a registry query
(warc_gz_roundtrip / warc_quality_pipeline / mojibake_repair /
gopher_quality / dedup_minhash); this example is the composition test —
ingestion feeds hygiene feeds quality feeds dedup, and the counts
interlock. `run_stream` is the SAME composition in its always-on shape
(one archive per micro-batch through warc_source(streaming=True) +
foreachBatch), asserted batch == summed-stream in
tests/test_examples.py.

Usage: python examples/warc_stream_pipeline.py [sf_dir]
Prints per-stage surviving counts.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

SUFFIX = " café № Ω — ₤5 “quoted” 日本語"


def _spool_archives(spark, sf_dir: str, work_dir: str) -> str:
    """Render the documents table into a directory of .warc.gz archives:
    one archive per 25 documents (canonical member-per-record layout),
    each body the document's text + a non-ASCII suffix MANGLED the way
    broken pipelines do it (utf-8 bytes re-read as latin-1; every 3rd
    doc double-mangled), plus one FINAL archive holding a
    whitespace-padded near-duplicate of every 10th document — strictly
    later than every original, so cross-batch dedup is exercised."""
    import os

    from fluent_bit_spark.extensions.html import (
        make_warc_gz,
        make_warc_record,
    )
    from fluent_bit_spark.model import load_table

    docs = sorted(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text").collect(),
        key=lambda r: r.doc_id,
    )

    def mangle(d: int, t: str) -> str:
        s = (t + SUFFIX).encode("utf-8").decode("latin-1")
        if d % 3 == 0:
            s = s.encode("utf-8").decode("latin-1")
        return s

    def rec(d: int, t: str) -> str:
        return make_warc_record(
            "response", f"https://crawl.example/d{d}", mangle(d, t),
            http_status=200, content_type="text/plain",
        )

    spool = os.path.join(work_dir, "archives")
    os.makedirs(spool, exist_ok=True)
    import time

    t0 = time.time() - 1000
    k = 0
    for i in range(0, len(docs), 25):
        path = os.path.join(spool, f"b{k:03d}.warc.gz")
        with open(path, "wb") as f:
            f.write(make_warc_gz(
                [rec(r.doc_id, r.text) for r in docs[i : i + 25]], True
            ))
        os.utime(path, (t0 + k, t0 + k))
        k += 1
    # the duplicate tail archive: padded copies under offset ids
    dup_recs = [
        rec(r.doc_id + 1_000_000, r.text + "   ")
        for r in docs if r.doc_id % 10 == 0
    ]
    path = os.path.join(spool, f"b{k:03d}.warc.gz")
    with open(path, "wb") as f:
        f.write(make_warc_gz(dup_recs, True))
    os.utime(path, (t0 + k, t0 + k))
    return spool


def _stages(records, counts):
    """The shared per-corpus/per-batch stage chain up to dedup input:
    parse ids, hygiene, quality. Returns the quality-kept frame."""
    from fluent_bit_spark.extensions.text import (
        normalize_unicode,
        quality_score,
    )

    parsed = records.select(
        F.regexp_extract("target_uri", r"/d(\d+)$", 1)
        .cast("long").alias("doc_id"),
        F.col("body").alias("text"),
    )
    counts["input_records"] += parsed.count()
    clean = normalize_unicode(parsed)
    # hygiene must recover the exact original + suffix: count the rows
    # still carrying the un-mangled suffix (all of them, asserted by
    # the batch==stream equality through every later stage)
    counts["repaired"] += clean.where(
        F.col("text").endswith(F.lit(SUFFIX))
    ).count()
    kept = quality_score(clean).where(F.col("quality") >= 0.5).select(
        "doc_id", "text"
    )
    counts["quality_kept"] += kept.count()
    return kept


def run(spark, sf_dir: str, work_dir: str) -> dict[str, int]:
    """Batch composition over the spooled archives."""
    from fluent_bit_spark.extensions.dedup import minhash_dedup
    from fluent_bit_spark.streaming.sources import warc_source

    counts = {k: 0 for k in (
        "input_records", "repaired", "quality_kept", "after_dedup",
        "total_tokens",
    )}
    spool = _spool_archives(spark, sf_dir, work_dir)
    records = warc_source(spark, spool, streaming=False)
    kept = _stages(records, counts)
    survivors = minhash_dedup(kept)
    counts["after_dedup"] += survivors.count()
    counts["total_tokens"] += (
        survivors.select(
            F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n")
        ).collect()[0].n or 0  # SUM of zero rows is null, as in run_stream
    )
    return counts


def run_stream(spark, sf_dir: str, work_dir: str) -> dict[str, int]:
    """The SAME composition in its always-on shape: warc_source in
    streaming mode, one archive per micro-batch, foreachBatch running
    hygiene -> quality -> within-batch minhash_dedup -> HISTORY-store
    dedup (so the padded duplicates in the strictly-later tail archive
    drop against their originals' bands), appending bands AFTER the
    counts are taken — the sink-before-state ordering the media
    pipeline uses. History bands are appended for ALL quality-kept rows
    (not just dedup survivors): batch minhash_dedup drops a doc exactly
    when a smaller-id candidate EXISTS, surviving or not, and because
    the archives are id-ordered, 'smaller id' and 'earlier batch or
    smaller in-batch id' coincide — appending only survivors would
    break the equality on candidate CHAINS that span archives (A<B<C
    with B~A, C~B, C!~A: batch drops C via the dropped B; the history
    must therefore carry B's bands)."""
    import os

    from fluent_bit_spark.extensions.dedup import (
        append_history,
        dedup_against_history,
        minhash_dedup,
    )
    from fluent_bit_spark.streaming.sources import warc_source

    counts = {k: 0 for k in (
        "input_records", "repaired", "quality_kept", "after_dedup",
        "total_tokens", "n_batches",
    )}
    spool = _spool_archives(spark, sf_dir, work_dir)
    state = os.path.join(work_dir, "text_history")

    def process(batch_df, batch_id: int) -> None:
        counts["n_batches"] += 1
        kept = _stages(batch_df.localCheckpoint(eager=True), counts)
        within = minhash_dedup(kept)
        survivors = dedup_against_history(
            within, state, update_state=False
        )
        counts["after_dedup"] += survivors.count()
        counts["total_tokens"] += (
            survivors.select(
                F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n")
            ).collect()[0].n or 0
        )
        append_history(kept, state)  # ALL quality-kept rows — see docstring

    q = (
        warc_source(spark, spool, streaming=True, max_files_per_trigger=1)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    return counts


if __name__ == "__main__":
    import tempfile

    from fluent_bit_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("warc-stream-pipeline")
    with tempfile.TemporaryDirectory(prefix="fbs_crawl_") as wd:
        for stage, n in run(spark, sf_dir, wd).items():
            print(f"{stage}: {n}")
