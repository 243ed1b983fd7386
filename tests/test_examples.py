"""The shipped migration example must keep running as the loader evolves."""

from pathlib import Path


def test_classic_example_pipeline(spark, tmp_path):
    from fluent_bit_spark.pipeline import load_pipeline

    conf = (
        Path(__file__).resolve().parents[1] / "examples" / "classic_pipeline.conf"
    ).read_text()
    # redirect the output paths into the test sandbox
    conf = conf.replace("/tmp/fbs_example_out", str(tmp_path))
    pipe = load_pipeline(spark, conf)
    written = pipe.run_outputs()
    assert written["app.*"] == 1000
    assert written["errors.*"] == 201     # rewrite_tag keep=true duplicates
    assert written["*"] == 1201           # catch-all sees both routes
    assert spark.read.json(str(tmp_path / "app")).count() == 1000


def test_corpus_pipeline_example(spark, tmp_path):
    """The shipped corpus-prep example must keep running end-to-end and
    only ever shrink the corpus monotonically across stages."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    import corpus_pipeline

    counts = corpus_pipeline.run(spark, "/root/testdata/sf0.001", str(tmp_path / "out"))
    order = ["input", "gopher", "line_dedup", "exact_dedup",
             "minhash_dedup", "decontaminated"]
    for a, b in zip(order, order[1:]):
        assert counts[b] <= counts[a], (a, b, counts)
    assert counts["written"] == counts["decontaminated"]
    assert 0 < counts["train"] <= counts["decontaminated"]
    # partitioned layout: split directories exist
    assert (tmp_path / "out" / "split=train").exists()


def test_telemetry_pipeline_example(spark):
    """The shipped telemetry example: scrape pages -> decode -> rollup ->
    LOCF gap fill -> rate -> re-encoded exposition page, with the counter
    reset on instance b surfacing as a small positive rate, never a
    negative one."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    import telemetry_pipeline

    counts = telemetry_pipeline.run(spark)
    page = counts.pop("_page")
    assert counts["decoded_samples"] == 12
    assert counts["buckets"] == counts["filled"] == 8
    assert counts["rated"] == 6
    assert "# TYPE http_requests_total:rate30s gauge" in page
    # reset on instance b: new value IS the increase -> 15/30s = 0.5
    assert 'http_requests_total:rate30s{instance="b"} 0.5' in page
    assert "-" not in page.split("gauge", 1)[1]  # no negative rates
