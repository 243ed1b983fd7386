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
