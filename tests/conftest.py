import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fluent_bit_spark import get_spark  # noqa: E402
from fluent_bit_spark.model import read_json_events_variant  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# the reference's 11-record SP fixture
# (tests/internal/data/stream_processor/samples.json) — reproduced as data,
# not code; exercises sparse keys, int/float/string mixing, explicit null
SAMPLES = [
    '{"id": 0, "word1": "fluent", "word2": "logging", "bytes": 10, "bool": true, "usage": 10}',
    '{"id": 1, "word1": "fluentd", "word2": "rlz", "bytes": 10.0, "bool": true, "usage": 20}',
    '{"id": 2, "word1": "fluent-bit", "word3": "rlz", "bytes": 10, "bool": true, "usage": 30}',
    '{"id": 3, "word1": "fluent-logger", "word3": "", "bytes": 10, "bool": true, "usage": 40}',
    '{"id": 4, "word1": "forward", "word3": "plain", "bytes": 10, "bool": true, "usage": 50}',
    '{"id": 5, "word5": "forward-protocol", "word6": "secure", "bytes": 10, "bool": true, "usage": 60}',
    '{"id": 6, "word1": "stream", "word3": "processing", "bytes": 10.20, "bool": false, "usage": 70}',
    '{"id": 7, "word1": "edge-rocks", "word6": "", "bytes": 10, "bool": true, "usage": 80}',
    '{"id": 8, "word1": "treasure-data", "word3": "cncf", "bytes": 10, "bool": true, "usage": 90}',
    '{"id": 9, "word1": "arm", "word3": "linux foundation", "bytes": "10.30", "bool": false, "usage": 100}',
    '{"id": 10, "word1": "fluent-bit", "word3": null, "bytes": 10, "bool": true, "usage": 110}',
]

# samples-subkeys.json — 3-level nesting, same path map/scalar on
# different rows (dynamic typing under test)
SUBKEYS = [
    '{"id": 0, "map": {"sub1": {"sub2": {"color": "blue"}}}}',
    '{"id": 1, "map": {"sub1": {"sub2": {"color": "red"}, "sub4": "circle"}}}',
    '{"id": 2, "map": {"sub1": {"sub2": 123}}}',
    '{"id": 3, "map": {"sub1": {"sub2": "123", "stype": "a"}, "mtype": 0}}',
    '{"id": 4, "map": {"color": "blue"}}',
    '{"id": 5, "map": {"sub1": {"sub3": "100", "stype": "a", "sub4": "circle"}, "mtype": 0}}',
    '{"id": 6, "map": {"sub1": {"sub3": "0.50", "stype": "b", "sub4": "rectangle"}, "mtype": 1}}',
    '{"id": 7, "map": {"sub1": {"sub3": "5.50", "stype": "a", "sub4": "triangle"}, "mtype": 0}}',
    '{"id": 8, "map": {"sub1": {"sub3": "10.50", "stype": "b", "sub4": "rectangle"}, "mtype": 2}}',
]


@pytest.fixture(scope="session")
def spark():
    return get_spark("fbs-tests", shuffle_partitions=8)


@pytest.fixture(scope="session")
def samples_df(spark):
    """1-second-apart event times (forecast math depends on the spacing)."""
    return read_json_events_variant(spark, SAMPLES, tag="samples").cache()


@pytest.fixture(scope="session")
def subkeys_df(spark):
    return read_json_events_variant(spark, SUBKEYS, tag="subkeys").cache()


@pytest.fixture(scope="session")
def sp(spark, samples_df, subkeys_df):
    from fluent_bit_spark.sp import SPContext

    ctx = SPContext()
    ctx.register_stream("FLB", samples_df)
    ctx.register_stream("SUB", subkeys_df)
    return ctx
