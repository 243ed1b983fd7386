"""WebDataset-style tar shard tests: roundtrip fidelity, same-key
co-location, deterministic bytes, crash-safe publication, and the
sample-grouping view."""

import hashlib
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.extensions.shards import (
    group_samples,
    read_tar_shards,
    write_tar_shards,
)


def _members(spark, n=60):
    rows = []
    for i in range(n):
        rows.append((f"{i:08d}", "txt", f"text {i}".encode()))
        rows.append((f"{i:08d}", "cls", str(i % 10).encode()))
    return spark.createDataFrame(rows, "key string, ext string, content binary")


def test_tar_shard_roundtrip(spark, tmp_path):
    d = str(tmp_path / "shards")
    man = write_tar_shards(_members(spark), d, 4).collect()
    assert sum(r.n_members for r in man) == 120
    assert sorted(r.shard for r in man) == sorted(os.listdir(d))
    back = read_tar_shards(spark, d)
    assert back.count() == 120
    row = back.where(
        (F.col("key") == "00000007") & (F.col("ext") == "txt")
    ).collect()[0]
    assert bytes(row.content) == b"text 7" and row.n_bytes == 6


def test_same_key_members_colocate(spark, tmp_path):
    d = str(tmp_path / "shards")
    write_tar_shards(_members(spark), d, 8).collect()
    back = read_tar_shards(spark, d)
    split = (
        back.groupBy("key")
        .agg(F.countDistinct("shard").alias("n"))
        .where("n > 1")
        .count()
    )
    assert split == 0
    full = group_samples(back)
    assert full.where(F.size("exts") != 2).count() == 0
    s = full.where(F.col("key") == "00000003").collect()[0]
    assert s.exts == ["cls", "txt"]
    assert bytes(s.sample["txt"]) == b"text 3"


def test_shard_bytes_deterministic(spark, tmp_path):
    d = str(tmp_path / "shards")
    write_tar_shards(_members(spark), d, 4).collect()
    h1 = {
        f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
        for f in os.listdir(d)
    }
    write_tar_shards(_members(spark), d, 4).collect()
    h2 = {
        f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
        for f in os.listdir(d)
    }
    assert h1 == h2  # re-run publishes byte-identical shards


def test_explicit_shard_column_and_no_tmp_leftovers(spark, tmp_path):
    d = str(tmp_path / "shards")
    m = _members(spark, 20).withColumn(
        "sh", (F.col("key").cast("long") % 2).cast("int")
    )
    man = write_tar_shards(m, d, 2, shard_col="sh").collect()
    assert sorted(r.shard for r in man) == ["shard-000000.tar", "shard-000001.tar"]
    assert not [f for f in os.listdir(d) if f.endswith(".tmp")]
    # shard 0 holds exactly the even keys
    with tarfile.open(os.path.join(d, "shard-000000.tar")) as tf:
        keys = {n.split(".")[0] for n in tf.getnames()}
    assert keys == {f"{i:08d}" for i in range(0, 20, 2)}


def test_bad_inputs(spark, tmp_path):
    with pytest.raises(ValueError):
        write_tar_shards(_members(spark, 1), str(tmp_path), 0)
