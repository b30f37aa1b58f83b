"""WebDataset tar-shard I/O (sources/webdataset.py): write → read
roundtrip, sample grouping, deterministic shard bytes, integration with
assign_shards."""

from __future__ import annotations

import hashlib
import os
import tarfile

import pytest

from evidence_datasource_parsers_spark.sources.webdataset import (
    group_samples,
    read_webdataset,
    write_webdataset,
)


def _corpus(spark, n=20):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string"))
        .alias("shard"),
        F.format_string("%06d", F.col("id")).alias("key"),
        F.concat(F.lit("text of doc "), F.col("id").cast("string"))
        .alias("txt"),
        F.encode(
            F.concat(F.lit("BLOB"), F.col("id").cast("string")), "utf-8"
        ).alias("bin"),
    )


def test_write_read_roundtrip(spark, tmp_path):
    out = str(tmp_path / "wds")
    df = _corpus(spark)
    manifest = {r.shard: r for r in
                write_webdataset(
                    df, out, part_cols={"txt": "txt", "bin": "bin"}
                ).collect()}
    assert set(manifest) == {"s0", "s1", "s2"}
    assert all(os.path.exists(m.path) for m in manifest.values())
    assert sum(m.n_samples for m in manifest.values()) == 20

    back = read_webdataset(spark, out)
    rows = back.collect()
    assert len(rows) == 40  # 2 members per sample
    by = {(r.shard, r.key, r.ext): bytes(r.data) for r in rows}
    assert by[("s1.tar", "000001", "txt")] == b"text of doc 1"
    assert by[("s1.tar", "000001", "bin")] == b"BLOB1"

    samples = group_samples(back).collect()
    assert len(samples) == 20
    s = {r.key: r.parts for r in samples}
    assert set(s["000004"].keys()) == {"txt", "bin"}
    assert bytes(s["000004"]["bin"]) == b"BLOB4"


def test_shard_bytes_deterministic(spark, tmp_path):
    """Re-running the write produces byte-identical shards (zeroed
    mtime, key-sorted members) — the property corpus reproducibility
    and caching layers rely on."""
    df = _corpus(spark)
    digests = []
    for run in ("a", "b"):
        out = str(tmp_path / f"run_{run}")
        write_webdataset(
            df.orderBy("bin" if run == "b" else "key"),  # input order varies
            out, part_cols={"txt": "txt", "bin": "bin"},
        ).collect()
        digests.append({
            f: hashlib.md5(
                open(os.path.join(out, f), "rb").read()
            ).hexdigest()
            for f in sorted(os.listdir(out))
        })
    assert digests[0] == digests[1]


def test_gz_compression_and_single_file(spark, tmp_path):
    out = str(tmp_path / "gz")
    write_webdataset(
        _corpus(spark), out, part_cols={"txt": "txt"}, compression="gz"
    ).collect()
    files = sorted(os.listdir(out))
    assert files == ["s0.tar.gz", "s1.tar.gz", "s2.tar.gz"]
    # read a single shard file directly
    one = read_webdataset(spark, os.path.join(out, "s1.tar.gz"))
    assert one.where("ext = 'txt'").count() == 7


def test_key_split_and_skips(spark, tmp_path):
    """Dotted directories keep their dots; multi-dot basenames split at
    the FIRST dot; oversized members are skipped."""
    p = tmp_path / "manual.tar"
    with tarfile.open(p, "w") as tar:
        import io

        def add(name, data):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))

        add("v1.0/sample.seg.json", b"{}")
        add("v1.0/sample.txt", b"t")
        add("big.bin", b"x" * 2048)
    df = read_webdataset(spark, str(p), max_member_bytes=1024)
    rows = {(r.key, r.ext) for r in df.collect()}
    assert rows == {("v1.0/sample", "seg.json"), ("v1.0/sample", "txt")}

    with pytest.raises(ValueError, match="shards"):
        read_webdataset(spark, str(tmp_path / "empty_dir_missing"))


def test_integrates_with_assign_shards(spark, tmp_path):
    """The sharding module's deterministic assignment feeds the writer
    directly: shard column from assign_shards, tar per shard."""
    from pyspark.sql import functions as F

    from evidence_datasource_parsers_spark.operators.sharding import (
        assign_shards,
    )

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )
    sharded = assign_shards(docs, "doc_id", 4).select(
        F.format_string("shard-%05d", F.col("shard")).alias("shard"),
        F.format_string("%09d", F.col("shard_pos")).alias("key"),
        F.col("text").alias("txt"),
    )
    out = str(tmp_path / "train")
    m = write_webdataset(sharded, out, part_cols={"txt": "txt"}).collect()
    assert len(m) == 4 and sum(r.n_samples for r in m) == 30
    back = group_samples(read_webdataset(spark, out))
    assert back.count() == 30


def test_group_samples_duplicate_ext_keeps_last_not_explodes(spark):
    """Duplicate member names (tar-append updates) must collapse to one
    deterministic map entry, not kill the job with DUPLICATED_MAP_KEY."""
    from evidence_datasource_parsers_spark.sources.webdataset import (
        group_samples,
    )

    members = spark.createDataFrame(
        [
            ("s0.tar", "k1", "jpg", b"old bytes"),
            ("s0.tar", "k1", "jpg", b"updated bytes"),
            ("s0.tar", "k1", "txt", b"caption"),
        ],
        "shard string, key string, ext string, data binary",
    )
    row = group_samples(members).collect()[0]
    assert set(row["parts"]) == {"jpg", "txt"}
    assert bytes(row["parts"]["jpg"]) == b"updated bytes"  # max wins
