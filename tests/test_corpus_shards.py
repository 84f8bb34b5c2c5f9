"""Shard sink (sources/corpus_shards.py): roundtrip equality, one file
per shard with in-file pos order, footer-derived manifest counts,
commit discipline (torn write refused, immutability)."""

import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row

from sprout_spark.operators.corpus import shuffle_shards
from sprout_spark.sources.corpus_shards import (
    read_manifest,
    read_shards,
    write_shards,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i}") for i in range(500)],
        "doc_id bigint, text string",
    ).repartition(8)


def test_roundtrip_and_layout(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    manifest = write_shards(docs, "doc_id", path, n_shards=6)
    assert manifest["total_rows"] == 500 and len(manifest["shards"]) == 6
    want = sorted(
        map(tuple, shuffle_shards(docs, "doc_id", 6, hash_mode="xxhash64").collect())
    )
    got = sorted(map(tuple, read_shards(spark, path).select(*[c for c, _ in
        shuffle_shards(docs, "doc_id", 6, hash_mode="xxhash64").dtypes]).collect()))
    assert got == want
    # one parquet file per shard dir; rows inside sorted by pos
    data = os.path.join(path, "data")
    for s in manifest["shards"]:
        fp = os.path.join(data, s["file"])
        tbl = pq.read_table(fp)
        assert tbl.num_rows == s["rows"]
        poss = tbl.column("pos").to_pylist()
        assert poss == sorted(poss) == list(range(len(poss)))


def test_manifest_counts_and_commit_discipline(spark, docs, tmp_path):
    path = str(tmp_path / "s2")
    write_shards(docs, "doc_id", path, n_shards=3)
    m = read_manifest(path)
    assert sum(s["rows"] for s in m["shards"]) == 500
    # immutability: a committed set refuses a second write
    with pytest.raises(FileExistsError, match="immutable"):
        write_shards(docs, "doc_id", path, n_shards=3)
    # torn write (no manifest) refused by readers
    torn = str(tmp_path / "torn")
    os.makedirs(os.path.join(torn, "data"))
    with pytest.raises(FileNotFoundError, match="torn"):
        read_shards(spark, torn)
    # future manifest version refused
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    with open(os.path.join(bad, "manifest.json"), "w") as f:
        json.dump({"version": 99}, f)
    with pytest.raises(ValueError, match="version"):
        read_manifest(bad)
