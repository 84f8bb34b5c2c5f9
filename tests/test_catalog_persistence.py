"""SketchCatalog.save/load: the nightly-roll workflow across driver
restarts — tonight's batch job builds and saves, tomorrow's serving
session loads the same names and probes them, broadcast and sharded
entries alike. Commit discipline mirrors the novelty store: generation
dirs written aside, manifest swap as the single commit point, sweep
after."""

import json
import os

import pytest
from pyspark.sql import functions as F

from sprout_spark.sketch import BloomFilter, CountMinSketch, TDigest
from sprout_spark.spark.sql import SketchCatalog


@pytest.fixture()
def keyed_df(spark):
    return spark.range(0, 5_000).select(
        F.concat(F.lit("user-"), F.col("id")).alias("k")
    )


def _build_catalog(spark, keyed_df, prefix):
    bf = BloomFilter(6_000, 0.01)
    bf.update_values([r["k"].encode() for r in keyed_df.collect()])
    cms = CountMinSketch(0.001, 0.01)
    cms.update_values([b"alpha"] * 7 + [b"beta"] * 3)
    td = TDigest()
    td.update_values(list(range(100)))
    return (
        SketchCatalog(spark, prefix=prefix)
        .put("seen", bf)
        .put("freqs", cms)
        .put("lat", td)
    )


def test_catalog_save_load_roundtrip(spark, keyed_df, tmp_path):
    """Every entry kind revives: same names, same prefix, identical
    probe answers through the SQL surface — and the revived payloads
    are byte-identical (digest-checked)."""
    path = str(tmp_path / "cat")
    cat = _build_catalog(spark, keyed_df, "pcat")
    man = cat.save(path)
    assert man["generation"] == 0
    assert sorted(man["entries"]) == ["freqs", "lat", "seen"]

    cat2 = SketchCatalog.load(spark, path)  # prefix defaults to saved
    assert cat2.prefix == "pcat"
    assert cat2.names() == ["freqs", "lat", "seen"]
    assert cat2._digests == cat._digests  # byte-identical payloads

    keyed_df.createOrReplaceTempView("pkeys")
    n = spark.sql(
        "SELECT count(*) AS n FROM pkeys WHERE pcat_might_contain('seen', k)"
    ).collect()[0]["n"]
    assert n == keyed_df.count()  # zero false negatives survive the trip
    est = spark.sql(
        "SELECT pcat_cms_estimate('freqs', 'alpha') AS e"
    ).collect()[0]["e"]
    assert est >= 7
    rank = spark.sql(
        "SELECT pcat_quantile_rank('lat', 50.0) AS r"
    ).collect()[0]["r"]
    assert 0.3 < rank < 0.7


def test_catalog_save_load_sharded_by_reference(spark, keyed_df, tmp_path):
    """A sharded entry registered with source_path persists as a
    manifest POINTER (no copy into the catalog dir); one without is
    materialized. Both revive and probe broadcast-free."""
    from sprout_spark.spark.sharded import build_sharded_bloom

    filters = build_sharded_bloom(
        keyed_df, "k", n_shards=4, expected_distinct=6_000, err_rate=0.01
    ).cache()
    fpath = str(tmp_path / "nightly_filters")
    filters.write.mode("overwrite").parquet(fpath)

    path = str(tmp_path / "cat")
    cat = SketchCatalog(spark, prefix="scat")
    cat.put_sharded("byref", spark.read.parquet(fpath), source_path=fpath)
    cat.put_sharded("copied", filters)
    man = cat.save(path)
    assert man["entries"]["byref"]["path"] == fpath
    assert man["entries"]["byref"]["copied"] is False
    assert man["entries"]["copied"]["copied"] is True
    assert man["entries"]["copied"]["path"].startswith(path)

    cat2 = SketchCatalog.load(spark, path)
    for name in ("byref", "copied"):
        probed = cat2.might_contain(name, keyed_df, "k")
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan
        assert probed.where("might_contain").count() == keyed_df.count()
    filters.unpersist()


def test_catalog_roll_sweeps_old_generation(spark, keyed_df, tmp_path):
    """Re-saving is the nightly roll: a new generation commits via the
    manifest swap and the superseded generation dirs are swept; a
    loader that starts from the new manifest sees only current state."""
    path = str(tmp_path / "cat")
    cat = _build_catalog(spark, keyed_df, "rcat")
    cat.save(path)
    assert os.path.isdir(os.path.join(path, "entries-g0"))
    # roll: a changed filter, plus a copied sharded entry to exercise
    # the sharded sweep too
    from sprout_spark.spark.sharded import build_sharded_bloom

    cat.put_sharded(
        "sh",
        build_sharded_bloom(
            keyed_df, "k", n_shards=2, expected_distinct=6_000, err_rate=0.01
        ),
    )
    man1 = cat.save(path)
    assert man1["generation"] == 1
    assert not os.path.isdir(os.path.join(path, "entries-g0"))
    assert os.path.isdir(os.path.join(path, "entries-g1"))
    assert os.path.isdir(os.path.join(path, "sharded", "sh-g1"))
    man2 = cat.save(path)  # roll again: the copied sharded dir moves too
    assert man2["generation"] == 2
    assert not os.path.isdir(os.path.join(path, "sharded", "sh-g1"))
    cat2 = SketchCatalog.load(spark, path)
    assert cat2.names() == ["freqs", "lat", "seen", "sh"]
    assert cat2.might_contain("sh", keyed_df, "k").where(
        "might_contain"
    ).count() == keyed_df.count()


def test_catalog_load_failures_are_loud(spark, keyed_df, tmp_path):
    """Missing manifest, future manifest version, and a tampered
    payload all refuse loudly instead of serving wrong answers."""
    with pytest.raises(FileNotFoundError, match="no catalog manifest"):
        SketchCatalog.load(spark, str(tmp_path / "nowhere"))

    path = str(tmp_path / "cat")
    cat = _build_catalog(spark, keyed_df, "lcat")
    cat.save(path)
    mpath = os.path.join(path, "manifest.json")
    with open(mpath) as f:
        man = json.load(f)
    man["version"] = 99
    with open(mpath, "w") as f:
        json.dump(man, f)
    with pytest.raises(ValueError, match="manifest version"):
        SketchCatalog.load(spark, path)


def test_catalog_interrupted_save_keeps_previous_generation(
    spark, keyed_df, tmp_path
):
    """Crash-safety: a save that dies AFTER writing the new generation
    dir but BEFORE the manifest swap leaves the previous catalog fully
    loadable, and the next successful save sweeps the orphan."""
    path = str(tmp_path / "cat")
    cat = _build_catalog(spark, keyed_df, "ccat")
    cat.save(path)
    # simulate the torn save: a g1 entries dir exists, manifest still g0
    orphan = os.path.join(path, "entries-g1")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as f:
        f.write("torn write")
    cat2 = SketchCatalog.load(spark, path)  # reads g0, ignores the orphan
    assert cat2.names() == ["freqs", "lat", "seen"]
    # the next save claims g1 (overwrite replaces the torn dir wholesale
    # — the junk never reaches a reader) and sweeps g0 after the swap
    man = cat.save(path)
    assert man["generation"] == 1
    assert not os.path.exists(os.path.join(orphan, "junk"))
    assert not os.path.isdir(os.path.join(path, "entries-g0"))
    assert SketchCatalog.load(spark, path).names() == ["freqs", "lat", "seen"]
