#!/usr/bin/env python
"""Round-6 optimization harness (guide §1: measure first; §1.4 noop sink).

NOT the driver contract — ``bench.py`` is frozen for measurement. This
file isolates each expensive query/operator with the noop sink so the
computation is timed without the sink, captures ``.explain("formatted")``
for every plan into ``plans/r06/<name>_<label>.txt``, and breaks the
heavies into stages so optimization targets the dominant stage instead
of the whole chain. Reads ``$SPARK_GRAFT_SF_DIR`` / ``$SPARK_GRAFT_CPUS``
like bench.py; run as::

    python bench_extra.py <label> [only,ops,csv]

where <label> is e.g. "before"/"after" (plan file suffix). Prints one
JSON line with the per-stage timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_DIR = os.path.join(REPO, "plans", "r06")


def make_spark():
    from bench import make_spark as mk

    return mk(CPUS)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def save_plan(df, name: str, label: str) -> None:
    from sprout_spark.plans.explain import formatted_plan

    os.makedirs(PLAN_DIR, exist_ok=True)
    with open(os.path.join(PLAN_DIR, f"{name}_{label}.txt"), "w") as f:
        f.write(formatted_plan(df))


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "probe"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    from pyspark.sql import functions as F

    import bench as b

    spark = make_spark()
    times: dict[str, float] = {}

    def timed(name, fn, reps=2):
        if only is not None and not any(name.startswith(o) for o in only):
            return
        spark.sparkContext.setJobDescription(name)
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"  {name}: {times[name]}s", file=sys.stderr)

    b.warmup_full(spark, os.path.join(SF_DIR, "lineitem.parquet"))

    docs0 = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb0 = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    reps = 8
    docs = (
        docs0.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .select(
            (F.col("doc_id") * reps + F.col("rep")).alias("doc_id"),
            F.concat_ws(" ", "text", F.concat(F.lit("rep"), "rep")).alias("text"),
            "lang",
        )
        .repartition(CPUS)
        .cache()
    )
    docs.count()

    # ---- heavy_ngrams staged (bench: heavy_ngrams(docs, k=3, phi=8e-5))
    from sprout_spark.operators import ngrams as NG

    grams = NG.ngram_rows(docs, "text", 3)
    timed("heavy_ngrams.gram_rows_noop", lambda: noop(grams))
    if only is None or any("heavy_ngrams" in o for o in only):
        save_plan(grams, "heavy_ngrams_gram_rows", label)
    mg_holder = {}

    def mg_pass():
        from sprout_spark.sketch.misra_gries import MisraGries
        from sprout_spark.spark.aggregate import build_sketch

        mg_holder["mg"] = build_sketch(
            grams, "ngram", lambda: MisraGries(k=12500)
        )

    timed("heavy_ngrams.mg_propose", mg_pass)

    def confirm():
        mg = mg_holder["mg"]
        cands = mg.heavy_hitters(0.00008)
        cand_df = spark.createDataFrame(
            [(v,) for v, _, _ in cands], "ngram string"
        )
        noop(
            grams.join(F.broadcast(cand_df), "ngram", "left_semi")
            .groupBy("ngram")
            .agg(F.count("*").alias("cnt"))
            .where(F.col("cnt") >= 0.00008 * mg.total)
        )

    if "mg" in mg_holder or only is None:
        timed("heavy_ngrams.confirm", confirm)
    timed(
        "heavy_ngrams.total",
        lambda: NG.heavy_ngrams(docs, "text", k=3, phi=0.00008).count(),
    )
    if only is None or any("heavy_ngrams" in o for o in only):
        save_plan(
            NG.heavy_ngrams(docs, "text", k=3, phi=0.00008),
            "heavy_ngrams", label,
        )

    # ---- containment / near-dup family (bench settings, untiled corpus)
    from sprout_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_between,
        near_dup_pairs,
        near_dup_pairs_between,
    )

    def _contain():
        noop(containment_pairs(
            docs0, "doc_id", "text", gram=8, keep=16, threshold=0.5,
            max_fp_docs=256,
        ))

    timed("containment_pairs", _contain)
    if only is None or any("containment" in o for o in only):
        save_plan(
            containment_pairs(
                docs0, "doc_id", "text", gram=8, keep=16, threshold=0.5,
                max_fp_docs=256,
            ),
            "containment_pairs", label,
        )

    timed(
        "near_dup_pairs",
        lambda: noop(near_dup_pairs(
            docs0, "doc_id", "text", threshold=0.9, max_bucket=256
        )),
    )
    if only is None or any("near_dup" in o for o in only):
        save_plan(
            near_dup_pairs(docs0, "doc_id", "text", threshold=0.9,
                           max_bucket=256),
            "near_dup_pairs", label,
        )
    timed(
        "cross_near_dup",
        lambda: noop(near_dup_pairs_between(
            docs0.where(F.col("doc_id") % 3 != 0),
            docs0.where(F.col("doc_id") % 3 == 0),
            "doc_id", "text", threshold=0.9, max_bucket=256,
        )),
    )
    timed(
        "cross_containment",
        lambda: noop(containment_pairs_between(
            docs0.where(F.col("doc_id") % 3 == 0),
            docs0.where(F.col("doc_id") % 3 != 0),
            "doc_id", "text", gram=8, keep=16, threshold=0.5,
            max_fp_pairs=256,
        )),
    )

    # ---- strip_boilerplate staged (bench reshapes docs to 2-token lines)
    from sprout_spark.operators.lines import (
        _exploded,
        _lines_base,
        strip_boilerplate_lines,
    )

    _toks = F.split(F.col("text"), " ")
    _nline = F.greatest(F.ceil(F.size(_toks) / F.lit(2)), F.lit(1)).cast("int")
    docs_ml = docs.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), _nline - 1),
                lambda i: F.array_join(F.slice(_toks, i * 2 + 1, 2), " "),
            ),
            "\n",
        ).alias("text"),
    )
    ex = _exploded(_lines_base(docs_ml, "doc_id", "text", "\n"))
    timed("strip_boiler.explode_noop", lambda: noop(ex))
    bad_keys = (
        ex.where(F.col("norm") != "")
        .groupBy("key")
        .agg(F.count_distinct("id").alias("n"))
        .where(F.col("n") >= 16)
        .select("key")
    )
    timed("strip_boiler.badkeys_noop", lambda: noop(bad_keys))
    timed(
        "strip_boiler.total",
        lambda: strip_boilerplate_lines(
            docs_ml, "doc_id", "text", min_docs=16
        ).select(F.sum("n_dropped")).collect(),
    )
    if only is None or any("strip_boiler" in o for o in only):
        save_plan(
            strip_boilerplate_lines(docs_ml, "doc_id", "text", min_docs=16),
            "strip_boilerplate", label,
        )

    # ---- semantic dedup, exact decision chain (bench shape) + SRP path
    from sprout_spark.operators.dedup import (
        duplicate_clusters,
        resolve_duplicates,
    )
    from sprout_spark.operators.similarity import (
        cosine_pairs_exact,
        semantic_dedup,
    )

    pairs_exact = cosine_pairs_exact(emb0, "vec_id", "embedding", 0.4)
    timed("semantic.exact_pairs_noop", lambda: noop(pairs_exact))
    if only is None or any("semantic" in o for o in only):
        save_plan(pairs_exact, "cosine_pairs_exact", label)

    def _sem_exact():
        p = cosine_pairs_exact(emb0, "vec_id", "embedding", 0.4).select("a", "b")
        resolve_duplicates(
            emb0.select("vec_id", "label"), "vec_id",
            duplicate_clusters(p), "label",
        ).count()

    timed("semantic.exact_total", _sem_exact)
    timed(
        "semantic.srp_total",
        lambda: semantic_dedup(
            emb0, "vec_id", "embedding", "label", dim=64, min_cosine=0.4
        ).count(),
    )

    # ---- tf-idf / unigram LM / profile
    from sprout_spark.operators.terms import tfidf_top_terms

    timed(
        "top_terms",
        lambda: noop(tfidf_top_terms(docs, "doc_id", "text", 5)),
    )
    if only is None or any("top_terms" in o for o in only):
        save_plan(tfidf_top_terms(docs, "doc_id", "text", 5),
                  "top_terms", label)
    from sprout_spark.operators.lm import train_unigram_lm, unigram_logprob_scores

    def _lm():
        model = train_unigram_lm(
            docs.where(F.col("source").isin("src0", "src1", "src2", "src3")),
            "text", vocab_size=4096,
        )
        noop(unigram_logprob_scores(docs, "doc_id", "text", model))

    timed("unigram_lm", _lm)
    from sprout_spark.operators.profile import profile_table

    timed("profile_events", lambda: noop(profile_table(events)))
    if only is None or any("profile" in o for o in only):
        save_plan(profile_table(events), "profile_events", label)

    # ---- rollup build/query + downsample (bench shapes)
    from sprout_spark.sketch import HyperLogLog
    from sprout_spark.spark.rollup import SketchRollup

    def _rollup():
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            r = SketchRollup(
                td + "/r", factory=lambda: HyperLogLog(p=12), grain="day",
                dims=["event_type"],
            )
            r.append(events, "ts", "user_id")
            r.estimate_by(spark, lambda s: s.estimate()).select(
                F.sum("rows")
            ).collect()

    timed("rollup_build_query", _rollup)

    def _downsample():
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            r = SketchRollup(
                td + "/hr", factory=lambda: HyperLogLog(p=12), grain="hour"
            )
            r.append(events, "ts", "user_id")
            r.downsample(spark, td + "/day", "day").windows(spark).count()

    timed("rollup_downsample", _downsample)

    # ---- headline sketch-suite shapes, staged: scan-only vs build
    from sprout_spark.sketch import (
        KLL,
        BloomFilter,
        CountMinSketch,
        HyperLogLog as HLL2,
        TDigest,
    )
    from sprout_spark.spark.aggregate import (
        build_grouped_sketches,
        build_sketch,
        partial_sketches,
    )

    n_li = li.count()
    timed("suite.scan_only_noop", lambda: noop(li.select("l_orderkey")))
    timed(
        "suite.bloom_partials_noop",
        lambda: noop(partial_sketches(
            li, "l_orderkey", lambda: BloomFilter(n_li + 10, 0.001)
        )),
    )
    bf_holder = {}

    def _bloom_build():
        bf_holder["bf"] = build_sketch(
            li, "l_orderkey", lambda: BloomFilter(n_li + 10, 0.001), fanin=16
        )

    timed("suite.bloom_build", _bloom_build)
    from sprout_spark.spark.probe import might_contain

    timed(
        "suite.bloom_probe",
        lambda: li.where(
            might_contain(spark, bf_holder["bf"], F.col("l_orderkey"))
        ).count(),
    )
    if only is None or any("suite" in o for o in only):
        save_plan(
            li.where(might_contain(spark, bf_holder["bf"], F.col("l_orderkey"))),
            "bloom_probe", label,
        )
    from sprout_spark.spark.sharded import (
        build_sharded_bloom,
        sharded_might_contain,
    )

    sh_holder = {}

    def _sh_build():
        if "f" in sh_holder:
            sh_holder["f"].unpersist()
        sh_holder["f"] = build_sharded_bloom(
            li, "l_orderkey", n_shards=8, expected_distinct=n_li + 10
        ).cache()
        sh_holder["f"].count()

    timed("suite.sharded_build", _sh_build)
    timed(
        "suite.sharded_probe",
        lambda: sharded_might_contain(li, "l_orderkey", sh_holder["f"]).where(
            "might_contain"
        ).count(),
    )
    if only is None or any("suite" in o for o in only):
        save_plan(
            sharded_might_contain(li, "l_orderkey", sh_holder["f"]).where(
                "might_contain"
            ),
            "sharded_probe", label,
        )
    timed(
        "suite.hll_build",
        lambda: build_sketch(li, "l_orderkey", lambda: HLL2(p=14), fanin=16),
    )
    timed(
        "suite.cms_build",
        lambda: build_sketch(
            events, "event_type", lambda: CountMinSketch(0.0005, 0.01), fanin=16
        ),
    )
    timed(
        "suite.tdigest_build",
        lambda: build_sketch(
            li.select(F.col("l_extendedprice").cast("double").alias("v")),
            "v", lambda: TDigest(200), fanin=16,
        ),
    )
    timed(
        "suite.kll_build",
        lambda: build_sketch(
            li.select(F.col("l_extendedprice").cast("double").alias("v")),
            "v", lambda: KLL(200), fanin=16,
        ),
    )
    timed(
        "suite.grouped_hll",
        lambda: build_grouped_sketches(
            events, "event_type", "user_id", lambda: HLL2(p=12), salt=8
        ).count(),
    )

    docs.unpersist()
    print(json.dumps({"label": label, "sf": SF_DIR, "cpus": CPUS,
                      "times": times}))


if __name__ == "__main__":
    main()
