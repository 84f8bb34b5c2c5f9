"""Opt-in sf0.1 oracle gate (VERDICT r3 item 5): the scale-sensitive
dedup/ANN/cluster queries, exercised at 10x the driver gate's data.

The sf0.1 documents corpus is PATHOLOGICALLY self-similar (5000 docs
drawn from a tiny vocabulary: 964,854 true pairs at j>=0.9 — ~8% of all
pairs qualify), which makes it a genuinely adversarial fixture for the
unguarded LSH path: band buckets hold thousands of members and the
candidate join really is near-quadratic. The gate embraces that:

* full DuckDB oracles where tractable (stratified sample, batch ANN,
  and — measured at 23s — the full all-pairs Jaccard oracle itself);
* the pair check compares a deterministic WINDOW (a%10==0 and b%10==0)
  of the FULL-corpus Spark run against the window slice of the full
  DuckDB oracle — signatures and bucket membership are per-document
  (max_bucket=None), so the restriction is exact, and comparing ~9.6k
  windowed pairs keeps the python-side compare linear;
* the transitive-closure stage is checked against an independent exact
  union-find over the full ~1M-edge Spark pair set (the recursive-CTE
  closure that the sf0.01 gate uses produces component^2 intermediate
  rows and does not finish here — the ALGORITHM in DuckDB is the
  bottleneck, not the data).

A dedicated local[16] session (not the suite's local[4]) keeps the
near-quadratic candidate verify parallel enough to finish in minutes.

Run:  SPARK_GRAFT_SF01_GATE=1 python -m pytest tests/test_sf01_gate.py -q
(latest run recorded in TESTDATA.md).
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF01 = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SF01_GATE"),
    reason="sf0.1 gate is opt-in (SPARK_GRAFT_SF01_GATE=1); several minutes",
)


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def _rows_to_set(cols, rows):
    return sorted(tuple(_norm(r[c]) for c in cols) for r in rows)


@pytest.fixture(scope="module")
def spark01():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[16]")
        .appName("sprout-spark-sf01-gate")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    # every table present at sf0.1 (the quantile gate reads lineitem)
    for t in entrymod.queries.__globals__["load"].__globals__["TABLES"]:
        p = os.path.join(SF01, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _min_label_components(pairs):
    """Exact min-label connected components via union-find — the
    independent oracle for duplicate_clusters at full edge volume."""
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent) + [x for p in pairs for x in p]}


@pytest.mark.parametrize(
    "name",
    [
        "stratified_sample_documents",
        "ann_ivf_batch_topk",
        # VERDICT r4 #8: the streaming + sharded paths at 10x keys —
        # the bucketed seen-store pruning, per-shard SBF growth, and
        # watermarked windowed state all have linear oracles, so they
        # run the unchanged full comparison
        "streaming_novel_docs",
        "sharded_sbf_recall",
        "windowed_hll_events",
        # line-level dedup: counts/joins on trimmed lines are linear in
        # both engines; at sf0.1 the derived corpus is ~90k lines over
        # ~1k distinct norms — maximal-boilerplate stress for the
        # bloom-pruned verify (nearly every line is a suspect)
        "strip_boilerplate_docs",
        "dedup_lines_keep_first",
        # PII scrub: one map-only regex projection per engine — strictly
        # linear; sf0.1 adds corpus text that exercises the patterns
        # against real digit runs, not just the injected strings
        "pii_redact_docs",
        "pii_stats_docs",
        # corpus organization: split is map-only, shuffle-shard is one
        # window per shard — both linear in both engines
        "split_corpus_documents",
        "shuffle_shards_documents",
        # sketch-guided exact quantiles: a handful of pruned scans per
        # engine; sf0.1 forces several narrowing passes on lineitem
        "exact_quantile_lineitem",
        "trim_docs_length_band",
        # sessionization: one windowed pass per engine (lag + cumsum +
        # group) — linear; sf0.1 stresses per-key window volume
        "session_stats_events",
        # as-of join: one union+window pass vs DuckDB's native sort-based
        # ASOF — both linear; sf0.1 stresses carry-forward chain length
        "asof_join_events",
        # sequence packing: window cumsum + span explode per engine —
        # linear; sf0.1 packs ~50k docs into ~8 shards of sequences
        "pack_spans_documents",
        # chunking: row-local window explode per engine — linear
        "chunk_documents",
        # tf-idf top terms: token groupBys + one join + window top-k —
        # linear in corpus token count in both engines
        "top_terms_documents",
        # profiler: two scans + sketch merges vs five SQL aggregate
        # arms — linear; estimate booleans re-verified at 10x rows
        "profile_events",
        # vocab + encoding: token groupBy + TakeOrdered + broadcast
        # join per engine — linear in corpus token count
        "encode_tokens_documents",
        # skew + histogram diagnostics: one aggregate per engine
        "key_skew_events",
        "histogram_lineitem",
        # sequence assembly: one grouped sort-agg per engine — linear;
        # sf0.1 gives ~600k-event per-user sequences
        "user_event_sequences",
        # composed chunk->pack chain: windows + cumsum + series per
        # engine — linear end to end
        "pipeline_training_prep",
        # composed sessionize->assemble chain: two windows + a grouped
        # sort-agg per engine — linear
        "session_event_sequences",
        # heavy n-grams: the oracle is one linear gram groupBy; at sf0.1
        # the relative-frequency ceiling drops to ~9.6e-5, so phi=8e-5
        # exercises the MG propose/confirm margin at its tightest
        "heavy_ngrams_docs",
        # persisted rollups: per-day (and per-(day,type)) counts are one
        # linear groupBy per engine; sf0.1 runs the blind two-epoch
        # append + range merge over ~23.5k in-range events
        "rollup_hll_user_range",
        "rollup_type_day_distinct",
        "rollup_tdigest_value_range",
        "rollup_cms_type_range",
        # round-5 family completion: KLL through the rollup (compactor
        # merge at 10x rows), Bloom range membership (zero-FN over
        # ~23.5k in-range adds), MG range heavy hitters (merged-deficit
        # guard at real volume) — all linear oracles
        "rollup_kll_value_range",
        "rollup_bloom_user_range",
        "rollup_mg_type_range",
        # hierarchy step: hour->day fold == direct day build, byte
        # equality re-proven over ~816 hour windows at 10x rows
        "rollup_downsample_day",
        # CCNet bucketing: one window per engine over integer scores —
        # linear; sf0.1 ranks ~50k docs within each source group
        "quality_buckets_docs",
        # SemDeDup decision chain: 2000 vectors -> 920 exact pairs at
        # tau=0.4; the all-pairs cosine oracle + recursive closure are
        # sub-second in DuckDB at this embedding-table scale
        "semantic_dedup_embeddings",
        # unigram LM scoring: token groupBys + broadcast join — linear
        # in corpus token count; sf0.1 re-verifies the ln-score
        # independent recompute over ~5k docs
        "unigram_lm_docs",
    ],
)
def test_full_oracle_at_sf01(spark01, ddb, name):
    """Queries whose oracles are linear/windowed run the UNCHANGED
    driver-gate comparison, just at sf0.1."""
    df = entrymod.queries()[name](spark01, SF01)
    cols = sorted(df.columns)
    got = _rows_to_set(cols, [r.asDict() for r in df.collect()])
    res = ddb.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert sorted(res.columns.tolist()) == cols
    want = _rows_to_set(cols, res.to_dict("records"))
    assert len(got) == len(want) and got == want, name


def test_minhash_pairs_sf01_window_vs_full_oracle(spark01, ddb):
    """Full-corpus LSH+verify at sf0.1: the window slice of the Spark
    result must equal the window slice of the full exact oracle."""
    pairs = entrymod.queries()["minhash_near_dup_pairs"](spark01, SF01)
    got = {
        (r["a"], r["b"])
        for r in pairs.where("a % 10 = 0 AND b % 10 = 0").collect()
    }
    sql = entrymod.oracle_sql()["minhash_near_dup_pairs"]
    want = {
        (int(a), int(b))
        for a, b in ddb.execute(
            f"SELECT a, b FROM ({sql}) WHERE a % 10 = 0 AND b % 10 = 0"
        ).fetchall()
    }
    assert len(want) > 1000  # the adversarial corpus really fires
    assert got == want


def test_clusters_and_pipeline_sf01_stage_oracle(spark01, ddb):
    """Pointer-jumping clustering and the composed cleaning pipeline at
    full sf0.1 edge volume (~1M pairs), gated against an exact python
    union-find + DuckDB for the non-graph stages."""
    from sprout_spark.operators.dedup import (
        duplicate_clusters,
        exact_dedup,
        near_dup_pairs,
    )

    docs = entrymod.queries.__globals__["load"](spark01, SF01, "documents")
    keep_exact = exact_dedup(docs, "doc_id", ["text"]).select("doc_id")
    kept = docs.join(keep_exact, "doc_id", "left_semi")
    pairs_df = near_dup_pairs(
        kept, "doc_id", "text", threshold=0.9, max_bucket=None
    )
    pairs = [(r["a"], r["b"]) for r in pairs_df.select("a", "b").collect()]
    assert len(pairs) > 100_000  # full edge volume, not a toy slice

    comp = _min_label_components(pairs)
    got_clusters = {
        (r["id"], r["cluster"])
        for r in duplicate_clusters(
            spark01.createDataFrame(pairs, "a bigint, b bigint")
        ).collect()
    }
    want_clusters = {(i, c) for i, c in comp.items()}
    assert got_clusters == want_clusters

    # composed pipeline: closure stage from the union-find, the rest SQL
    dropped = sorted(i for i, c in comp.items() if i != c)
    ddb.execute("CREATE OR REPLACE TABLE dropped(id BIGINT)")
    ddb.executemany("INSERT INTO dropped VALUES (?)", [(i,) for i in dropped])
    got_pipe = _rows_to_set(
        ["doc_id", "n_ws_tokens"],
        [
            r.asDict()
            for r in entrymod.queries()["pipeline_corpus_clean"](
                spark01, SF01
            ).collect()
        ],
    )
    res = ddb.execute(
        """
WITH dedup AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
),
kept AS (
  SELECT d.doc_id, d.text FROM documents d JOIN dedup USING (doc_id)
),
survivors AS (
  SELECT doc_id, text FROM kept
  WHERE doc_id NOT IN (SELECT id FROM dropped)
),
q AS (
  SELECT doc_id,
         CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$', '', 'g')) = 0 THEN 0
              ELSE len(string_split_regex(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+')) END AS n_ws_tokens,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
           AS n_punct
  FROM survivors
)
SELECT doc_id, n_ws_tokens FROM q
WHERE n_ws_tokens >= 5 AND 4 * n_punct <= n_chars
ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
LIMIT 100
"""
    ).fetchdf()
    want_pipe = _rows_to_set(["doc_id", "n_ws_tokens"], res.to_dict("records"))
    assert got_pipe == want_pipe
