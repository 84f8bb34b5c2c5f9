"""tf-idf top terms (operators/terms.py): Python-reference equivalence
(smooth_log), rarity-mode DuckDB replay, min_df, guards, determinism,
and the map-side top-k plan."""

import math
import random

import duckdb
import pytest
from pyspark.sql import Row

from sprout_spark.operators.terms import tfidf_top_terms


def _df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


def _texts(seed, n_docs=50, vocab=40):
    rng = random.Random(seed)
    out = []
    for _ in range(n_docs):
        n = rng.randrange(0, 60)
        out.append(" ".join(f"w{rng.randrange(vocab)}" for _ in range(n)))
    return out


def _reference(texts, k, idf_mode, min_df=1):
    tf, docs_of = {}, {}
    for i, t in enumerate(texts):
        toks = t.lower().split()
        for w in toks:
            tf[(i, w)] = tf.get((i, w), 0) + 1
            docs_of.setdefault(w, set()).add(i)
    n = len({i for (i, _), _c in tf.items()})
    want = {}
    by_doc = {}
    for (i, w), c in tf.items():
        dfw = len(docs_of[w])
        if dfw < min_df:
            continue
        s = (
            c * (math.log((n + 1) / (dfw + 1)) + 1.0)
            if idf_mode == "smooth_log"
            else c / dfw
        )
        by_doc.setdefault(i, []).append((-s, w, c, dfw))
    for i, rows in by_doc.items():
        rows.sort()
        for rank, (negs, w, c, dfw) in enumerate(rows[:k], 1):
            want[(i, w)] = (c, dfw, -negs, rank)
    return want


@pytest.mark.parametrize("mode", ["smooth_log", "rarity"])
def test_matches_python_reference(spark, mode):
    texts = _texts(13)
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["score"], r["rank"])
        for r in tfidf_top_terms(_df(spark, texts), "doc_id", "text", 5, idf=mode).collect()
    }
    want = _reference(texts, 5, mode)
    assert set(got) == set(want)
    for key, (c, dfw, s, rank) in want.items():
        gc, gdf, gs, grank = got[key]
        assert (gc, gdf, grank) == (c, dfw, rank), key
        assert gs == pytest.approx(s, rel=1e-12)


def test_min_df_prunes(spark):
    texts = ["unique shared", "shared common", "common shared"]
    out = tfidf_top_terms(_df(spark, texts), "doc_id", "text", 5, min_df=2).collect()
    assert "unique" not in {r["term"] for r in out}


def test_guards_and_blank(spark):
    df = _df(spark, ["a b", "", "   ", None])
    assert {r["doc_id"] for r in tfidf_top_terms(df, "doc_id", "text", 3).collect()} == {0}
    with pytest.raises(ValueError, match="k must"):
        tfidf_top_terms(df, "doc_id", "text", 0)
    with pytest.raises(ValueError, match="min_df"):
        tfidf_top_terms(df, "doc_id", "text", 1, min_df=0)
    with pytest.raises(ValueError, match="idf"):
        tfidf_top_terms(df, "doc_id", "text", 1, idf="raw")


def test_rarity_duckdb_replay(spark):
    texts = _texts(29, n_docs=80, vocab=60)
    got = sorted(
        map(tuple, tfidf_top_terms(_df(spark, texts), "doc_id", "text", 4, idf="rarity").collect())
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", list(enumerate(texts)))
    want = sorted(
        map(
            tuple,
            con.execute(
                r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(
    regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+')) AS term
  FROM documents
  WHERE text IS NOT NULL AND length(regexp_replace(text, '\s', '', 'g')) > 0
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1)
SELECT doc_id, term, tf, df, score, rn FROM (
  SELECT tf.doc_id, tf.term, tf.tf, dfs.df,
         tf.tf * 1.0 / dfs.df AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * 1.0 / dfs.df DESC, tf.term) AS rn
  FROM tf JOIN dfs USING (term)
) WHERE rn <= 4
"""
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 200


def test_plan_map_side_topk(spark):
    plan = (
        tfidf_top_terms(_df(spark, ["a b a"]), "doc_id", "text", 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan
