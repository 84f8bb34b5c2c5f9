"""PII detection / redaction (functions/pii.py).

Covers: per-kind redaction + staged counts, specificity ordering (an SSN
is never double-counted as a phone; a dotted IP never aliases as a
phone), in-place vs out_col rewrites, NULL-text handling, corpus stats,
the quarantine split (clean side redacted, quarantined side UNREDACTED),
and the plan shape (map-only single projection — no shuffle, no Python).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sprout_spark.functions.pii import (
    PII_PATTERNS,
    pii_stats,
    quarantine_high_pii,
    redact_pii,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=0, text="mail me at alice.smith+x@sub.example.co today"),
        Row(doc_id=1, text="ssn is 123-45-6789 ok"),
        Row(doc_id=2, text="card 4111 1111 1111 1111 and 4111-1111-1111-1111"),
        Row(doc_id=3, text="host 10.0.200.1 port"),
        Row(doc_id=4, text="call +1 (415) 555-0100 now"),
        Row(doc_id=5, text="plain text, no pii at all"),
        Row(doc_id=6, text=None),
        Row(doc_id=7, text="a@b.io and 9.9.9.9 and 555-867-5309"),
    ]
    return spark.createDataFrame(rows)


def test_redact_all_kinds(docs):
    got = {
        r["doc_id"]: r
        for r in redact_pii(docs, "text").orderBy("doc_id").collect()
    }
    assert got[0]["text"] == "mail me at <EMAIL> today"
    assert got[0]["pii_email"] == 1 and got[0]["pii_total"] == 1
    assert got[1]["text"] == "ssn is <SSN> ok"
    assert got[1]["pii_ssn"] == 1 and got[1]["pii_phone"] == 0
    assert got[2]["text"] == "card <CARD> and <CARD>"
    assert got[2]["pii_card"] == 2
    assert got[3]["text"] == "host <IP> port"
    assert got[3]["pii_ipv4"] == 1 and got[3]["pii_phone"] == 0
    assert got[4]["text"] == "call <PHONE> now"
    assert got[4]["pii_phone"] == 1
    assert got[5]["text"] == "plain text, no pii at all"
    assert got[5]["pii_total"] == 0
    # NULL text: counts are 0 (not NULL), redacted text stays NULL
    assert got[6]["text"] is None and got[6]["pii_total"] == 0
    assert got[7]["pii_email"] == 1
    assert got[7]["pii_ipv4"] == 1
    assert got[7]["pii_phone"] == 1
    assert got[7]["pii_total"] == 3


def test_specificity_order_not_caller_order(docs):
    # caller lists phone first; ssn must still claim its text
    row = (
        redact_pii(docs, "text", kinds=["phone", "ssn"])
        .where(F.col("doc_id") == 1)
        .collect()[0]
    )
    assert row["text"] == "ssn is <SSN> ok"
    assert row["pii_ssn"] == 1 and row["pii_phone"] == 0


def test_out_col_preserves_original(docs):
    row = (
        redact_pii(docs, "text", out_col="clean")
        .where(F.col("doc_id") == 0)
        .collect()[0]
    )
    assert "alice" in row["text"] and row["clean"] == "mail me at <EMAIL> today"


def test_counts_off(docs):
    cols = redact_pii(docs, "text", counts=False).columns
    assert not [c for c in cols if c.startswith("pii_")]


def test_unknown_kind_raises(docs):
    with pytest.raises(ValueError, match="unknown PII kinds"):
        redact_pii(docs, "text", kinds=["email", "iban"])


def test_pii_stats(docs):
    got = {r["kind"]: r for r in pii_stats(docs, "text").collect()}
    assert set(got) == set(PII_PATTERNS)
    assert (got["email"]["docs_affected"], got["email"]["matches"]) == (2, 2)
    assert (got["card"]["docs_affected"], got["card"]["matches"]) == (1, 2)
    assert (got["phone"]["docs_affected"], got["phone"]["matches"]) == (2, 2)


def test_quarantine_split(docs):
    clean, bad = quarantine_high_pii(docs, "text", max_matches=1)
    clean_rows = {r["doc_id"]: r for r in clean.collect()}
    bad_rows = {r["doc_id"]: r for r in bad.collect()}
    # >1 match: docs 2 (two cards) and 7 (three kinds) quarantined
    assert set(bad_rows) == {2, 7}
    assert set(clean_rows) == {0, 1, 3, 4, 5, 6}
    # quarantined side is UNREDACTED; clean side is redacted
    assert "4111" in bad_rows[2]["text"]
    assert clean_rows[1]["text"] == "ssn is <SSN> ok"
    # schema unchanged on both sides (no pii_* meta, original order)
    assert clean.columns == docs.columns and bad.columns == docs.columns


def test_plan_is_map_only(docs):
    plan = redact_pii(docs, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
        assert marker not in plan, plan


def test_count_column_clash_refused(spark):
    df = spark.createDataFrame(
        [("a@b.co", 1)], "text string, pii_email int"
    )
    with pytest.raises(ValueError, match="already exist"):
        redact_pii(df, "text")
    # counts=False doesn't touch pii_* names, so no clash
    out = redact_pii(df, "text", counts=False).collect()[0]
    assert out["text"] == "<EMAIL>"
