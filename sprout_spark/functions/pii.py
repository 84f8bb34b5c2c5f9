"""PII detection + redaction for training-data pipelines.

The standard pre-training scrub (C4 strips lines by blocklist; The Pile,
RefinedWeb, Dolma all run regex PII passes): find emails / SSNs / card
numbers / IPv4s / phone-like digit runs and replace each with a typed
placeholder token, keeping per-kind counts for corpus reporting and for
routing high-PII documents to quarantine.

Everything is pure ``pyspark.sql.functions`` regex expressions — JVM
whole-stage-codegen, ZERO shuffle, no Python anywhere: at 100 TB this is
a map-only pass whose cost is one scan, and Catalyst folds the staged
``regexp_replace`` chain into a single projection. The patterns are
deliberately restricted to the syntax subset Java regex and RE2 agree on
(no lookaround, no backreferences, no alternations of unequal length
inside a quantified group), so the exact same strings drive the DuckDB
oracle (`pii_redact_docs`) — portability is load-bearing for the
correctness gate, not a nicety.

Detection is heuristic by nature (a phone regex cannot know intent);
kinds are redacted in a fixed specificity order — email, ssn, card,
ipv4, then the greedy phone pattern last — so a more specific kind
always claims its text before a general one can (an SSN never double-
counts as a phone). Counts are taken per stage on the
previously-redacted text, which makes them order-consistent and
engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: most-specific first; phone (the greediest) last. Each value is
# (pattern, placeholder). Patterns use only Java-regex ∩ RE2 syntax.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    "ssn": (
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<SSN>",
    ),
    "card": (
        # 16 digits in 4-groups with a uniform separator (or none):
        # spaced/dashed/plain forms; \b keeps it out of longer digit runs
        r"\b[0-9]{4}([ -]?)[0-9]{4}([ -]?)[0-9]{4}([ -]?)[0-9]{4}\b",
        "<CARD>",
    ),
    "ipv4": (
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    "phone": (
        # digit-led run of digits/space/()/- (7-16 chars), optional +CC;
        # dots excluded so dotted IPs can never alias as phones
        r"\+?[0-9][0-9() -]{5,14}[0-9]",
        "<PHONE>",
    ),
}


def _resolve_kinds(kinds) -> list[str]:
    if kinds is None:
        return list(PII_PATTERNS)
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(
            f"unknown PII kinds {unknown}; known: {list(PII_PATTERNS)}"
        )
    # always apply in the canonical specificity order regardless of the
    # order the caller listed them — order changes what counts as what
    return [k for k in PII_PATTERNS if k in set(kinds)]


def redact_pii(
    df: DataFrame,
    text_col: str,
    kinds: list[str] | None = None,
    out_col: str | None = None,
    counts: bool = True,
) -> DataFrame:
    """Redact PII in ``text_col``: each match becomes its placeholder
    token; with ``counts`` a ``pii_<kind>`` column per kind (matches
    claimed by THAT kind at its stage) and a ``pii_total`` land too.
    ``out_col`` defaults to replacing the text column in place. One
    map-only projection — no shuffle, no Python."""
    out_col = out_col or text_col
    order = _resolve_kinds(kinds)
    if counts:
        clash = [
            c
            for c in (*[f"pii_{k}" for k in order], "pii_total")
            if c in df.columns
        ]
        if clash:
            raise ValueError(
                f"count columns {clash} already exist on the input; "
                "drop or rename them (withColumn would silently clobber)"
            )
    staged: Column = F.col(text_col)
    count_cols: dict[str, Column] = {}
    for kind in order:
        pat, token = PII_PATTERNS[kind]
        if counts:
            # coalesce: NULL text means zero matches, not an unknown count
            # (otherwise NULL-text docs vanish from BOTH quarantine sides)
            count_cols[f"pii_{kind}"] = F.coalesce(
                F.regexp_count(staged, F.lit(pat)), F.lit(0)
            )
        staged = F.regexp_replace(staged, pat, token)
    # counts FIRST, rewrite LAST: when out_col == text_col the count
    # expressions reference the original column by name, so adding them
    # after the replace would resolve against the already-redacted text
    # and count zero matches for every kind.
    res = df
    if counts:
        for name, c in count_cols.items():
            res = res.withColumn(name, c)
        total = None
        for name in count_cols:
            total = F.col(name) if total is None else total + F.col(name)
        res = res.withColumn("pii_total", total)
    return res.withColumn(out_col, staged)


def pii_stats(
    df: DataFrame, text_col: str, kinds: list[str] | None = None
) -> DataFrame:
    """Corpus-level PII report: one row per kind — documents affected,
    total matches — for deciding whether a source needs quarantining
    before any rewrite is paid for. Single aggregation over the staged
    counts (same stage semantics as :func:`redact_pii`)."""
    order = _resolve_kinds(kinds)
    counted = redact_pii(
        df.select(text_col), text_col, kinds=order, counts=True
    )
    rows = [
        F.struct(
            F.lit(kind).alias("kind"),
            F.sum(F.when(F.col(f"pii_{kind}") > 0, 1).otherwise(0)).alias(
                "docs_affected"
            ),
            F.sum(f"pii_{kind}").alias("matches"),
        )
        for kind in order
    ]
    return (
        counted.agg(F.array(*rows).alias("kinds"))
        .select(F.explode("kinds").alias("k"))
        .select("k.kind", "k.docs_affected", "k.matches")
    )


def quarantine_high_pii(
    df: DataFrame,
    text_col: str,
    max_matches: int = 0,
    kinds: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split into (clean, quarantined): documents with more than
    ``max_matches`` PII hits are routed aside UNREDACTED for review
    (redacting a dense PII doc usually leaves worthless text — dropping
    beats scrubbing there); the clean side comes back redacted. Both
    sides are filters over ONE staged map-only projection (the redacted
    text rides a temp column so the original is never lost) — no join,
    no shuffle; Catalyst reuses the projection across the two reads."""
    tmp = f"__pii_redacted_{text_col}"
    while tmp in df.columns:  # collision-proof temp name
        tmp += "_"
    counted = redact_pii(df, text_col, kinds=kinds, out_col=tmp, counts=True)
    clean = counted.where(F.col("pii_total") <= max_matches).select(
        *[
            F.col(tmp).alias(text_col) if c == text_col else F.col(c)
            for c in df.columns
        ]
    )
    bad = counted.where(F.col("pii_total") > max_matches).select(*df.columns)
    return clean, bad
