"""Deterministic stratified sampling — "cap N documents per stratum",
and budget sampling — "cap N tokens/bytes per stratum".

Training-data pipelines constantly need a per-group cap: at most N docs
per domain / language / source, chosen uniformly and REPRODUCIBLY (the
same corpus must yield the same sample on every run, or dataset versioning
breaks). The primitive here is per-group bottom-n by a deterministic key
hash — the grouped analogue of the KMV bottom-k sample
(``sketch/bottomk.py``), expressed declaratively so Catalyst plans it.

Scale shape: on Spark >= 3.5 Catalyst plans ``row_number() <= n`` as
``WindowGroupLimit Partial -> Exchange -> WindowGroupLimit Final`` — a
MAP-SIDE bottom-n per group before the shuffle (verified in
``tests/test_plans.py``), so a hot stratum's reduce task receives at
most ``n * map_tasks`` rows, never the stratum's full row count, and the
single-window form is already skew-safe. The optional ``salt`` keeps an
explicit two-phase fallback for engines without rank-limit pushdown:

1. rank within (group, salt) — ``salt`` parallel tasks per group, each
   keeping its local bottom-n;
2. rank the <= n*salt survivors per group.

Phase 1 never discards a global winner: a row in its group's true
bottom-n has fewer than n group rows hashing ahead of it overall, hence
fewer than n in its own salt bucket, so its in-bucket rank is <= n.
(With pushdown available the salted form just adds a second exchange —
hence the ``salt=1`` default; the equality of both forms is tested.)

With ``hash_mode="portable"`` the order key is ``md5(cast(key as
string))`` — the one hash Spark and DuckDB share — so the sample is
bit-reproducible by plain SQL (the oracle gate checks it). Use
``hash_mode="xxhash64"`` for large runs (JVM codegen, no string
round-trip).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _order_hash(key_col: str, hash_mode: str) -> Column:
    if hash_mode == "portable":
        return F.md5(F.col(key_col).cast("string"))
    if hash_mode == "xxhash64":
        return F.xxhash64(F.col(key_col))
    raise ValueError("hash_mode must be 'portable' or 'xxhash64'")


def stratified_sample(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    n_per_group: int,
    salt: int = 1,
    hash_mode: str = "portable",
) -> DataFrame:
    """At most ``n_per_group`` rows per ``group_cols`` stratum, chosen as
    the bottom-``n`` of a deterministic hash of ``key_col`` (uniform over
    keys, identical on every rerun and at any parallelism). Returns the
    input columns unchanged.

    PRECONDITION: ``key_col`` must uniquely identify rows (a doc_id /
    primary key). Rows sharing a key tie on the whole (hash, key) sort
    tuple, and ``row_number`` breaks ties by physical order — rerun
    stability and the salted==unsalted equivalence then no longer hold at
    the rank-``n`` boundary. Deduplicate or synthesize a unique key first.

    The default ``salt=1`` single-window form is skew-safe on this Spark:
    Catalyst's rank-limit pushdown keeps a map-side bottom-n per group
    before the shuffle (see module docstring). ``salt>1`` selects the
    explicit two-phase variant (identical output, one extra exchange)
    for engines without the pushdown.

    Portability caveat: NULL ``key_col`` values hash to NULL and sort
    NULLS FIRST in Spark but NULLS LAST in ANSI/DuckDB ``ORDER BY ... ASC``
    — filter null keys upstream if the sample must be engine-portable.
    NULL group values are consistent (both engines group them together).
    """
    if n_per_group < 1:
        raise ValueError("n_per_group must be >= 1")
    salt = max(1, int(salt))

    # collision-free temp names: an input column literally named "_sh"
    # would otherwise be silently overwritten and dropped from the output
    def _tmp(base: str) -> str:
        name = base
        while name in df.columns:
            name += "_"
        return name

    c_sh, c_sb, c_r1, c_r2 = (_tmp(b) for b in ("_sh", "_sb", "_r1", "_r2"))
    h = _order_hash(key_col, hash_mode)
    tagged = df.withColumn(c_sh, h)
    if salt > 1:
        tagged = tagged.withColumn(
            c_sb, F.pmod(F.xxhash64(F.col(key_col), F.lit(1)), F.lit(salt))
        )
        w1 = Window.partitionBy(*group_cols, c_sb).orderBy(c_sh, key_col)
        tagged = (
            tagged.withColumn(c_r1, F.row_number().over(w1))
            .where(F.col(c_r1) <= n_per_group)
            .drop(c_r1, c_sb)
        )
    w2 = Window.partitionBy(*group_cols).orderBy(c_sh, key_col)
    return (
        tagged.withColumn(c_r2, F.row_number().over(w2))
        .where(F.col(c_r2) <= n_per_group)
        .drop(c_r2, c_sh)
    )


# number of hash-prefix buckets for budget_sample's two-phase plan; a
# power of 16 so the portable (hex md5) bucket is a string prefix and
# bucket order provably agrees with the row order for both hash modes
_BUDGET_BUCKETS = 4096


def budget_sample(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    weight_col: str,
    budget: int,
    hash_mode: str = "portable",
) -> DataFrame:
    """Per-stratum WEIGHT-budget sample: the training-mix primitive
    "take at most ``budget`` tokens (bytes, chars, ...) per source".

    Within each ``group_cols`` stratum, rows are ordered by a
    deterministic hash of ``key_col`` (uniform over keys, identical on
    every rerun and at any parallelism — the same order
    :func:`stratified_sample` uses) and the maximal PREFIX whose
    cumulative ``weight_col`` stays ``<= budget`` is kept. Returns the
    input columns unchanged. Rows with NULL or non-positive weight are
    excluded up front (they cannot consume budget, and zero-weight rows
    would make the maximal-prefix rule order-ambiguous).

    PRECONDITION: ``key_col`` uniquely identifies rows (ties on the
    (hash, key) order tuple would make the boundary nondeterministic).

    Scale shape — the naive form is one window cumsum per stratum, which
    SORTS every stratum end to end (a hot source's whole row set through
    one task). This runs the identical decision in two phases instead:

    1. bucket rows by the top hash prefix (4096 buckets, order-aligned
       with the row order); per (stratum, bucket) weight sums make a
       histogram of at most 4096 rows per stratum;
    2. a window cumsum over the HISTOGRAM classifies each bucket: wholly
       inside the budget (every row passes — no sort ever touches
       them), wholly beyond (dropped), or the single boundary bucket per
       stratum, whose rows alone — ~1/4096 of the stratum — get the
       exact row-level cumsum at the bucket's starting offset.

    Positive weights make the classification exact (cumulative weight is
    strictly increasing), so the result is row-for-row identical to the
    naive global window (tested). The rows pass through two joins
    against the small classification table (AQE broadcasts it when
    small); the input is scanned twice (pass-through + boundary) —
    materialize upstream if it is not a cheap scan.

    ``hash_mode="portable"`` orders by ``md5(cast(key as string))`` so
    plain SQL reproduces the sample bit-for-bit (the oracle gate);
    ``"xxhash64"`` is the JVM-codegen throughput path.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")

    def _tmp(base: str) -> str:
        name = base
        while name in df.columns:
            name += "_"
        return name

    c_sh, c_b, c_bw, c_off, c_cls, c_cum = (
        _tmp(b) for b in ("_sh", "_b", "_bw", "_off", "_cls", "_cum")
    )
    w = F.col(weight_col)
    rows = df.where(w.isNotNull() & (w > 0)).withColumn(
        c_sh, _order_hash(key_col, hash_mode)
    )
    if hash_mode == "portable":
        # first 3 hex chars: a string PREFIX of the (lowercase hex) md5,
        # so bucket order is consistent with the lexicographic row order
        bucket = F.conv(F.substring(F.col(c_sh), 1, 3), 16, 10).cast("int")
    else:
        # arithmetic shift keeps signed order: top 12 bits, [-2048, 2047]
        bucket = F.shiftright(F.col(c_sh), 52).cast("int")
    rows = rows.withColumn(c_b, bucket)

    hist = rows.groupBy(*group_cols, c_b).agg(F.sum(w).alias(c_bw))
    wh = (
        Window.partitionBy(*group_cols)
        .orderBy(c_b)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(c_bw).over(wh)
    classified = hist.select(
        *group_cols,
        c_b,
        (cum - F.col(c_bw)).alias(c_off),  # weight strictly before bucket
        F.when(cum <= budget, F.lit(1))  # wholly in
        .when(cum - F.col(c_bw) >= budget, F.lit(-1))  # wholly out
        .otherwise(F.lit(0))  # the one boundary bucket per stratum
        .alias(c_cls),
    ).where(F.col(c_cls) >= 0)

    # NULL-safe join keys: NULL strata group together in groupBy and
    # must keep matching their own histogram rows here. Explicit frame
    # aliases: the histogram derives from `rows`, so same-name columns
    # share attribute ids and an unaliased condition is ambiguous.
    ra, ca = "__budget_rows__", "__budget_hist__"
    r_f, c_f = rows.alias(ra), classified.alias(ca)
    cond = [
        F.col(f"{ra}.{c}").eqNullSafe(F.col(f"{ca}.{c}")) for c in group_cols
    ]
    cond.append(F.col(f"{ra}.{c_b}") == F.col(f"{ca}.{c_b}"))
    joined = r_f.join(c_f, cond, "inner").select(
        f"{ra}.*", F.col(f"{ca}.{c_off}").alias(c_off),
        F.col(f"{ca}.{c_cls}").alias(c_cls),
    )

    keep_whole = joined.where(F.col(c_cls) == 1)
    wb = (
        Window.partitionBy(*group_cols, c_b)
        .orderBy(c_sh, key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boundary = (
        joined.where(F.col(c_cls) == 0)
        .withColumn(c_cum, F.col(c_off) + F.sum(w).over(wb))
        .where(F.col(c_cum) <= budget)
        .drop(c_cum)
    )
    out_cols = df.columns
    return keep_whole.select(*out_cols).unionByName(
        boundary.select(*out_cols)
    )
