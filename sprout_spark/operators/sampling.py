"""Deterministic stratified sampling — "cap N documents per stratum".

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
