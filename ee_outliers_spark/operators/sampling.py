"""Deterministic sampling / splitting for training-data pipelines.

Not in the reference (ee-outliers never samples) — added as first-class
engine operators per the build brief: every large-scale training pipeline
needs reproducible train/val/test splits and per-stratum downsampling that
(a) are stable across runs, engines and cluster sizes, (b) never shuffle —
assignment is a pure narrow map on a content-independent key hash, so the
plan at 100 TB is scan → project → filter with zero exchanges, and (c) can
be recomputed exactly in SQL for auditing (the same md5 arithmetic the
dedup/MinHash oracles use — ``md5_long_expr`` / ``md5_long_sql``).

Assignment rule: bucket(id) = md5(seed || ':' || id) as a 60-bit integer
mod DENOM (10^6). A row goes to the first split whose cumulative weight
covers bucket/DENOM; a stratified sample keeps rows with bucket < f·DENOM
within their stratum (hashing the stratum value into the key decorrelates
strata drawn from the same ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long_expr, md5_long_sql

DENOM = 1_000_000


def _bucket_col(id_col: Column, seed: int) -> Column:
    return md5_long_expr(
        F.concat(F.lit(f"{seed}:"), id_col.cast("string"))) % DENOM


def bucket_sql(id_expr: str, seed: int) -> str:
    """The identical bucket in DuckDB SQL (audit / oracle twin)."""
    return (md5_long_sql(f"concat('{seed}:', CAST({id_expr} AS VARCHAR))")
            + f" % {DENOM}")


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """df + a ``split`` column assigning each row to one of the named
    splits with the given weights (must sum to ~1). Deterministic in
    (id, seed): re-running, re-partitioning or scaling the cluster never
    moves a row between splits — the property that keeps eval sets
    uncontaminated across pipeline re-runs."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = _bucket_col(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = b < int(round(acc * DENOM))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def split_case_sql(id_expr: str, weights: dict[str, float],
                   seed: int = 42) -> str:
    """CASE expression computing the identical split label in DuckDB."""
    b = bucket_sql(id_expr, seed)
    parts = []
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        parts.append(f"WHEN {b} < {int(round(acc * DENOM))} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_cols: list[str],
    fractions: dict | float,
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff its bucket (hashed
    WITH the stratum value, so strata are independent draws even over the
    same ids) falls under the stratum's fraction. ``fractions`` is a single
    float or a dict {stratum value: fraction} with missing strata dropped
    (fraction 0) — the usual 'cap the head language, keep the tail' move
    in corpus balancing. Pure narrow map: no shuffle at any scale."""
    key = F.concat_ws("\x01", *[F.col(c).cast("string")
                                for c in strata_cols])
    b = md5_long_expr(
        F.concat(F.lit(f"{seed}:"), key, F.lit(":"),
                 F.col(id_col).cast("string"))) % DENOM
    if isinstance(fractions, dict):
        thr = None
        for val, frac in fractions.items():
            sval = "\x01".join(str(v) for v in val) if isinstance(
                val, tuple) else str(val)
            cond = key == F.lit(sval)
            thr = (F.when(cond, F.lit(float(frac))) if thr is None
                   else thr.when(cond, F.lit(float(frac))))
        thr = thr.otherwise(F.lit(0.0))
    else:
        thr = F.lit(float(fractions))
    return df.where(b < (thr * DENOM).cast("long"))


def stratified_bucket_sql(id_expr: str, strata_exprs: list[str],
                          seed: int = 42) -> str:
    """The identical per-stratum bucket in DuckDB SQL."""
    key = ("concat_ws(chr(1), "
           + ", ".join(f"CAST({e} AS VARCHAR)" for e in strata_exprs) + ")")
    return (md5_long_sql(
        f"concat('{seed}:', {key}, ':', CAST({id_expr} AS VARCHAR))")
        + f" % {DENOM}")
