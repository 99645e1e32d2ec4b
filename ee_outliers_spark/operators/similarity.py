"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``      — brute-force exact top-k: JVM-side zip_with/aggregate
                         dot product (whole-stage codegen, no Python), then
                         TakeOrdered. The correctness baseline.
- ``lsh_topk``         — random-hyperplane LSH: deterministic seeded planes,
                         sign-bit bucket codes, multi-probe candidate set
                         (Hamming ≤ r on the code), exact rerank inside the
                         candidate set. The 10^12-row path: the scan prunes
                         to matching buckets before any dot product.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x)


def cosine_scores(df: DataFrame, id_col: str, vec_col: str,
                  query: list[float]) -> DataFrame:
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    qlit = F.array(*[F.lit(float(x)) for x in q])
    v = _as_double(F.col(vec_col))
    vn = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    cos = _dot(v, qlit) / (vn * F.lit(qn))
    return df.select(F.col(id_col), cos.alias("cosine")).where(
        F.col("cosine").isNotNull()
    )


def cosine_topk(df: DataFrame, id_col: str, vec_col: str,
                query: list[float], k: int) -> DataFrame:
    """Exact top-k by cosine (desc), id asc tiebreak → (id, cosine)."""
    return (
        cosine_scores(df, id_col, vec_col, query)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# --- random-hyperplane LSH ------------------------------------------------------

def _planes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_bits, dim))


def lsh_code_col(vec_col, planes: np.ndarray):
    """Bit code: sign of <v, plane_i> per plane, packed into a long —
    pure column expressions (codegen), planes inlined as literals."""
    v = _as_double(vec_col if not isinstance(vec_col, str) else F.col(vec_col))
    code = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plit = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(v, plit) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        code = code + F.shiftleft(bit, i)
    return code


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int,
    n_bits: int = 8,
    probe_hamming: int = 1,
    n_tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k, multi-table random-hyperplane LSH: L independent
    tables of n_bits planes each; a row is a candidate if ANY table's code is
    within ``probe_hamming`` bits of the query's code in that table; exact
    cosine rerank inside the candidate set.

    At scale each table's code is a persisted/bucketed column and the
    candidate filter prunes the scan to matching buckets (multi-probe keeps
    the table count low); here codes are computed inline. Recall/cost knob:
    more tables or a larger probe radius → higher recall, more candidates."""
    dim = len(query)
    q = np.asarray(query, dtype=np.float64)
    cond = F.lit(False)
    row = df
    for t in range(n_tables):
        planes = _planes(dim, n_bits, seed + 1000 * t)
        qcode = int(((planes @ q) >= 0).astype(np.int64) @ (1 << np.arange(n_bits)))
        code = lsh_code_col(vec_col, planes)
        cond = cond | (
            F.bit_count(code.bitwiseXOR(F.lit(qcode))) <= probe_hamming
        )
    cands = row.where(cond)
    return cosine_topk(cands, id_col, vec_col, query, k)
