"""Dense-vector column expressions over ArrayType(FloatType) embeddings.

All of these are built-in higher-order functions (zip_with / aggregate /
transform), i.e. JVM-side codegen — no Python in the hot path.  Arithmetic is
done in DOUBLE in array order, which makes results bit-comparable with a
DuckDB oracle that also evaluates sequentially in double (list_cosine_
similarity over a DOUBLE[] cast).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double-precision dot product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision.  A zero-norm side scores 0.0
    (not NaN): Spark's total order ranks NaN ABOVE every real double, so a
    0/0 cosine would let an all-zero vector beat a perfect match in any
    top-k — every cosine kernel in the engine states the same convention
    (see similarity._exact_all_pairs, safe_cosine_kernel)."""
    den = norm2(a) * norm2(b)
    return F.when(den == 0, F.lit(0.0)).otherwise(dot(a, b) / den)


def safe_cosine_kernel(num: "np.ndarray", den: "np.ndarray") -> "np.ndarray":
    """num/den with zero denominators mapped to 0.0 similarity — the
    numpy-side statement of `cosine`'s zero-norm convention, shared by
    every vectorized scoring kernel so the exact / LSH / brute / IVF paths
    can never disagree on degenerate vectors."""
    safe = np.where(den == 0, 1.0, den)
    out = np.asarray(num, dtype=np.float64) / safe
    out[den == 0] = 0.0
    return out


def masked_query_sims(
    vecs: pd.Series, q: "np.ndarray", qn: float
) -> pd.Series:
    """Cosine of each row vector against a fixed query vector, one numpy
    matvec per Arrow batch — NULL rows score NULL (np.stack on a None
    would crash the stage), zero-norm rows score 0.0
    (safe_cosine_kernel).  Shared by the brute-force and IVF scoring
    UDFs so the NULL/zero-norm conventions cannot drift between paths."""
    mask = vecs.isna().to_numpy()
    out = pd.array([None] * len(vecs), dtype="Float64")
    if (~mask).any():
        mat = np.stack(vecs[~mask].to_numpy()).astype(np.float64)
        den = np.linalg.norm(mat, axis=1) * qn
        out[~mask] = safe_cosine_kernel(mat @ q, den)
    return pd.Series(out)


def cosine_pairs_vectorized(a: Column, b: Column) -> Column:
    """Cosine similarity of row-aligned vector pairs as ONE numpy einsum per
    Arrow batch (pandas UDF).  Use for bulk pair scoring (candidate
    verification after an LSH join): the expression-tree `cosine` is
    ~0.5 ms/pair interpreted, this is ~1 µs/pair.  Double precision, same
    result as `cosine` to well past the 6-decimal contract rounding."""

    @F.pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        # NULL vectors score NULL, like the expression-tree `cosine` —
        # np.stack(None) would otherwise crash the whole stage on the
        # first NULL embedding in the corpus
        mask = (va.isna() | vb.isna()).to_numpy()
        out = pd.array([None] * len(va), dtype="Float64")
        if (~mask).any():
            A = np.stack(va[~mask].to_numpy()).astype(np.float64)
            B = np.stack(vb[~mask].to_numpy()).astype(np.float64)
            num = np.einsum("ij,ij->i", A, B)
            den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            out[~mask] = safe_cosine_kernel(num, den)
        return pd.Series(out)

    return _cos(a, b)


def scale(a: Column, s: Column) -> Column:
    """Element-wise scalar multiply."""
    return F.transform(a, lambda x: x.cast("double") * s)


def l2_normalize(a: Column) -> Column:
    """Unit-normalize; with unit vectors cosine == dot, which halves the
    arithmetic of a 100 TB brute-force scan and makes IVF centroids cheap.
    A zero vector stays a zero vector — 1/0 would raise DIVIDE_BY_ZERO
    under Spark 4's ANSI default (or yield an all-NULL vector otherwise),
    violating the module's zero-norm-scores-0.0 convention."""
    n = norm2(a)
    return F.when(n == 0, scale(a, F.lit(0.0))).otherwise(
        scale(a, F.lit(1.0) / n)
    )
