"""Bit-exactness contract for the unrolled vector-expression builders.

similarity.* ships two forms of every vector primitive: the HOF fold
(`F.aggregate`/`F.zip_with`, interpreted) and the statically-unrolled SQL
text (`dot_sql`/`sqnorm_sql`/`l2sq_sql`/`dot_lit_sql`/`cosine_lit_sql`,
whole-stage codegen). The module promises they are IEEE-754 bit-identical
(both associate strictly left; 0.0+x == x), so swapping one for the other
can never flip an oracle-parity hash. This test IS that promise: raw
unrounded equality (===, not approx) across every builder on adversarial
vectors — denormals, huge/tiny magnitude mixes, negative zeros.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from sparkfulltextquery_spark.similarity import (
    cosine_lit_sql,
    dot_expr,
    dot_lit_sql,
    dot_sql,
    l2sq_sql,
    norm_expr,
    norm_lit,
    sqnorm_expr,
    sqnorm_sql,
)

DIM = 64


def _vecs(seed: int, n: int = 200) -> list[list[float]]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        scale = 10.0 ** rng.randint(-12, 12)
        out.append(
            [rng.uniform(-1.0, 1.0) * scale * (0.0 if rng.random() < 0.02 else 1.0)
             for _ in range(DIM)]
        )
    return out


@pytest.fixture(scope="module")
def pairs_df(spark):
    va = _vecs(1)
    vb = _vecs(2)
    return spark.createDataFrame(
        [(a, b) for a, b in zip(va, vb)], "va array<double>, vb array<double>"
    )


def _all_equal(df, left, right):
    """Raw float64 equality — NaN-free inputs, so `=` is the right op; a
    single bit of drift fails."""
    bad = df.filter(~(left.eqNullSafe(right))).count()
    assert bad == 0, f"{bad} rows differ bitwise"


def test_dot_sql_bitwise_equals_fold(pairs_df):
    _all_equal(
        pairs_df,
        F.expr(dot_sql("va", "vb", DIM)),
        dot_expr(F.col("va"), F.col("vb")),
    )


def test_sqnorm_sql_bitwise_equals_fold(pairs_df):
    _all_equal(
        pairs_df,
        F.expr(sqnorm_sql("va", DIM)),
        sqnorm_expr(F.col("va")),
    )


def test_l2sq_sql_bitwise_equals_fold(pairs_df):
    fold = F.aggregate(
        F.zip_with("va", "vb", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    _all_equal(pairs_df, F.expr(l2sq_sql("va", "vb", DIM)), fold)


def test_dot_lit_sql_bitwise_equals_fold(pairs_df, spark):
    q = _vecs(3, n=1)[0]
    qlit = F.array(*[F.lit(float(x)) for x in q])
    _all_equal(
        pairs_df,
        F.expr(dot_lit_sql("va", q)),
        dot_expr(F.col("va"), qlit),
    )


def test_cosine_lit_sql_bitwise_equals_fold(pairs_df):
    q = [x for x in _vecs(4, n=1)[0]]
    # guard the denominator: a literal all-zero draw would make both forms
    # NaN and eqNullSafe would still pass — keep q non-degenerate
    assert any(x != 0.0 for x in q)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    hof = dot_expr(F.col("va"), qlit) / (
        norm_expr(F.col("va")) * norm_expr(qlit)
    )
    _all_equal(pairs_df, F.expr(cosine_lit_sql("va", q)), hof)


def test_norm_lit_matches_engine(spark):
    """Driver-side literal norm == the engine's fold, bit-for-bit."""
    q = _vecs(5, n=1)[0]
    row = spark.createDataFrame([(q,)], "v array<double>").select(
        norm_expr(F.col("v")).alias("n")
    ).head()
    assert row.n == norm_lit(q)


def test_norm_lit_is_plain_float_sequence():
    """The documented accumulation order: left-to-right acc + x*x, sqrt."""
    q = [3.0, 4.0]
    assert norm_lit(q) == math.sqrt(0.0 + 3.0 * 3.0 + 4.0 * 4.0) == 5.0


def test_builders_reject_bad_dims():
    for fn in (lambda: dot_sql("a", "b", 0), lambda: sqnorm_sql("a", 0),
               lambda: l2sq_sql("a", "b", -1), lambda: dot_lit_sql("a", [])):
        with pytest.raises(ValueError):
            fn()


def test_non_finite_literal_rejected():
    with pytest.raises(ValueError):
        dot_lit_sql("a", [1.0, float("nan")])
    with pytest.raises(ValueError):
        dot_lit_sql("a", [float("inf")])
