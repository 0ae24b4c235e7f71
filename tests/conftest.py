"""Shared fixtures: one SparkSession per test session + the DuckDB oracle
harness mirroring the driver's correctness gate (row-count + column set +
order-insensitive value comparison)."""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path

import duckdb
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from sparkfulltextquery_spark import get_spark

    s = get_spark(app_name="sftq-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison.

    Type-CLASS-strict (round-4 hardening): integral, floating, and boolean
    values normalize to distinct tagged tuples so an int 9926 never equals a
    float 9926.0 — the driver's value hash is type-strict, and the laxer
    Python ``==`` here let a DuckDB HUGEINT (→ float64 via pandas) vs Spark
    BIGINT mismatch survive two rounds undetected (VERDICT r03 item 3).
    Width within a class is NOT distinguished (int32 vs int64 both → "i"),
    matching the driver's pandas-value hashing."""
    if v is None:
        return None
    # bool before int: Python bool is an int subclass
    if isinstance(v, (np.bool_, bool)):
        return ("b", bool(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return ("f", "NaN")
        # quantize so engine round-off in the last ulps doesn't fail equality
        return ("f", round(f, 6))
    if isinstance(v, Decimal):
        return ("f", round(float(v), 6))
    if isinstance(v, (np.integer, int)):
        return ("i", int(v))
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v
    return v


def norm_rows(pdf):
    """Sort columns by name, normalize cells, return sorted row tuples.

    Uses ``itertuples`` (per-column dtype preserved), NOT ``iterrows`` —
    iterrows materializes each row as a Series upcast to a common dtype,
    which silently floats an all-numeric frame and would fabricate
    int-vs-float mismatches the driver (which hashes per-column values)
    never sees."""
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(v) for v in r)
        for r in pdf[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=repr)


def assert_query_matches_oracle(spark, duck, fn, oracle_sql, name="", sf_dir=None):
    sdf = fn(spark, sf_dir or SF_DIR)
    spark_pdf = sdf.toPandas()
    duck_pdf = duck.execute(oracle_sql).fetchdf()

    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(duck_pdf)}"
    )
    s_cols, s_rows = norm_rows(spark_pdf)
    d_cols, d_rows = norm_rows(duck_pdf)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != oracle {d_cols}"
    # unsigned-vs-signed ints render identically in the value check but the
    # driver's hash may not treat them alike (DuckDB UBIGINT ⊃ cardinality,
    # '//' etc.) — force an explicit CAST in the oracle instead.
    unsigned = [
        (c, str(spark_pdf[c].dtype), str(duck_pdf[c].dtype))
        for c in spark_pdf.columns
        if getattr(spark_pdf[c].dtype, "kind", "") == "u"
        or getattr(duck_pdf[c].dtype, "kind", "") == "u"
    ]
    assert not unsigned, (
        f"{name}: unsigned integer dtype on one side (CAST the oracle column "
        f"to a signed type): {unsigned}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(s_rows)} row mismatches; first 3: "
        + "\n".join(f"spark={a}\noracle={b}" for _, a, b in mismatches[:3])
    )
