"""Data-layout keys: Z-order (Morton) interleaving for multi-dimensional
clustering.

Range-clustering on ONE column (sources.tables.range_clustered_rewrite)
gives min/max row-group pruning on that column only; interleaving the bits
of two columns gives a single sort key whose contiguous ranges are small
rectangles in (a, b) space — so parquet min/max statistics prune scans
filtered on EITHER or BOTH columns. The standard lakehouse layout trick,
built here from pure bitwise expressions (codegen'd, engine-portable,
DuckDB-twinned for the oracle).

At 100 TB: z-write is one repartitionByRange + per-partition sort (same
cost shape as any clustered rewrite); the benefit is read-side — 2-D
predicate selectivity multiplies instead of picking one dimension.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints: result bit
    2i is a's bit i, bit 2i+1 is b's bit i (Morton code)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    z = F.lit(0).cast("long")
    for i in range(bits):
        # Column.__or__ is logical OR in PySpark — bitwiseOR is the bit op
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(ca.cast("long"), i) % 2, 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(cb.cast("long"), i) % 2, 2 * i + 1)
        )
    return z


def zorder_key_duck(a: str, b: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a}::BIGINT >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b}::BIGINT >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_rewrite(df, a: str, b: str, out_dir: str, n_files: int = 8, bits: int = 16):
    """Rewrite a table clustered by the (a, b) Z-order key: range-partition
    on the key (balanced files) then sort within partitions, so every file's
    min/max stats cover a compact 2-D rectangle."""
    z = zorder_key(a, b, bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir
