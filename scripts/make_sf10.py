#!/usr/bin/env python
"""Generate the sf10 scaling-curve dataset (~60M lineitem) — the third
measured decade (VERDICT r07 #7): sf0.1 → sf1 → sf10.

Replicates /root/testdata/sf0.1 100x with disjoint key offsets (same
construction as scripts/make_sf1.py, whose ``replicate`` this reuses),
so join selectivities match the source exactly and the sf1 artifact is a
strict 10x subset shape. Deterministic. Writes to /tmp/sf10 — a
benchmark artifact; the driver's read-only testdata is never touched.

Run:  python scripts/make_sf10.py
Then: python bench.py --sf10   (headline + 15 heaviest rows only)
      python scripts/check_scaling.py --sf10   (sf1 → sf10 decade)
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from scripts.make_sf1 import replicate  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/sf10")

if __name__ == "__main__":
    # 128 output partitions: ~60M lineitem rows; keeps file sizes in the
    # maxPartitionBytes sweet spot so scan parallelism matches local[32]
    replicate(SRC, DST, 100, out_partitions=128)
