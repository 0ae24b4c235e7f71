"""Deduplication operators for large-scale training-data pipelines.

Five families, all shuffle-parallel (no driver-side pair enumeration):

- exact          : content-hash groupBy (md5 of normalized text)
- MinHash + LSH  : shingle → portable minhash signature → banded buckets →
                   candidate pairs → exact-Jaccard verification
- SimHash        : weighted bit-vote fingerprint → banded hamming blocking
- n-gram Jaccard : rare-shingle blocking → exact Jaccard
- embedding      : cosine near-dup within cluster blocks

Reference analogues: Murmur3Hash (catalyst expressions/misc.scala:443) and
ml.feature.HashingTF/MinHashLSH-era patterns; here hashes are the portable
md5-based h28/h60 (functions/hashes.py) so the DuckDB oracle can reproduce
signatures bit-for-bit.

Scale design: every stage is explode → groupBy → join on bounded keys.
Candidate generation is O(Σ bucket²) — bands/rows tuned so buckets stay
small; verification joins touch only candidate pairs. No collect() anywhere.
"""

from sparkfulltextquery_spark.dedup import queries  # noqa: F401  (registers)
from sparkfulltextquery_spark.dedup.minhash import (  # noqa: F401
    MINHASH_PERMS,
    lsh_candidate_pairs,
    minhash_signatures,
    verified_near_dups,
)
