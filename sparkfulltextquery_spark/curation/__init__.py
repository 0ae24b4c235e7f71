"""Training-data curation operators beyond basic textstats: benchmark
contamination checks, sequence packing, repetition-based quality filters
(Gopher-style), and PII redaction.

All four are the operations an LLM-pretraining pipeline runs between "raw
corpus" and "tokenizer input". Each is a pure DataFrame plan (codegen'd
expressions, broadcastable small sides, bounded per-doc arrays) with a DuckDB
oracle twin. Reference anchors: the string/regex expression surface
(stringExpressions.scala, regexpExpressions.scala) and the windowed-agg
machinery (WindowExec.scala:83) these compose.
"""

from sparkfulltextquery_spark.curation import queries  # noqa: F401
