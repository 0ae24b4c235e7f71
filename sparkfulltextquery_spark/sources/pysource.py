"""Custom Python data source (DataSource V2 Python API, Spark 4.x).

The reference's extension point for new sources is the Scala DataSource
registry (core execution/datasources/DataSource.scala + FileFormat impls,
§2.1); modern PySpark opens the same seam to Python:
``spark.dataSource.register`` + a DataSource/DataSourceReader pair gets
full planner integration — partition planning (one task per
InputPartition) and filter pushdown (pushFilters) — without any JVM code.

This source ("synthcorpus") deterministically generates a document corpus:
every (doc_id) derives its text from a fixed word list via md5 — the same
rows on every run, every partition layout, every engine. Used by
tests/test_sources.py to prove: correct row counts, partition-parallel
reads, and that doc_id range predicates are absorbed by the source (rows
never generated) rather than filtered post-scan.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    Filter,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
)

_WORDS = (
    "spark query engine index search token window join scan filter "
    "shuffle broadcast stream state vector corpus term score rank page"
).split()


def _doc_text(doc_id: int, n_words: int = 12) -> str:
    out = []
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    for i in range(n_words):
        out.append(_WORDS[int(h[(2 * i) % 30 : (2 * i) % 30 + 2], 16) % len(_WORDS)])
    return " ".join(out)


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class SynthCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.lo = 0
        self.hi = self.n_docs

    def pushFilters(self, filters: list[Filter]):
        # absorb doc_id range predicates into generation bounds; everything
        # else is returned (i.e. "unsupported") and Spark re-applies it
        for f in filters:
            if isinstance(f, GreaterThanOrEqual) and f.attribute == ("doc_id",):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, LessThan) and f.attribute == ("doc_id",):
                self.hi = min(self.hi, int(f.value))
            else:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        step = max(1, (hi - lo + self.n_parts - 1) // self.n_parts)
        return [_Range(s, min(s + step, hi)) for s in range(lo, hi, step)] or [
            _Range(0, 0)
        ]

    def read(self, partition: _Range):
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, doc_id % 7, _doc_text(doc_id))


class SynthCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthcorpus"

    def schema(self) -> str:
        return "doc_id bigint, shard int, text string"

    def reader(self, schema) -> SynthCorpusReader:
        return SynthCorpusReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SynthCorpusDataSource)
