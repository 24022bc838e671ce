"""Spark 4 Python DataSource for document corpora (SURVEY §2.1 S4).

``docs_iter_to_df`` ingests small corpora on the driver; this is the
scale path: a ``pyspark.sql.datasource.DataSource`` whose reader
splits the corpus into N partitions, each executor pulling its own
shard of the iterator. Registration:

    spark.dataSource.register(DocsDataSource)
    df = (spark.read.format("docs")
          .option("provider", "pkg.module:factory_name")
          .option("num_docs", "1000")
          .option("num_partitions", "8")
          .load())

The provider option names a zero-arg factory (module:attr) returning a
fresh document iterator — resolved ON THE EXECUTOR, so nothing
unpicklable crosses the wire (the same pattern ir_datasets needs:
``ir_datasets.load(...).docs_iter()`` handles aren't picklable).
Each partition re-opens the iterator and islices its [start, end)
range; for sources with random access (ir_datasets docs_iter supports
slicing) the skip is O(1), otherwise it degrades to a skip-scan.
"""

from __future__ import annotations

import importlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from parquet_extractor_spark.sources.ir_datasets_source import (
    DOC_SCHEMA,
    _doc_to_row,
)


def resolve_provider(spec: str):
    """'pkg.module:attr' → the factory object."""
    module_name, _, attr = spec.partition(":")
    if not attr:
        raise ValueError(f"provider must be 'module:attr', got {spec!r}")
    return getattr(importlib.import_module(module_name), attr)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _read_range(provider_spec: str, partition: _RangePartition) -> Iterator[tuple]:
    """Open the provider and yield rows for one [start, end) range —
    shared by the batch and streaming readers. docs_iter-style sources
    support slicing (api.py:223 pattern); plain iterators fall back to
    an islice skip-scan."""
    docs = resolve_provider(provider_spec)()
    try:
        shard = docs[partition.start : partition.end]
    except TypeError:
        from itertools import islice

        shard = islice(iter(docs), partition.start, partition.end)
    for doc in shard:
        yield _doc_to_row(doc)


class DocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.provider = options["provider"]
        self.num_docs = int(options.get("num_docs", "1000"))
        self.num_partitions = int(options.get("num_partitions", "8"))

    def partitions(self):
        # exactly min(num_partitions, num_docs) balanced ranges
        n = min(self.num_partitions, self.num_docs) or 1
        bounds = [self.num_docs * i // n for i in range(n + 1)]
        return [
            _RangePartition(bounds[i], bounds[i + 1]) for i in range(n)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _read_range(self.provider, partition)


class DocsStreamReader(DataSourceStreamReader):
    """Micro-batch streaming over the same provider contract: each
    trigger serves the next ``batch_docs`` documents as one epoch,
    split into executor-parallel range partitions exactly like the
    batch reader — the full ``DataSourceStreamReader`` (not the
    driver-only Simple variant), so read() runs on executors.

    Offsets are plain dicts ``{"pos": N}``: monotone, replayable —
    ``partitions(start, end)`` is a pure function of the two offsets,
    so a micro-batch replay after failure re-reads exactly its range
    (the provider is required to be deterministic, which every
    docs_iter-style source is). A bounded corpus simply stops
    advancing at num_docs; an unbounded crawl source would keep
    growing its latest offset."""

    def __init__(self, options: dict):
        self.provider = options["provider"]
        self.num_docs = int(options.get("num_docs", "1000"))
        self.batch_docs = int(options.get("batch_docs", "100"))
        self.num_partitions = int(options.get("num_partitions", "4"))
        self._pos = 0

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        # one batch_docs step per trigger, clamped at the corpus end
        self._pos = min(self._pos + self.batch_docs, self.num_docs)
        return {"pos": self._pos}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["pos"]), int(end["pos"])
        # Restart safety: a fresh reader's _pos begins at 0, but a
        # query restarted from checkpoint hands us the COMMITTED start
        # — adopt the larger position so latestOffset resumes from it
        # instead of regressing and re-delivering documents. The one
        # inverted batch the engine may already have planned (end
        # computed before we saw the checkpointed start) reads nothing.
        self._pos = max(self._pos, lo, hi)
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        n = max(min(self.num_partitions, hi - lo), 1)
        bounds = [lo + (hi - lo) * i // n for i in range(n + 1)]
        return [
            _RangePartition(bounds[i], bounds[i + 1]) for i in range(n)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _read_range(self.provider, partition)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the provider is re-opened per read


class DocsDataSource(DataSource):
    """spark.read.format("docs") — executor-parallel corpus reads,
    batch and micro-batch streaming."""

    @classmethod
    def name(cls) -> str:
        return "docs"

    def schema(self) -> StructType:
        return DOC_SCHEMA

    def reader(self, schema: StructType) -> DocsReader:
        return DocsReader(self.options)

    def streamReader(self, schema: StructType) -> DocsStreamReader:
        return DocsStreamReader(self.options)


# ---------------------------------------------------------------------------
# demo provider used by tests: a deterministic synthetic corpus


class _FakeDoc:
    __slots__ = ("doc_id", "title", "text")

    def __init__(self, i: int):
        self.doc_id = f"doc{i}"
        self.title = f"Title {i}"
        self.text = f"body text for document {i} " * 3


def synthetic_corpus():
    """Zero-arg provider: sliceable synthetic corpus of 10k docs."""

    class _Corpus:
        def __len__(self):
            return 10_000

        def __getitem__(self, s):
            return [_FakeDoc(i) for i in range(*s.indices(10_000))]

        def __iter__(self):
            return (_FakeDoc(i) for i in range(10_000))

    return _Corpus()
