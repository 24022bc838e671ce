"""Parquet-materialized shared tiers: compute once, reuse by scan.

The dedup report/eval queries consume whole *tiers* the engine also
exposes as standalone queries: the banded-LSH candidate pairs feed
``dedup_components``, ``dedup_graph_pagerank`` and
``lsh_quality_eval``; the exact-dup keep set and the component
labels feed ``dedup_reduction_report`` and ``dedup_canonical``.
Before this module each consumer re-derived its tiers from the raw
documents scan, so a sweep re-mined the corpus once per consumer —
the repeated-recompute blemish carried since round 4 (8.8 s across
the three report queries at sf0.1; at 100 TB it is re-running
MinHash over the corpus per report).

The fix is the one a production pipeline uses: the first consumer
MATERIALIZES the tier (one parquet write of a bounded table — pairs,
keeps, labels are all tiny next to the corpus) and every later
consumer reads the files. Parquet, not ``persist()``, on purpose:

* it survives ``session.release_cached`` (which blanket-drops cached
  blocks between queries precisely because unbounded per-query
  persists were measured to accumulate — r04);
* it is exactly the "write the dedup index next to the corpus" shape
  a 1000-executor job uses, where no executor cache outlives a stage
  and the index must be shared across *jobs*, not stages;
* re-reading costs a columnar scan of a small table, not memory.

Tiers live under a per-process temp directory removed at interpreter
exit; keys include the SparkContext applicationId, the realpath of
the data directory, AND a cheap content fingerprint of its parquet
files (count/bytes/max-mtime), so a different session, a different
fixture, or the same fixture rewritten in place never reads a stale
tier. Builders are deterministic (same-seed MinHash, pinned
rounding), so a tier is a pure function of its key — reuse can never
change a query's answer, only its cost. Row ORDER inside a tier is
not part of the contract; every consumer joins or aggregates.

``SPARK_GRAFT_NO_TIER_CACHE=1`` disables the layer (consumers build
their tiers inline, the pre-round-6 plans) — used by plan-audit
tests that want the raw lineage.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_extractor_spark.artifacts import _disabled, dir_fingerprint

_TIER_ROOT: str | None = None
_BUILT: dict[tuple, str] = {}
# reentrant: a tier builder may itself consume a lower tier (the
# components tier builds on the lsh_pairs tier)
_LOCK = threading.RLock()


def _root() -> str:
    global _TIER_ROOT
    if _TIER_ROOT is None:
        _TIER_ROOT = tempfile.mkdtemp(prefix="pes-tiers-")
        atexit.register(shutil.rmtree, _TIER_ROOT, ignore_errors=True)
    return _TIER_ROOT


def _key(spark: SparkSession, sf_dir: str, name: str) -> tuple:
    # dir_fingerprint adds a content component (count/bytes/mtime of
    # the parquet files) so an in-place fixture rewrite within one
    # session can never serve a stale tier.
    return (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        dir_fingerprint(sf_dir),
        name,
    )


def ensure_tier(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the tier as a DataFrame, materializing it on first use.

    The build-and-write happens under a coarse lock so two
    job-service threads cannot write the same tier concurrently; the
    write itself is a normal distributed parquet write (the lock
    serializes *drivers*, not executors, and tier tables are small).
    """
    if _disabled():
        return build()
    k = _key(spark, sf_dir, name)
    with _LOCK:
        path = _BUILT.get(k)
        if path is None:
            path = os.path.join(_root(), f"t{len(_BUILT)}-{name}")
            build().write.mode("overwrite").parquet(path)
            _BUILT[k] = path
    return spark.read.parquet(path)


def clear_tiers() -> None:
    """Forget every materialized tier and memoized artifact (test
    hook). Files are left for atexit cleanup — a reader created
    before the clear may still be mid-scan."""
    from parquet_extractor_spark.artifacts import clear_artifact_memo

    with _LOCK:
        _BUILT.clear()
    clear_artifact_memo()
