"""Driver-side memo for trained plan-time artifacts.

Several operators train a small model with Spark jobs and then fold
the result back into the plan as literals: IVF coarse centroids and
Lloyd-refined PQ codebooks (operators/similarity.py), the logistic
classifier's weight vector (operators/classifier.py), SQ8 per-
dimension min/max ranges, the decontamination Bloom bitset
(operators/contamination.py). The training job is deterministic —
same input directory, same seeds, same rounding — so its product is
a pure function of (data directory, artifact name). Re-running it
for every query that needs the artifact is wasted cluster time: in a
140-query sweep the IVF/PQ family alone re-trained the same codebook
four times.

This module memoizes those products on the driver. The cached values
are plain Python lists/ints of bounded size (k x dim doubles, a
Bloom bitset of _BLOOM_WORDS ints — a few hundred KB at most), NOT
Spark state: they survive ``session.release_cached`` untouched,
because dropping cached *blocks* between queries says nothing about
re-deriving a deterministic training result. This is the "train
once, serve many" boundary a production pipeline draws by writing
the model to a store; in-process the dict IS that store.

Keying includes the SparkContext ``applicationId`` so a test that
stops one session and starts another never sees values trained under
a different session's configuration, and ``os.path.realpath`` of the
data directory so symlinked spellings of the same fixture share.

``SPARK_GRAFT_NO_TIER_CACHE=1`` disables memoization (every call
re-trains) — used by tests that time or plan-audit the cold path.
"""

from __future__ import annotations

import os
import threading
from typing import Any, Callable

_MEMO: dict[tuple, Any] = {}
# reentrant: one artifact's builder may consume another's memo (the
# refined PQ books seed from the memoized head vectors)
_LOCK = threading.RLock()


def _disabled() -> bool:
    return os.environ.get("SPARK_GRAFT_NO_TIER_CACHE", "") == "1"


def dir_fingerprint(sf_dir: str) -> tuple:
    """Cheap content component for cache keys: (file count, total
    bytes, max mtime_ns) over the directory's parquet files. Without
    it, a fixture rewritten in place mid-session would silently serve
    a stale tier/artifact (the keys were previously path-only). One
    listdir + one stat per table file — microseconds next to any
    Spark job."""
    try:
        names = [n for n in os.listdir(sf_dir) if n.endswith(".parquet")]
    except OSError:
        return (0, 0, 0)
    count, size, mtime = 0, 0, 0
    for n in names:
        try:
            st = os.stat(os.path.join(sf_dir, n))
        except OSError:
            continue
        count += 1
        size += st.st_size
        mtime = max(mtime, st.st_mtime_ns)
    return (count, size, mtime)


def _key(spark, sf_dir: str, name: tuple) -> tuple:
    return (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        dir_fingerprint(sf_dir),
    ) + name


def memo_artifact(
    spark, sf_dir: str, name: tuple, build: Callable[[], Any]
) -> Any:
    """Return the artifact, training it at most once per
    (session, data dir, name). ``build`` runs outside the registry
    lock is NOT needed here: training hops through the driver anyway,
    and a coarse lock keeps two job-service threads from training the
    same artifact concurrently (second waits, then hits the memo)."""
    if _disabled():
        return build()
    k = _key(spark, sf_dir, name)
    with _LOCK:
        if k in _MEMO:
            return _MEMO[k]
        v = build()
        _MEMO[k] = v
        return v


def clear_artifact_memo() -> None:
    """Drop every memoized artifact (test hook; also called by
    tiers.clear_tiers so one reset clears both layers)."""
    with _LOCK:
        _MEMO.clear()
