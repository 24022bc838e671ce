"""SparkSession factory with scale-aware defaults.

Local tests run on ``local[N]``; the same builder settings are what we
would ship to a 1000-executor cluster — AQE on (runtime re-planning,
skew-join splitting, post-shuffle coalescing), Arrow for every
Python<->JVM hop, and shuffle partitioning left to AQE rather than a
hard-coded count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _local_heap_default() -> str:
    """min(16g, half of physical RAM), floored at 1g."""
    try:
        phys = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError):
        return "4g"
    gb = max(1, min(16, int(phys / (2 * 1024**3))))
    return f"{gb}g"


def get_spark(
    app_name: str = "parquet-extractor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    Parameters are overridable for tests; production leaves ``master``
    to the cluster manager.
    """
    # Ensure executor-side Python workers can import this package by
    # reference (module-level functions/classes pickle by name). Must
    # happen before the JVM spawns the worker daemon.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = f"local[{cpus}]"
    builder = builder.master(master)

    conf = {
        # AQE: runtime re-plan — coalesce small post-shuffle partitions,
        # split skewed ones, convert SMJ->BHJ when a side turns out small.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Arrow for pandas_udf / mapInPandas / toPandas.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Baseline shuffle parallelism; AQE coalesces downward from here.
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
        ),
        # Generated-class cache (default 100 entries). A long-lived
        # multi-query driver — this engine's bench, oracle gate, and
        # job service all sweep hundreds of distinct plans per session
        # — evicts its biggest codegen units and re-pays their
        # multi-second Janino compiles on every later run (r12
        # measured HOF-heavy queries at 2-5x their isolated cost late
        # in a sweep). Trade metaspace for compile time; single-query
        # batch jobs are unaffected. Env-overridable for small hosts.
        "spark.sql.codegen.cache.maxEntries": os.environ.get(
            "SPARK_GRAFT_CODEGEN_CACHE", "4096"
        ),
        # Self-describing timestamps when writing parquet.
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        "spark.sql.session.timeZone": "UTC",
        # Static conf — must be set before the session exists. Catalog
        # tables (bucketed writes) land here; production points this at
        # the real warehouse path.
        "spark.sql.warehouse.dir": os.environ.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"
        ),
        "spark.ui.enabled": os.environ.get("SPARK_GRAFT_UI", "false"),
    }
    if master.startswith("local"):
        # In local mode every task shares the driver JVM, whose heap
        # defaults to 1g — 32 concurrent tasks OOM on any moderate
        # aggregate long before the host's RAM matters. Size the heap
        # like an executor fleet, clamped to half the host's physical
        # RAM so small CI hosts get a contained JVM OOM instead of the
        # OS killer (must be set before the JVM spawns; no-op on an
        # already-running session). On a real cluster the manager sets
        # executor memory instead.
        conf.setdefault(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _local_heap_default()),
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # codegen.cache.maxEntries is a STATIC conf: it only applies when
    # this builder actually created the JVM. getOrCreate over a
    # pre-existing session silently keeps that session's value — make
    # the silent reuse visible in logs (r12 advice) instead of letting
    # a sweep believe it runs with the 4096-entry cache.
    try:
        requested = conf["spark.sql.codegen.cache.maxEntries"]
        actual = spark.conf.get("spark.sql.codegen.cache.maxEntries", None)
        if actual is not None and str(actual) != str(requested):
            import logging

            logging.getLogger(__name__).warning(
                "reused SparkSession: spark.sql.codegen.cache.maxEntries"
                "=%s (requested %s ignored; static conf)",
                actual,
                requested,
            )
    except Exception:
        pass
    _quiet_bounded_window_warns(spark)
    return spark


def release_cached(spark: SparkSession) -> None:
    """Drop every cached artifact the previous query left behind.

    ``spark.catalog.clearCache()`` goes through the CacheManager and
    unpersists all DataFrame-level ``persist()``/``cache()`` frames;
    the RDD loop below exists for what the CacheManager does NOT
    track — RDD-level blocks, i.e. ``localCheckpoint()`` snapshots
    (dedup.py's iterative label propagation) and any raw RDD persists.

    Operators in this package persist shared intermediates for the
    lifetime of their returned plan (e.g. the grouped postings in
    ``dedup.ngram_jaccard_pairs``, the per-round label snapshots in
    ``dedup.dedup_components``) and cannot unpersist them before the
    caller consumes the DataFrame. Long-lived drivers in this repo —
    ``bench.py`` between queries, the oracle gate
    (``tools/check_oracle.py``) between checks, and the job service
    after each job — call this; a short-lived session can rely on LRU
    block eviction. Measured effect: without it, ``dedup_canonical``
    degraded 2.6s -> 6.9s by position ~60 of a 140-query sweep (r04
    bench) purely from accumulated blocks.

    WARNING — invalidates prior results, hard: because the RDD loop
    also drops ``localCheckpoint()`` blocks, a still-referenced
    DataFrame from a *previous* query whose lineage was truncated by a
    checkpoint will FAIL on re-execution with "Checkpoint block not
    found" rather than recompute. Call this only at a boundary where
    every DataFrame handed out earlier has been fully consumed.
    """
    import logging

    try:
        spark.catalog.clearCache()
    except Exception as exc:
        # Spark Connect pre-3.5 lacks catalog.clearCache; anything
        # else is a real driver/catalog error — surface it at debug
        # so failures are diagnosable, but never break the caller's
        # query loop over a cleanup step.
        logging.getLogger(__name__).debug("clearCache failed: %s", exc)
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap.keySet().toArray()):
            jmap.get(rid).unpersist(False)
    except Exception:
        # non-JVM backends (Spark Connect): no sparkContext._jsc;
        # cached blocks are remote and session-scoped; nothing to
        # release client-side.
        pass


def _quiet_bounded_window_warns(spark: SparkSession) -> None:
    """Silence WindowExec's "No Partition Defined" WARN.

    Every global window in this codebase goes through
    ``functions.windows.bounded_global_window`` and is K-bounded by
    construction (post-limit heads, constant-cardinality reductions) —
    enforced mechanically by the source lint in
    tests/test_plan_quality.py, so the WARN carries no signal here and
    ~40 repeats per run would mask a real log line. Catalyst constant-
    folds any literal partition key out of the window spec, so the
    suppression has to happen at the logger, not the plan (the
    ``partitionBy(lit(0))`` in bounded_global_window marks intent; it
    does not itself silence anything). Trade-off: the silencing is
    session-wide, so ad-hoc global windows built outside the linted
    package also lose the WARN — the source lint is the guard, the
    log line never was."""
    try:
        jvm = spark.sparkContext._jvm
        configurator = jvm.org.apache.logging.log4j.core.config.Configurator
        level = jvm.org.apache.logging.log4j.Level.ERROR
        for cls in (
            "org.apache.spark.sql.execution.window.WindowExec",
            "org.apache.spark.sql.execution.window.WindowInPandasExec",
        ):
            configurator.setLevel(cls, level)
    except Exception:
        # non-log4j2 deployments: warnings stay, nothing breaks
        pass
