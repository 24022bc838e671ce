"""Focused tests for the r12 load_table/spread fast paths: the
os.stat-derived split estimate that replaced the df.rdd planning
probe, and the fingerprint-keyed parquet SCHEMA cache."""

from __future__ import annotations



from pyspark.sql import functions as F

from parquet_extractor_spark.sources.tables import (
    _SCHEMA_CACHE,
    _conf_bytes,
    _scan_stats,
    load_table,
    spread,
)


def test_spread_repartitions_tiny_scan(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    assert getattr(docs, "_sg_scan_stats", None) is not None
    out = spread(docs)
    assert (
        out.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )
    # same rows, just redistributed
    assert out.count() == docs.count()


def test_spread_passes_through_large_scan(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    # pretend the scan is 100 TB over 1000 files: the split estimate
    # must exceed any local parallelism and spread must be a no-op —
    # no shuffle of raw rows is ever added at cluster scale
    docs._sg_scan_stats = (100 * 1024**4, 1000)
    assert spread(docs) is docs


def test_spread_skips_midband_scan(spark, sf_small):
    # r13 (r12 advice): a 1 GB / 8-file scan at 32-way parallelism
    # really arrives as ~defaultParallelism splits, because Spark
    # shrinks the split size to totalBytes/minPartitionNum. The
    # estimate must include that bytes-per-core term and NOT add a
    # repartition shuffle of raw rows in the mid-band.
    docs = load_table(spark, sf_small, "documents")
    docs._sg_scan_stats = (1024**3, 8)
    assert spread(docs) is docs


def test_spread_falls_back_without_stats(spark, sf_small):
    # a frame with no stats attribute (derived frames, object stores)
    # still spreads via the exact planner probe
    docs = load_table(spark, sf_small, "documents").select("doc_id")
    assert not hasattr(docs, "_sg_scan_stats")
    out = spread(docs)
    assert out.count() == docs.count()


def test_schema_cache_invalidates_on_rewrite(spark, sf_small, tmp_path):
    src = spark.read.parquet(f"{sf_small}/region.parquet")
    dst = str(tmp_path / "region.parquet")
    src.write.parquet(dst)
    before = len(_SCHEMA_CACHE)

    from parquet_extractor_spark.sources.tables import _read_parquet

    a = _read_parquet(spark, dst, _scan_stats(dst))
    assert a.schema == src.schema
    assert len(_SCHEMA_CACHE) == before + 1
    # rewrite the directory with a different schema: the fingerprint
    # changes, so the cache must re-infer, not serve the stale schema
    src.select(F.col("r_regionkey").alias("only")).write.mode(
        "overwrite"
    ).parquet(dst)
    b = _read_parquet(spark, dst, _scan_stats(dst))
    assert [f.name for f in b.schema.fields] == ["only"]


def test_conf_bytes_parses_spark_forms(spark):
    conf = spark.conf

    class Fake:
        def __init__(self, v):
            self.v = v

        def get(self, key):
            return self.v

    assert _conf_bytes(Fake("128m"), "k", 1) == 128 * 1024**2
    assert _conf_bytes(Fake("134217728b"), "k", 1) == 134217728
    assert _conf_bytes(Fake("1g"), "k", 1) == 1024**3
    assert _conf_bytes(Fake("4194304"), "k", 1) == 4194304
    assert _conf_bytes(Fake(None), "k", 7) == 7
    # Spark's canonical two-letter forms (r12 advice: these silently
    # fell back to the default before)
    assert _conf_bytes(Fake("256mb"), "k", 1) == 256 * 1024**2
    assert _conf_bytes(Fake("1gb"), "k", 1) == 1024**3
    assert _conf_bytes(Fake("4kb"), "k", 1) == 4096
    # the real session conf parses too
    assert _conf_bytes(conf, "spark.sql.files.maxPartitionBytes", 0) > 0


def test_scan_stats_recurses_into_partitioned_layout(spark, sf_small, tmp_path):
    # r12 advice: a partitioned parquet directory keeps its data files
    # in subdirectories; the fingerprint must cover them (not return
    # the constant (0, 1, 0)) so the schema cache invalidates on
    # rewrite and the split estimate sees the real bytes.
    src = spark.read.parquet(f"{sf_small}/region.parquet")
    dst = str(tmp_path / "part.parquet")
    src.write.partitionBy("r_regionkey").parquet(dst)
    nbytes, nfiles, mtime = _scan_stats(dst)
    assert nbytes > 0 and nfiles > 1 and mtime > 0
