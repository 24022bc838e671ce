"""release_cached() contract: a long-lived driver can drop every
cached artifact (DataFrame persist + localCheckpoint RDD blocks)
between queries, and the declarative/procedural streak twins agree.
"""

from __future__ import annotations

from parquet_extractor_spark.session import release_cached


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_release_cached_drops_all_persistent_rdds(spark, sf_small):
    """After a dedup query (which persists intermediates and
    localCheckpoints iterative label snapshots) + full consumption +
    release_cached, the session holds zero persistent RDD blocks —
    the r04 bench measured accumulated blocks degrading
    dedup_canonical 2.6s->6.9s by sweep position ~60."""
    from parquet_extractor_spark.operators.training import dedup_canonical

    df = dedup_canonical(spark, sf_small)
    assert df.count() > 0  # fully consume before releasing
    assert _persistent_rdd_count(spark) > 0, (
        "precondition: the query should leave cached blocks behind"
    )
    release_cached(spark)
    assert _persistent_rdd_count(spark) == 0


def test_release_cached_idempotent_on_clean_session(spark):
    release_cached(spark)
    release_cached(spark)
    assert _persistent_rdd_count(spark) == 0


def test_streak_window_twin_matches_applyinpandas(spark, sf_small):
    """The declarative gaps-and-islands form (default at scale) must
    produce the identical answer to the applyInPandas §2.11 pin."""
    from parquet_extractor_spark.operators.timeseries import (
        user_longest_streak,
        user_longest_streak_window,
    )

    a = user_longest_streak(spark, sf_small).collect()
    b = user_longest_streak_window(spark, sf_small).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bench_attempt_timeout_cancels_hung_query(spark, sf_small):
    """bench._attempt must cancel a hung plan via its job group and
    report a timeout instead of blocking forever — the self-defense
    that guarantees the driver always gets its JSON line."""
    import time as _time

    import bench

    def hung_query(s, sf_dir):
        df = s.range(8, numPartitions=8)

        def _sleep(batches):
            for pdf in batches:
                _time.sleep(300)
                yield pdf

        return df.mapInPandas(_sleep, schema="id long")

    t0 = _time.time()
    res = bench._attempt(spark, "hung", hung_query, sf_small, timeout_s=3)
    assert res.get("timeout") is True
    assert "Timeout" in res.get("err", "")
    assert _time.time() - t0 < 60  # cancelled, not blocked for 300s
    # the post-cancel drain verdict is always recorded so main() can
    # flag the artifact when a slow cancel overlaps the next timing
    assert "drained" in res


def test_bench_drain_job_group_slow_and_stuck_cancels():
    """_drain_job_group under a simulated slow cancel: jobs that stop
    RUNNING within the wait drain True; jobs that never stop drain
    False (the caller then sets timings_suspect in the artifact)."""
    import bench

    class _Info:
        def __init__(self, status):
            self.status = status

    class _Tracker:
        def __init__(self, running_polls):
            self.polls = 0
            self.running_polls = running_polls

        def getJobIdsForGroup(self, group):
            return [7]

        def getJobInfo(self, job_id):
            self.polls += 1
            if self.polls <= self.running_polls:
                return _Info("RUNNING")
            return _Info("SUCCEEDED")

    class _SC:
        def __init__(self, tracker):
            self._t = tracker

        def statusTracker(self):
            return self._t

    class _Spark:
        def __init__(self, tracker):
            self.sparkContext = _SC(tracker)

    # cancels after 2 polls (~1s) -> drains within the 10s budget
    assert bench._drain_job_group(_Spark(_Tracker(2)), "g", wait_s=10)
    # never cancels -> bounded False, not an unbounded wait
    assert not bench._drain_job_group(
        _Spark(_Tracker(10**9)), "g", wait_s=1
    )


def test_bench_attempt_ok_and_error_paths(spark, sf_small):
    import bench

    ok = bench._attempt(
        spark, "ok", lambda s, d: s.range(3), sf_small, timeout_s=60
    )
    assert ok.get("ok") is True

    def broken(s, d):
        raise ValueError("boom")

    err = bench._attempt(spark, "broken", broken, sf_small, timeout_s=60)
    assert not err.get("ok")
    assert "ValueError" in err["err"]
