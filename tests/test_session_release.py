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
