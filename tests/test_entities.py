"""Entity resolution: planted-fixture expectations + prefix-filter
pruning evidence. The DuckDB oracle equality (test_oracle_gate)
already proves the prefix-filtered join is lossless vs brute force;
these tests pin the SEMANTICS to hand-derived cluster facts so a
fixture or threshold edit can't silently change meaning."""

from parquet_extractor_spark.operators.entities import (
    ENTITY_ROWS,
    _entity_records,
    _matched_pairs,
    _with_grams,
    entity_resolution,
)


def test_planted_clusters_and_canonicals(spark, sf_small):
    rows = {r.rec_id: r for r in entity_resolution(spark, sf_small).collect()}
    assert len(rows) == len(ENTITY_ROWS)

    # planted clusters, labeled by min rec_id
    for members, canon_id, canon_name in [
        ((1, 2, 3), 1, "Acme Corporation"),
        ((4, 5, 6), 5, "Smith, John"),
        ((8, 9), 9, "Global Industries Limited"),
        ((14, 15, 16), 15, "Johnson Controls Incorporated"),
    ]:
        for m in members:
            r = rows[m]
            assert r.cluster == members[0], (m, r.cluster)
            assert r.cluster_size == len(members)
            assert r.canonical_id == canon_id
            assert r.canonical_name == canon_name

    # near-misses and edge rows stay singletons: 'Acme Industries'
    # (0.39 vs Global Industries, 0.125 vs Acme Corp), 'Smithson & Co'
    # (0.21 vs John Smith), the non-ASCII row, 'X' vs 'X Y'
    for rec_id in (7, 10, 11, 12, 13, 17, 18, 19, 20):
        r = rows[rec_id]
        assert r.cluster == rec_id and r.cluster_size == 1, rec_id
        assert r.canonical_id == rec_id


def test_prefix_filter_actually_prunes(spark):
    """The candidate join must touch far fewer pairs than brute force
    — otherwise the 'scalable' claim is decoration. With 20 records
    brute force is 190 pairs; frequency-ordered prefixes should admit
    a small fraction. Count candidates by re-running the verify stage
    without the threshold."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    grammed = _with_grams(_entity_records(spark))

    exploded = grammed.select("rec_id", F.explode("grams").alias("gram"))
    gram_df = exploded.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    prefix_len = (
        F.size("grams")
        - F.ceil(F.lit(0.45) * F.size("grams") - F.lit(1e-9))
        + F.lit(1)
    )
    ranked = (
        exploded.join(gram_df, "gram")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("rec_id").orderBy("df", "gram")
            ),
        )
        .join(grammed.select("rec_id", "grams"), "rec_id")
        .filter(F.col("rn") <= prefix_len)
        .select("rec_id", "gram")
    )
    cands = (
        ranked.alias("a")
        .join(ranked.alias("b"), "gram")
        .filter(F.col("a.rec_id") < F.col("b.rec_id"))
        .select("a.rec_id", "b.rec_id")
        .distinct()
        .count()
    )
    brute = len(ENTITY_ROWS) * (len(ENTITY_ROWS) - 1) // 2
    assert cands < brute / 3, f"prefix filter admitted {cands}/{brute}"
    # and the candidates still contain every true match
    matches = _matched_pairs(grammed).count()
    assert matches >= 7  # 3+3+1+3 planted within-cluster pairs at least


def test_matched_pairs_jaccard_values(spark):
    """Spot-check the exact trigram Jaccard micro values derived by
    hand: acme corp vs acme corporation = 7/14; jon smith vs john
    smith = 5/10."""
    grammed = _with_grams(_entity_records(spark))
    got = {
        (r.rec_a, r.rec_b): r.jacc_micro
        for r in _matched_pairs(grammed).collect()
    }
    assert got[(1, 3)] == 500_000
    assert got[(4, 6)] == 500_000
    assert got[(2, 3)] == 1_000_000  # identical after normalization
    assert (4, 5) in got and got[(4, 5)] == 1_000_000  # token-sort
