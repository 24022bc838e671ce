"""Semantic and plan checks for the embedding utilities and
corpus-drift analytics."""

from parquet_extractor_spark.operators import analyze, similarity
from parquet_extractor_spark.plans.explain import has_partial_aggregation


def test_label_centroids_shape_and_counts(spark, sf_small):
    rows = similarity.label_centroids(spark, sf_small).collect()
    assert len(rows) == 10
    assert sum(r.n_vecs for r in rows) == 500
    for r in rows:
        assert len(r.centroid) == 64


def test_label_centroids_partial_agg(spark, sf_small):
    assert has_partial_aggregation(similarity.label_centroids(spark, sf_small))


def test_embedding_norm_stats_bounds(spark, sf_small):
    rows = similarity.embedding_norm_stats(spark, sf_small).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.l2_norm > 0
        assert r.max_abs > 0
        # 64 int8 components, each in [-127, 127] (+0.5 half-up slack)
        assert abs(r.quant_checksum) <= 128 * 64


def test_source_token_kl_nonnegative(spark, sf_small):
    rows = analyze.source_token_kl(spark, sf_small).collect()
    assert rows
    for r in rows:
        # KL(p || q) >= 0, up to rounding of the reported 6 decimals
        assert r.kl_divergence >= -1e-6


def test_source_token_kl_partial_agg(spark, sf_small):
    assert has_partial_aggregation(analyze.source_token_kl(spark, sf_small))


def test_doc_length_histogram_totals(spark, sf_small):
    rows = analyze.doc_length_histogram(spark, sf_small).collect()
    assert sum(r.n_docs for r in rows) == 500
    for r in rows:
        assert r.char_bin % 50 == 0
        assert r.char_bin <= r.avg_chars < r.char_bin + 50
