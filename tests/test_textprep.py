from pyspark.sql import functions as F

from parquet_extractor_spark.functions.text import tokenize
from parquet_extractor_spark.operators.textprep import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    STRATIFIED_N,
    TFIDF_TOP_K,
    doc_chunks,
    stratified_sample_by_lang,
    tfidf_top_terms,
)
from parquet_extractor_spark.sources.tables import load_table


def test_doc_chunks_cover_every_token(spark, sf_small):
    """Every token of every document appears in some chunk, chunk
    windows advance by the stride, and no chunk exceeds the cap."""
    chunks = doc_chunks(spark, sf_small)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("n_chunk_tokens").alias("max_len"),
            F.sum("n_chunk_tokens").alias("sum_len"),
        )
        .collect()
    )
    tok_counts = {
        r.doc_id: r.n
        for r in load_table(spark, sf_small, "documents")
        .select("doc_id", F.size(tokenize("text")).alias("n"))
        .collect()
    }
    assert {r.doc_id for r in per_doc} == set(tok_counts)
    for r in per_doc:
        n = tok_counts[r.doc_id]
        assert r.max_len <= CHUNK_TOKENS
        # stride covers the tail: chunks overlap, so summed lengths =
        # n + (n_chunks-1) * overlap
        overlap = CHUNK_TOKENS - CHUNK_STRIDE
        assert r.sum_len == n + (r.n_chunks - 1) * overlap


def test_tfidf_top_terms_shape(spark, sf_small):
    rows = tfidf_top_terms(spark, sf_small).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        assert len(rs) <= TFIDF_TOP_K
        scores = [r.tfidf for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_stratified_sample_exact_n_per_lang(spark, sf_small):
    rows = stratified_sample_by_lang(spark, sf_small).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    for lang, ids in by_lang.items():
        assert len(ids) == STRATIFIED_N
    # deterministic: same picks on a second run
    again = {
        (r.lang, r.pick): r.doc_id
        for r in stratified_sample_by_lang(spark, sf_small).collect()
    }
    first = {(r.lang, r.pick): r.doc_id for r in rows}
    assert first == again
