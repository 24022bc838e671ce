"""Semantics + plan-shape tests for corpus_index, shard assignment,
and cross-source dedup (oracle hash parity is covered by
tools/check_oracle.py / the driver gate — these pin the properties
the hash can't see: bounds, disjointness, plan shape)."""

import math

from pyspark.sql import functions as F

from parquet_extractor_spark.operators import corpus_index, dedup, training
from parquet_extractor_spark.plans.explain import (
    has_partial_aggregation,
    read_schema_columns,
)
from parquet_extractor_spark.sources.tables import load_table


def test_inverted_index_postings_bounded(spark, sf_small):
    rows = corpus_index.inverted_index(spark, sf_small).collect()
    assert rows, "index must not be empty"
    for r in rows:
        ids = r.top_postings.split(",")
        assert 1 <= len(ids) <= corpus_index.POSTING_K
        # postings are the SMALLEST doc ids, ascending
        assert ids == sorted(ids, key=int)
        assert r.n_docs >= len(ids)
        assert r.total_tf >= r.n_docs


def test_inverted_index_plan(spark, sf_small):
    df = corpus_index.inverted_index(spark, sf_small)
    assert has_partial_aggregation(df)
    scans = read_schema_columns(df)
    assert all(s <= {"doc_id", "text"} for s in scans)


def test_pmi_pairs_ordered_and_capped(spark, sf_small):
    rows = corpus_index.pmi_top_pairs(spark, sf_small).collect()
    assert 0 < len(rows) <= corpus_index.PMI_TOP
    for r in rows:
        assert r.t1 < r.t2  # canonical orientation
        assert r.n_ab >= corpus_index.PMI_MIN_COOC
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_zipf_slope_is_negative_and_finite(spark, sf_small):
    row = corpus_index.zipf_token_stats(spark, sf_small).collect()[0]
    assert row.n_terms > 0 and row.total_tokens >= row.n_terms
    assert math.isfinite(row.zipf_slope) and row.zipf_slope < 0
    assert math.isfinite(row.zipf_intercept)


def test_shard_assignments_disjoint_cover(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    total = docs.count()
    rows = training.shard_assignments(spark, sf_small).collect()
    assert sorted(r.shard for r in rows) == list(range(training.N_SHARDS))
    assert sum(r.n_docs for r in rows) == total
    # order-independent checksum equals the whole-corpus checksum
    whole = docs.agg(
        F.sum("doc_id").alias("s"), F.bit_xor("doc_id").alias("x")
    ).collect()[0]
    assert sum(r.doc_id_sum for r in rows) == whole.s
    acc = 0
    for r in rows:
        acc ^= r.doc_id_xor
    assert acc == whole.x


def test_write_shards_roundtrip(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "shards")
    training.write_shards(docs, out, n_shards=4, seed="t")
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert back.select("shard").distinct().count() == 4
    # deterministic: same salt → same assignment on re-read
    expect = docs.withColumn(
        "shard", training.shard_column("t", 4)
    ).select("doc_id", "shard")
    assert (
        back.select("doc_id", "shard")
        .exceptAll(expect)
        .count()
        == 0
    )


def test_cross_source_pairs_really_cross(spark, sf_small):
    rows = dedup.cross_source_dedup_candidates(spark, sf_small).collect()
    assert rows, "fixture plants cross-source near-dups"
    for r in rows:
        assert r.source_a != r.source_b
        assert r.doc_a < r.doc_b
    # subset of the unrestricted candidate set
    all_pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_candidates(spark, sf_small).collect()
    }
    assert {(r.doc_a, r.doc_b) for r in rows} <= all_pairs


def test_phrase_search_hits_are_real(spark, sf_small):
    """Every returned doc must contain the phrase adjacently, with
    the exact occurrence count and first position (1-based),
    recomputed in Python from the raw text."""
    import re

    rows = corpus_index.phrase_search(spark, sf_small).collect()
    assert rows, "fixture vocabulary makes the default phrase common"
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_small, "documents").collect()
    }
    for r in rows:
        toks = [
            t
            for t in re.sub(r"[^\w\s]", " ", texts[r.doc_id].lower()).split()
            if t
        ]
        starts = [
            i + 1
            for i in range(len(toks) - len(corpus_index.PHRASE) + 1)
            if tuple(toks[i : i + len(corpus_index.PHRASE)])
            == corpus_index.PHRASE
        ]
        assert r.n_hits == len(starts)
        assert r.first_pos == starts[0]
    hits = [r.n_hits for r in rows]
    assert hits == sorted(hits, reverse=True)
    assert len(rows) <= corpus_index.PHRASE_TOP


def test_phrase_search_postings_filtered_before_join(spark, sf_small):
    """The scan feeding the adjacency joins must only read doc_id +
    text, and the plan must filter postings to the phrase terms (an
    isin filter) rather than joining full posting lists."""
    df = corpus_index.phrase_search(spark, sf_small)
    scans = read_schema_columns(df)
    assert all(s <= {"doc_id", "text"} for s in scans)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "term#" in plan and " IN " in plan


def test_source_log_odds_terms_shape(spark, sf_small):
    from parquet_extractor_spark.operators import analyze

    rows = analyze.source_log_odds_terms(spark, sf_small).collect()
    assert rows
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
        assert r.n_in_source >= 1
    for src, rs in by_src.items():
        assert len(rs) <= analyze.LOG_ODDS_TOP
        zs = [r.z_score for r in rs]
        assert zs == sorted(zs, reverse=True)
    # a source's own top term should be over-represented vs the corpus
    docs = load_table(spark, sf_small, "documents").collect()
    import re

    def toks(t):
        return [x for x in re.sub(r"[^\w\s]", " ", t.lower()).split() if x]

    corpus_counts, src_counts, corpus_n, src_n = {}, {}, 0, {}
    for d in docs:
        for t in toks(d.text):
            corpus_counts[t] = corpus_counts.get(t, 0) + 1
            corpus_n += 1
            src_counts[(d.source, t)] = src_counts.get((d.source, t), 0) + 1
            src_n[d.source] = src_n.get(d.source, 0) + 1
    for src, rs in by_src.items():
        top = rs[0]
        p_src = src_counts[(src, top.term)] / src_n[src]
        p_all = corpus_counts[top.term] / corpus_n
        assert p_src > p_all


def test_persisted_text_index_phrase_search(spark, sf_small):
    """build_text_index + search_phrase_index: same results as the
    on-the-fly phrase_search, and the indexed plan is exchange-free up
    to the bounded top-k (the doc_id bucketing paid the shuffle at
    write time)."""
    from parquet_extractor_spark.plans.explain import formatted_plan

    corpus_index.build_text_index(spark, sf_small, "text_index_t")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        indexed = corpus_index.search_phrase_index(
            spark, table_name="text_index_t"
        )
        live = corpus_index.phrase_search(spark, sf_small)
        assert [tuple(r) for r in indexed.collect()] == [
            tuple(r) for r in live.collect()
        ]
        plan = formatted_plan(indexed)
        # adjacency join + per-doc agg ride the bucketing: the only
        # allowed movement is the final top-k single-partition gather
        body = plan.split("TakeOrderedAndProject")[-1]
        assert "Exchange" not in body
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS text_index_t")


def test_text_index_incremental_append(spark, sf_small):
    """A crawl increment appended to the persisted index is visible
    to the same exchange-free search — no rebuild."""
    corpus_index.build_text_index(spark, sf_small, "text_index_a")
    before = {
        r.doc_id
        for r in corpus_index.search_phrase_index(
            spark, table_name="text_index_a"
        ).collect()
    }
    new_id = 10_000_001
    phrase_text = " ".join(corpus_index.PHRASE)
    inc = spark.createDataFrame(
        [(new_id, f"padding words {phrase_text} more {phrase_text}")],
        "doc_id long, text string",
    )
    try:
        corpus_index.append_text_index(spark, inc, "text_index_a")
        after = corpus_index.search_phrase_index(
            spark, table_name="text_index_a"
        )
        got = {r.doc_id: r for r in after.collect()}
        assert new_id in got
        assert got[new_id].n_hits == 2
        # the pre-existing matches are untouched
        assert before <= set(got)
    finally:
        spark.sql("DROP TABLE IF EXISTS text_index_a")
