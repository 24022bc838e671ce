"""Data-selection operators (operators/selection.py): DSIR importance
weights, BM25 retrieval, duplicate-span detection. Correctness vs the
DuckDB oracle is covered by tools/check_oracle.py; these tests pin the
semantic invariants and the plan shapes."""

import math

from parquet_extractor_spark.operators.selection import (
    BM25_TOP_K,
    DSIR_TARGET_LANG,
    SPAN_SAMPLE_DOCS,
    SPAN_TOKENS,
    SPAN_TOP,
    bm25_doc_scores,
    dsir_importance_weights,
    duplicate_spans,
    span_scrubbed_docs,
)
from parquet_extractor_spark.plans.explain import (
    has_broadcast_hash_join,
    has_partial_aggregation,
    read_schema_columns,
)


def test_dsir_weights_favor_target_lang(spark, sf_small):
    rows = dsir_importance_weights(spark, sf_small).collect()
    assert len(rows) == 500  # one row per doc
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.log_weight_micro)
    means = {k: sum(v) / len(v) for k, v in by_lang.items()}
    # English docs must score above every non-target language on
    # average — that is the entire point of importance weighting.
    for lang, mean in means.items():
        if lang != DSIR_TARGET_LANG:
            assert means[DSIR_TARGET_LANG] > mean, (lang, means)


def test_dsir_weights_deterministic(spark, sf_small):
    a = sorted(
        (r.doc_id, r.log_weight_micro)
        for r in dsir_importance_weights(spark, sf_small).collect()
    )
    b = sorted(
        (r.doc_id, r.log_weight_micro)
        for r in dsir_importance_weights(spark, sf_small).collect()
    )
    assert a == b


def test_dsir_distribution_join_is_broadcast(spark, sf_small):
    df = dsir_importance_weights(spark, sf_small)
    assert has_broadcast_hash_join(df)
    assert has_partial_aggregation(df)
    assert set().union(*read_schema_columns(df)) <= {"doc_id", "lang", "text"}


def test_bm25_scores_rank_and_bounds(spark, sf_small):
    rows = bm25_doc_scores(spark, sf_small).collect()
    assert len(rows) == BM25_TOP_K
    assert [r.rank for r in rows] == list(range(1, BM25_TOP_K + 1))
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # BM25 term score is bounded by idf·(k1+1); with 3 terms and
    # ln(1 + N) idf ceiling the total has a hard analytic cap.
    cap = 3 * math.log(1 + 500) * 2.2 * 1_000_000
    assert all(s < cap for s in scores)


def test_bm25_stats_join_is_broadcast(spark, sf_small):
    df = bm25_doc_scores(spark, sf_small)
    assert has_broadcast_hash_join(df)
    assert has_partial_aggregation(df)


def test_duplicate_spans_members_really_share_the_span(spark, sf_small):
    from parquet_extractor_spark.functions.text import tokenize, word_ngrams
    from parquet_extractor_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    out = duplicate_spans(spark, sf_small).collect()
    assert 0 < len(out) <= SPAN_TOP
    docs = dict(
        load_table(spark, sf_small, "documents")
        .select(
            "doc_id", word_ngrams(tokenize("text"), SPAN_TOKENS).alias("spans")
        )
        .rdd.map(lambda r: (r.doc_id, set(r.spans)))
        .collect()
    )
    for r in out[:20]:
        assert r.n_docs > 1
        assert r.n_occurrences >= r.n_docs
        sample_ids = [int(x) for x in r.sample_doc_ids.split(",")]
        assert 0 < len(sample_ids) <= SPAN_SAMPLE_DOCS
        assert sample_ids == sorted(sample_ids)
        for d in sample_ids:
            assert r.span_text in docs[d], (r.span_hash, d)


def test_duplicate_spans_partial_agg(spark, sf_small):
    df = duplicate_spans(spark, sf_small)
    assert has_partial_aggregation(df)
    assert set().union(*read_schema_columns(df)) <= {"doc_id", "text"}


def test_span_scrub_accounting_and_untouched_docs(spark, sf_small):
    from parquet_extractor_spark.functions.text import tokenize
    from parquet_extractor_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    rows = span_scrubbed_docs(spark, sf_small).collect()
    assert len(rows) == 500  # every doc survives as a row
    originals = dict(
        load_table(spark, sf_small, "documents")
        .select("doc_id", F.array_join(tokenize("text"), " ").alias("t"))
        .rdd.map(lambda r: (r.doc_id, r.t))
        .collect()
    )
    total_removed = 0
    for r in rows:
        assert 0 <= r.n_removed <= r.n_tokens
        kept = [t for t in r.scrubbed_text.split(" ") if t]
        assert len(kept) == r.n_tokens - r.n_removed, r.doc_id
        if r.n_removed == 0:
            assert r.scrubbed_text == originals[r.doc_id]
        total_removed += r.n_removed
    # the fixture corpus has duplicated spans (duplicate_spans is
    # non-empty), so the scrub must actually delete tokens — and must
    # not delete everything
    assert 0 < total_removed < sum(r.n_tokens for r in rows)


def test_span_scrub_is_deterministic_and_pruned(spark, sf_small):
    a = sorted(
        (r.doc_id, r.n_removed, r.scrubbed_text)
        for r in span_scrubbed_docs(spark, sf_small).collect()
    )
    b = sorted(
        (r.doc_id, r.n_removed, r.scrubbed_text)
        for r in span_scrubbed_docs(spark, sf_small).collect()
    )
    assert a == b
    df = span_scrubbed_docs(spark, sf_small)
    assert has_partial_aggregation(df)
    assert set().union(*read_schema_columns(df)) <= {"doc_id", "text"}


def test_lm_surprisal_detects_scrambled_text(spark, sf_small):
    """Corpus-level invariants of the hashed-bigram LM score: every
    doc gets a positive −ln P average, scores have non-degenerate
    spread, and every doc contributes at least one bigram."""
    from parquet_extractor_spark.operators.selection import lm_bigram_surprisal

    rows = lm_bigram_surprisal(spark, sf_small).collect()
    assert len(rows) == 500
    scores = [r.avg_surprisal_micro for r in rows]
    assert all(s > 0 for s in scores)  # −ln P is positive
    assert min(scores) < max(scores)  # non-degenerate spread
    for r in rows:
        assert r.n_bigrams > 0


def test_lm_surprisal_plan_broadcasts_lm_tables(spark, sf_small):
    from parquet_extractor_spark.operators.selection import lm_bigram_surprisal

    df = lm_bigram_surprisal(spark, sf_small)
    assert has_broadcast_hash_join(df)
    assert has_partial_aggregation(df)
    assert set().union(*read_schema_columns(df)) <= {"doc_id", "lang", "text"}


def test_curriculum_phases_partition_by_difficulty(spark, sf_small):
    """Phases must be monotone in surprisal (no hard doc in an easier
    phase than an easy doc), cover every scored document, and split
    the corpus into four non-degenerate buckets."""
    from parquet_extractor_spark.operators.selection import (
        curriculum_phases,
        lm_bigram_surprisal,
    )

    rows = curriculum_phases(spark, sf_small).collect()
    assert len(rows) == lm_bigram_surprisal(spark, sf_small).count()
    by_phase = {}
    for r in rows:
        by_phase.setdefault(r.phase, []).append(r.avg_surprisal_micro)
    assert set(by_phase) == {1, 2, 3, 4}
    for p in (1, 2, 3):
        assert max(by_phase[p]) <= min(by_phase[p + 1])
    n = len(rows)
    for p, scores in by_phase.items():
        assert len(scores) > 0.1 * n, (p, len(scores))


def test_span_scrub_exact_semantics_on_crafted_corpus(spark, tmp_path):
    """Adversarial fixture + full local reimplementation: cross-doc
    dup spans (removed, canonical survives), a whole-doc duplicate,
    overlapping occurrences, a within-doc-only repeat (kept — the
    rule is cross-document), and a short doc whose all-tokens span
    matches nothing."""
    from parquet_extractor_spark.operators.selection import (
        SPAN_KEY_BASE,
        SPAN_TOKENS,
        span_scrubbed_docs,
    )

    span = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = [
        (0, f"a1 a2 {span} a3 a4"),                      # canonical holder
        (1, f"b1 b2 b3 {span} b4"),                      # later occurrence
        (2, f"a1 a2 {span} a3 a4"),                      # exact copy of doc 0
        (3, f"{span} x1 {span}"),                        # two occurrences
        (4, "r1 r2 r3 r1 r2 r3 q1 q2 q3 q4 q5 q6"),      # within-doc only
        (5, "s1 s2 s3"),                                 # short doc
    ]
    d = tmp_path / "scrubfix"
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )

    # local reimplementation
    occ = []
    for doc_id, text in docs:
        toks = text.split()
        n = len(toks)
        starts = range(1, max(n - SPAN_TOKENS + 1, 1) + 1)
        for p in starts:
            occ.append(
                (doc_id, p, " ".join(toks[p - 1 : p - 1 + SPAN_TOKENS]))
            )
    by_span = {}
    for doc_id, p, s in occ:
        by_span.setdefault(s, []).append((doc_id, p))
    rm = {}
    for s, occs in by_span.items():
        if len({d_ for d_, _ in occs}) < 2:
            continue
        canon = min(d_ * SPAN_KEY_BASE + p for d_, p in occs)
        for d_, p in occs:
            if d_ * SPAN_KEY_BASE + p != canon:
                rm.setdefault(d_, set()).update(
                    range(p, p + SPAN_TOKENS)
                )
    want = {}
    for doc_id, text in docs:
        toks = text.split()
        kept = [
            t
            for i, t in enumerate(toks, start=1)
            if i not in rm.get(doc_id, set())
        ]
        want[doc_id] = (len(toks), len(toks) - len(kept), " ".join(kept))

    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.scrubbed_text)
        for r in span_scrubbed_docs(spark, str(d)).collect()
    }
    assert got == want
    # spot semantics: canonical doc 0 untouched, copies scrubbed,
    # within-doc repeat and the short doc untouched
    assert got[0][1] == 0
    assert got[1][1] >= SPAN_TOKENS and got[2][1] > 0
    assert got[4][1] == 0 and got[5][1] == 0


def test_hybrid_search_rrf_fuses_both_lists(spark, sf_small):
    from parquet_extractor_spark.operators.selection import (
        HYBRID_RRF_K,
        HYBRID_TOP_K,
        bm25_doc_scores,
        hybrid_search_rrf,
    )

    rows = hybrid_search_rrf(spark, sf_small).collect()
    assert 0 < len(rows) <= HYBRID_TOP_K
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    lex = {r.doc_id: r["rank"] for r in bm25_doc_scores(spark, sf_small).collect()}
    for r in rows:
        assert r.lex_rank >= 0 and r.vec_rank >= 0
        assert r.lex_rank > 0 or r.vec_rank > 0  # in at least one list
        if r.lex_rank:
            assert lex[r.id] == r.lex_rank
        want = (1.0 / (HYBRID_RRF_K + r.lex_rank) if r.lex_rank else 0.0) + (
            1.0 / (HYBRID_RRF_K + r.vec_rank) if r.vec_rank else 0.0
        )
        assert abs(r.rrf_score - want) < 1e-6
    # a doc in BOTH lists must outrank one with only a deep single-list
    # hit at the same best rank (monotonicity of the fusion)
    both = [r for r in rows if r.lex_rank and r.vec_rank]
    if both:
        only = [r for r in rows if not (r.lex_rank and r.vec_rank)]
        for b in both:
            for o in only:
                if max(b.lex_rank, b.vec_rank) <= (o.lex_rank or o.vec_rank):
                    assert b.rrf_score > o.rrf_score


def test_ccnet_buckets_are_language_tertiles(spark, sf_small):
    from parquet_extractor_spark.operators.selection import (
        ccnet_perplexity_buckets,
    )

    rows = ccnet_perplexity_buckets(spark, sf_small).collect()
    by_lang: dict[str, dict[str, object]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}, lang
        shares = [buckets[b].doc_share for b in ("head", "middle", "tail")]
        assert abs(sum(shares) - 1.0) < 1e-5
        # tertiles: each bucket holds roughly a third of the language
        for s in shares:
            assert 0.15 <= s <= 0.55, (lang, shares)
        # head is the LOW-surprisal (in-distribution) side: its docs
        # cannot be fewer than a tail that the cutoffs would forbid
        n = sum(buckets[b].n_docs for b in buckets)
        assert buckets["head"].n_docs >= n // 3 - 1


def test_source_vocab_kmv_jaccard_estimator_quality(spark, sf_small):
    """The bottom-k sketch must earn its keep: with K=128 the
    estimator's std error is ~1/sqrt(128) ≈ 0.042, so mean |err| stays
    well under 1.5σ and the worst pair under ~3.5σ (measured at
    sf0.001: mean 0.037, max 0.133 over 190 pairs on a 0.56-0.71
    exact-Jaccard spread — a real signal, not the degenerate ≈1.0
    unigram overlap)."""
    from parquet_extractor_spark.operators.selection import (
        KMV_K,
        source_vocab_kmv_jaccard,
    )

    rows = source_vocab_kmv_jaccard(spark, sf_small).collect()
    assert len(rows) > 1
    assert all(r.k_used == KMV_K for r in rows)  # vocab >= K per source
    errs = [r.abs_err_micro for r in rows]
    assert sum(errs) / len(errs) <= 60_000
    assert max(errs) <= 200_000
    # the exact tier really does spread (the estimator had work to do)
    exact = [r.jaccard_micro_exact for r in rows]
    assert max(exact) - min(exact) > 50_000


def test_longest_dup_span_pow2_planted(spark, tmp_path):
    """Planted corpus with hand-known span structure: the pow2 level
    is a 2x lower bound on the true longest duplicated span (any true
    span >= 2k contains a duplicated k-window)."""
    import os

    from parquet_extractor_spark.operators.selection import (
        longest_dup_span_pow2,
    )

    base = "w%d"  # unique filler tokens -> no accidental repeats
    shared16 = " ".join(f"s{i}" for i in range(16))
    rows = [
        # docs 1/2 share EXACTLY a 16-token run inside unique filler
        (1, " ".join(base % i for i in range(100, 120))
            + " " + shared16 + " "
            + " ".join(base % i for i in range(200, 220)), "en", "srcA", 0),
        (2, " ".join(base % i for i in range(300, 320))
            + " " + shared16 + " "
            + " ".join(base % i for i in range(400, 420)), "en", "srcA", 0),
        # doc 3: all-unique tokens -> no duplicated window at any level
        (3, " ".join(base % i for i in range(500, 560)), "en", "srcB", 0),
        # docs 4/5: byte-identical 70-token text -> level 64 fires
        (4, " ".join(f"t{i % 7}x{i}" for i in range(70)), "en", "srcC", 0),
        (5, " ".join(f"t{i % 7}x{i}" for i in range(70)), "en", "srcC", 0),
    ]
    d = str(tmp_path / "mini")
    os.makedirs(d)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))

    got = {r.doc_id: r.longest_dup_pow2
           for r in longest_dup_span_pow2(spark, d).collect()}
    # true longest shared span is 16 -> level 16 fires, 32 cannot
    assert got[1] == 16 and got[2] == 16
    assert got[3] == 0
    assert got[4] == 64 and got[5] == 64
