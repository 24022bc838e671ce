"""Semantic and plan checks for the embedding utilities and
corpus-drift analytics."""

from parquet_extractor_spark.operators import analyze, similarity
from parquet_extractor_spark.plans.explain import has_partial_aggregation


def test_label_centroids_shape_and_counts(spark, sf_small):
    rows = similarity.label_centroids(spark, sf_small).collect()
    assert len(rows) == 10
    assert sum(r.n_vecs for r in rows) == 500
    for r in rows:
        comps = [int(c) for c in r.centroid_micro.split(",")]
        assert len(comps) == 64
        # means of unit-scale embeddings: micro-ints stay within ±2e6
        assert all(abs(c) < 2_000_000 for c in comps)


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


def test_pq_codes_shape_and_seed_reconstruction(spark, sf_small):
    """Every vector gets a PQ_M-component code drawn from the seed
    vec_ids; the seed vectors reconstruct themselves exactly (their
    own subvector is a codeword, so per-subspace min distance is 0)."""
    from parquet_extractor_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        pq_codes,
    )

    rows = pq_codes(spark, sf_small).collect()
    assert len(rows) == 500
    seed_ids = {str(i) for i in range(PQ_K)}  # sf fixtures: vec_id 0..499
    for r in rows:
        comps = r.pq_code.split(",")
        assert len(comps) == PQ_M
        assert set(comps) <= seed_ids
        assert r.recon_err_micro >= 0
    by_id = {r.vec_id: r for r in rows}
    for sid in range(PQ_K):
        assert by_id[sid].recon_err_micro == 0


def test_pq_codes_plan_is_scan_only(spark, sf_small):
    """PQ assignment must be map-side: no shuffle of embedding rows
    except the output sort. r13: the codebook arrives as a 1-row
    BROADCAST relation (_cross_const) instead of inlined literals, so
    the plan may carry one broadcast join of that constant — but never
    a shuffle (hash exchange / sort-merge join) of the vectors."""
    from parquet_extractor_spark.operators.similarity import pq_codes

    plan = pq_codes(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
    # the output orderBy's range partitioning is the only row shuffle
    assert plan.count("Exchange rangepartitioning") <= 1
    # the codebook broadcast is constant-size: one 1-row local relation
    assert plan.count("BroadcastExchange") <= 1


def test_label_text_profile_cross_table_join(spark, sf_small):
    """The embeddings->documents id relationship declared in
    FIXTURES.md: every label row aggregates real joined documents,
    counts add up to the join cardinality, and the dominant language
    is recomputed locally."""
    from collections import Counter

    from parquet_extractor_spark.sources.tables import load_table

    rows = analyze.label_text_profile(spark, sf_small).collect()
    assert len(rows) == 10

    docs = {
        r.doc_id: r.lang
        for r in load_table(spark, sf_small, "documents").collect()
    }
    emb = [
        (r.vec_id, r.label)
        for r in load_table(spark, sf_small, "embeddings").collect()
        if r.vec_id in docs
    ]
    assert sum(r.n_docs for r in rows) == len(emb)
    langs_by_label = {}
    for vid, label in emb:
        langs_by_label.setdefault(label, Counter())[docs[vid]] += 1
    for r in rows:
        want = sorted(
            langs_by_label[r.label].items(), key=lambda kv: (-kv[1], kv[0])
        )[0][0]
        assert r.top_lang == want
        assert r.avg_tokens > 0


def test_embedding_outliers_are_the_farthest_members(spark, sf_small):
    """Per-label top-K distance outliers: K rows per label, ranks
    dense, distances non-increasing, and the flagged set matches a
    local numpy recompute against 1e-6-rounded centroids."""
    import numpy as np

    from parquet_extractor_spark.operators.similarity import (
        OUTLIER_TOP_K,
        embedding_outliers,
    )
    from parquet_extractor_spark.sources.tables import load_table

    rows = embedding_outliers(spark, sf_small).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)

    data = load_table(spark, sf_small, "embeddings").collect()
    vecs = {}
    for e in data:
        vecs.setdefault(e.label, []).append(
            (e.vec_id, np.array(e.embedding, dtype=np.float64))
        )

    for label, flagged in by_label.items():
        assert [r.rank for r in flagged] == list(
            range(1, min(OUTLIER_TOP_K, len(vecs[label])) + 1)
        )
        dists = [r.dist_micro for r in flagged]
        assert dists == sorted(dists, reverse=True)

        members = vecs[label]
        cent = np.round(
            np.mean(np.stack([v for _, v in members]), axis=0), 6
        )
        local = {
            vid: int(
                sum(
                    int(np.floor(round(float(t), 9) * 1e6 + 0.5))
                    for t in (v - cent) ** 2
                )
            )
            for vid, v in members
        }
        want = [
            vid
            for vid, _d in sorted(
                local.items(), key=lambda kv: (-kv[1], kv[0])
            )[: len(flagged)]
        ]
        assert [r.vec_id for r in flagged] == want, label


def test_source_length_ks_matches_pure_python(spark, sf_small):
    """Exact KS recomputed naively from the raw rows."""
    from parquet_extractor_spark.operators.analyze import source_length_ks
    from parquet_extractor_spark.sources.tables import load_table

    rows = source_length_ks(spark, sf_small).collect()
    assert rows
    docs = load_table(spark, sf_small, "documents").collect()
    all_lens = sorted(d.n_chars for d in docs)
    n_all = len(all_lens)
    by_src = {}
    for d in docs:
        by_src.setdefault(d.source, []).append(d.n_chars)
    assert {r.source for r in rows} == set(by_src)
    for r in rows:
        lens = sorted(by_src[r.source])
        n_s = len(lens)
        assert r.n_docs == n_s
        support = sorted(set(all_lens))
        ks = 0.0
        for x in support:
            f_s = sum(1 for v in lens if v <= x) / n_s
            f_a = sum(1 for v in all_lens if v <= x) / n_all
            ks = max(ks, abs(f_s - f_a))
        assert abs(r.ks_stat - ks) < 1e-6
        assert 0.0 <= r.ks_stat <= 1.0


def test_sq8_codes_quality_and_plan(spark, sf_small):
    """SQ8 scalar quantization: every code is an 8-bit level, the
    reconstruction recovers the corpus well enough that dequantized
    cosine top-10 matches exact top-10 with high recall (the
    near-lossless property that makes SQ8 the default FAISS
    compressor), and the quantize pass itself is map-side only — the
    min/max table re-enters as plan-time literals."""
    import numpy as np

    from parquet_extractor_spark.operators.similarity import sq8_codes
    from parquet_extractor_spark.sources.tables import load_table

    rows = sq8_codes(spark, sf_small).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_small, "embeddings").collect()
    }
    assert len(rows) == len(emb)
    mat = np.stack([emb[i] for i in sorted(emb)])
    mins, maxs = mat.min(axis=0), mat.max(axis=0)
    span = np.where(maxs > mins, maxs - mins, 1.0)
    deq = {}
    for r in rows:
        codes = np.array([int(c) for c in r.sq8_code.split(",")])
        assert codes.min() >= 0 and codes.max() <= 255
        assert r.recon_err_micro >= 0
        deq[r.vec_id] = mins + codes * span / 255.0
        # per-vector reconstruction error matches the reported one
        err = float(((emb[r.vec_id] - deq[r.vec_id]) ** 2).sum())
        assert abs(err - r.recon_err_micro / 1e6) < 1e-3
    # recall@10 of dequantized cosine vs exact cosine over 20 queries
    ids = sorted(emb)
    exact = np.stack([emb[i] for i in ids])
    approx = np.stack([deq[i] for i in ids])
    exact_n = exact / np.linalg.norm(exact, axis=1, keepdims=True)
    approx_n = approx / np.linalg.norm(approx, axis=1, keepdims=True)
    hits = total = 0
    for q in range(20):
        true_top = set(
            np.argsort(-(exact_n @ exact_n[q]))[1:11].tolist()
        )
        appr_top = set(
            np.argsort(-(approx_n @ approx_n[q]))[1:11].tolist()
        )
        hits += len(true_top & appr_top)
        total += 10
    assert hits / total >= 0.9, hits / total

    plan = (
        sq8_codes(spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan


def test_matryoshka_recall_monotone_anchor(spark, sf_small):
    from parquet_extractor_spark.operators.similarity import (
        EMB_DIM,
        MATRYOSHKA_DIMS,
        N_QUERIES,
        TOP_K,
        matryoshka_recall,
    )

    rows = {r.dims: r for r in matryoshka_recall(spark, sf_small).collect()}
    assert set(rows) == set(MATRYOSHKA_DIMS)
    # full-dim row is the identity anchor
    assert rows[EMB_DIM].recall_at_k == 1.0
    assert rows[EMB_DIM].n_hits == TOP_K * N_QUERIES
    for d, r in rows.items():
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.n_hits <= TOP_K * N_QUERIES
    # truncating to an eighth of the dims must lose information on
    # random (non-matryoshka-trained) fixture embeddings
    assert rows[8].recall_at_k < 1.0


def test_binary_hamming_recall_funnel(spark, sf_small):
    from parquet_extractor_spark.operators.similarity import (
        BQ_POOL,
        N_QUERIES,
        TOP_K,
        binary_hamming_recall,
    )

    rows = {r.stage: r for r in binary_hamming_recall(spark, sf_small).collect()}
    assert set(rows) == {"hamming_topk", "reranked"}
    for r in rows.values():
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.n_hits <= TOP_K * N_QUERIES
    # the exact-cosine rerank over the BQ_POOL candidates can only add
    # true neighbors relative to raw hamming order (same pool, better
    # metric) — and on this fixture it measurably does
    assert rows["reranked"].n_hits >= rows["hamming_topk"].n_hits
    # regression floor: 64-bit midpoint codes + 4x-oversampled rerank
    # recover ~half the exact top-k on the random fixture (0.48
    # measured at sf0.001); alert if codes or funnel degrade
    assert rows["reranked"].recall_at_k >= 0.4
    assert BQ_POOL == 4 * TOP_K
