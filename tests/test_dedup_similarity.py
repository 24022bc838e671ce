"""Dedup + similarity operators against a synthetic fixture with KNOWN
duplicates (the driver fixtures contain none), written as a
documents.parquet/embeddings.parquet pair in a temp dir so the
operators run through their normal (spark, sf_dir) entry points."""

import math

import pytest
from pyspark.sql import functions as F

from parquet_extractor_spark.operators import dedup, similarity

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "into the deep green forest tonight"
)


@pytest.fixture(scope="module")
def dup_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dupfix")
    docs = [
        (0, BASE, "en", "src0", len(BASE)),
        (1, BASE, "en", "src0", len(BASE)),  # exact dup of 0
        (2, BASE + " extra trailing words here", "en", "src0", 0),  # near-dup
        (3, "completely different text about spark query engines", "en", "src1", 0),
        (4, "", "en", "src1", 0),  # empty doc edge case
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    emb = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.999, 0.01, 0.0, 0.0], 0),  # near-identical to 0
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [0.0, 0.0, 1.0, 0.0], 2),
        (4, [-1.0, 0.0, 0.0, 0.0], 3),  # opposite bucket to 0
    ]
    spark.createDataFrame(
        emb, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_exact_dedup_groups(spark, dup_dir):
    rows = {r.keep_doc_id: r.n_copies for r in dedup.exact_dedup(spark, dup_dir).collect()}
    assert rows[0] == 2  # docs 0 and 1 collapse, min id survives
    assert rows[2] == 1 and rows[3] == 1


def test_ngram_jaccard_finds_near_dup(spark, dup_dir):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(spark, dup_dir).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical docs
    assert pairs[(0, 2)] > 0.7  # near-dup
    assert (0, 3) not in pairs  # unrelated


def test_minhash_identical_signatures_and_lsh(spark, dup_dir):
    sigs = {r.doc_id: tuple(r)[1:] for r in dedup.minhash_signatures(spark, dup_dir).collect()}
    assert sigs[0] == sigs[1]  # identical docs -> identical signatures
    assert sigs[0] != sigs[3]
    cands = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_candidates(spark, dup_dir).collect()
    }
    assert (0, 1) in cands
    assert (0, 3) not in cands


def test_simhash_properties(spark, dup_dir):
    sh = {r.doc_id: r.simhash for r in dedup.simhash_fingerprints(spark, dup_dir).collect()}
    assert sh[0] == sh[1]  # identical docs
    assert sh[4] == 0  # empty doc
    # near-dup differs in few bits; unrelated differs in many
    near = bin(sh[0] ^ sh[2]).count("1")
    far = bin(sh[0] ^ sh[3]).count("1")
    assert near < far


def test_knn_bruteforce_neighbor_order(spark, dup_dir):
    rows = similarity.knn_bruteforce(spark, dup_dir).collect()
    top_for_0 = [r for r in rows if r.query_id == 0 and r.rank == 1][0]
    assert top_for_0.neighbor_id == 1  # the near-identical vector
    assert top_for_0.cosine_sim == pytest.approx(
        0.999 / math.sqrt(0.999**2 + 0.01**2), abs=1e-6
    )


def test_ann_bucket_excludes_opposite_vector(spark, dup_dir):
    rows = similarity.ann_sign_lsh(spark, dup_dir).collect()
    neighbors_of_0 = {r.neighbor_id for r in rows if r.query_id == 0}
    assert 4 not in neighbors_of_0  # negative first dim -> other bucket
    assert 1 in neighbors_of_0


def test_embedding_near_dup_pairs(spark, dup_dir):
    pairs = {
        (r.vec_a, r.vec_b): r.cosine_sim
        for r in similarity.embedding_near_dup_pairs(spark, dup_dir).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert all(a == 0 and b == 1 for (a, b) in pairs)  # only one true pair


def test_dedup_components_properties(spark, sf_small):
    """Every candidate pair's endpoints share a component, and each
    component is labeled by its minimum member id."""
    from parquet_extractor_spark.operators.dedup import (
        dedup_components,
        minhash_lsh_candidates,
    )

    comp = {
        r.doc_id: r.component
        for r in dedup_components(spark, sf_small).collect()
    }
    pairs = minhash_lsh_candidates(spark, sf_small).collect()
    for p in pairs:
        assert comp[p.doc_a] == comp[p.doc_b]
    members = {}
    for doc, c in comp.items():
        members.setdefault(c, []).append(doc)
    for c, docs in members.items():
        assert c == min(docs)


def test_ann_recall_vs_bruteforce(spark, sf_small):
    """Recall@k of the approximate tiers against exact brute force —
    the honest ANN quality metric. IVF probes NPROBE/NUM_CENTROIDS of
    the space and must beat the coarser single-bucket sign-LSH."""
    from parquet_extractor_spark.operators.similarity import (
        ann_ivf,
        ann_sign_lsh,
        knn_bruteforce,
    )

    def neighbor_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    exact = neighbor_sets(knn_bruteforce(spark, sf_small))

    def recall(approx):
        num = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
        den = sum(len(nbrs) for nbrs in exact.values())
        return num / den

    from parquet_extractor_spark.operators.similarity import (
        ann_sign_lsh_multiprobe,
    )

    r_ivf = recall(neighbor_sets(ann_ivf(spark, sf_small)))
    r_lsh = recall(neighbor_sets(ann_sign_lsh(spark, sf_small)))
    r_multi = recall(neighbor_sets(ann_sign_lsh_multiprobe(spark, sf_small)))
    # floors chosen from the fixture's measured values (0.96 / 0.16 /
    # 0.52) with slack; they exist to catch regressions, not to
    # flatter the tiers
    assert r_ivf >= 0.3, r_ivf
    assert r_lsh >= 0.1, r_lsh
    assert r_multi >= 0.3, r_multi
    assert r_multi >= r_lsh  # probing more buckets can't hurt recall
    assert r_ivf >= r_lsh


def test_persisted_ivf_index_matches_inline_ivf(spark, sf_small):
    """build-once/search-many IVF: searching the bucketed index with
    the fixture's own query vectors reproduces ann_ivf exactly."""
    from parquet_extractor_spark.operators.similarity import (
        N_QUERIES,
        ann_ivf,
        build_ivf_index,
        search_ivf_index,
    )
    from parquet_extractor_spark.sources.tables import load_table

    cents = build_ivf_index(spark, sf_small, table_name="ivf_index_test")
    try:
        queries = [
            (r.vec_id, [float(x) for x in r.embedding])
            for r in load_table(spark, sf_small, "embeddings")
            .filter(F.col("vec_id") < N_QUERIES)
            .collect()
        ]
        got = [
            tuple(r)
            for r in search_ivf_index(
                spark, queries, cents, table_name="ivf_index_test"
            ).collect()
        ]
        want = [tuple(r) for r in ann_ivf(spark, sf_small).collect()]
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS ivf_index_test")


def test_kmeans_refine_improves_inertia(spark, sf_small):
    """One Lloyd mean-update must not increase total inertia
    (monotonic convergence), clusters cover all vectors, and ids stay
    within the seeded k."""
    from pyspark.sql import functions as F

    from parquet_extractor_spark.operators.similarity import (
        NUM_CENTROIDS,
        _centroid_vectors,
        _sqdist_lit_sql_expr,
        kmeans_refine,
    )
    from parquet_extractor_spark.sources.tables import load_table

    out = kmeans_refine(spark, sf_small).collect()
    n_total = load_table(spark, sf_small, "embeddings").count()
    assert sum(r.n_vectors for r in out) == n_total
    assert all(0 <= r.cluster < NUM_CENTROIDS for r in out)

    # inertia of the INITIAL assignment (no mean update)
    emb = load_table(spark, sf_small, "embeddings")
    cents = _centroid_vectors(spark, sf_small)
    d0 = F.array_min(
        F.array(
            *[
                F.expr(f"round({_sqdist_lit_sql_expr('embedding', c)}, 9)")
                for c in cents
            ]
        )
    )
    initial_inertia = emb.select(F.sum(d0).alias("s")).first().s
    refined_inertia = sum(r.avg_sqdist * r.n_vectors for r in out)
    assert refined_inertia <= initial_inertia + 1e-6


def test_semdedup_keep_flags_are_exactly_right(spark, sf_small):
    """Recompute SemDeDup's rule locally: a vector is dropped iff a
    LOWER-id member of its cluster sits within the cosine threshold."""
    import numpy as np

    from parquet_extractor_spark.operators.similarity import (
        SEMDEDUP_THRESHOLD,
        semdedup_keep,
    )
    from parquet_extractor_spark.sources.tables import load_table

    rows = semdedup_keep(spark, sf_small).collect()
    assert len(rows) == 500
    dropped = {r.vec_id for r in rows if not r.keep}
    assert dropped  # threshold chosen to make the fixture non-trivial
    cluster_of = {r.vec_id: r.cluster for r in rows}

    embs = {
        r.vec_id: np.array([float(x) for x in r.embedding])
        for r in load_table(spark, sf_small, "embeddings").collect()
    }

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    for r in rows:
        lower_neighbors = [
            v
            for v in embs
            if v < r.vec_id
            and cluster_of[v] == r.cluster
            and round(cos(embs[v], embs[r.vec_id]), 6) >= SEMDEDUP_THRESHOLD
        ]
        assert (not r.keep) == bool(lower_neighbors), r.vec_id


def test_semdedup_no_forced_broadcast(spark, sf_small):
    """Cluster assignment is plan-time literals; the self-join keys on
    cluster — nothing in the plan may pin a corpus-sized broadcast."""
    from parquet_extractor_spark.operators.similarity import semdedup_keep
    from parquet_extractor_spark.plans.explain import forced_broadcast_count

    assert forced_broadcast_count(semdedup_keep(spark, sf_small)) == 0


def test_embedding_ops_survive_sparse_nonzero_ids(spark, sf_small, tmp_path):
    """The r03 hardening contract: centroid seeds and the ANN query
    set are picked by RANK, so a fixture whose vec_ids are sparse and
    nowhere near 0 still produces real (non-empty) results from every
    embedding operator instead of empty sets or errors."""
    from pyspark.sql import functions as F

    from parquet_extractor_spark.operators.similarity import (
        TOP_K,
        ann_ivf,
        knn_bruteforce,
        pq_codes,
        semdedup_keep,
    )
    from parquet_extractor_spark.sources.tables import load_table

    d = tmp_path / "sparse"
    (
        load_table(spark, sf_small, "embeddings")
        .withColumn("vec_id", (F.col("vec_id") * 17 + 1_000_003).cast("long"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(d / "embeddings.parquet"))
    )
    sparse = str(d)

    knn = knn_bruteforce(spark, sparse).collect()
    assert len(knn) == 5 * TOP_K
    assert {r.query_id for r in knn} == {1_000_003 + 17 * i for i in range(5)}

    ivf = ann_ivf(spark, sparse).collect()
    assert ivf and {r.query_id for r in ivf} <= {r.query_id for r in knn}

    sd = semdedup_keep(spark, sparse).collect()
    assert len(sd) == 500 and any(not r.keep for r in sd)

    pq = pq_codes(spark, sparse).collect()
    assert len(pq) == 500
    seed_ids = {str(1_000_003 + 17 * i) for i in range(8)}
    assert all(set(r.pq_code.split(",")) <= seed_ids for r in pq)


def test_ann_ivf_pq_recall_floor_and_shape(spark, sf_small):
    """IVF-PQ with the untrained bootstrap codebook: recall@5 vs exact
    L2 must stay well above random (pinned floor 0.1; measured 0.2) —
    the documented codebook-training gap, not a plan defect. Also pins
    the output contract: top-k per query, ADC distances non-negative
    and monotone with rank."""
    import numpy as np

    from parquet_extractor_spark.operators.similarity import (
        TOP_K,
        ann_ivf_pq,
    )
    from parquet_extractor_spark.sources.tables import load_table

    embs = {
        r.vec_id: np.array([float(x) for x in r.embedding])
        for r in load_table(spark, sf_small, "embeddings").collect()
    }
    qids = sorted(embs)[:5]
    exact = {}
    for q in qids:
        d = sorted(
            (float(np.sum((embs[q] - embs[v]) ** 2)), v)
            for v in embs
            if v != q
        )
        exact[q] = {v for _, v in d[:TOP_K]}

    rows = ann_ivf_pq(spark, sf_small).collect()
    got = {}
    for r in rows:
        got.setdefault(r.query_id, []).append(r)
    assert set(got) == set(qids)
    for q, rs in got.items():
        assert len(rs) == TOP_K
        dists = [r.adc_dist_micro for r in sorted(rs, key=lambda r: r.rank)]
        assert all(d >= 0 for d in dists)
        assert dists == sorted(dists)

    num = sum(
        len({r.neighbor_id for r in got[q]} & exact[q]) for q in qids
    )
    den = sum(len(exact[q]) for q in qids)
    assert num / den >= 0.1


def test_refined_codebook_beats_bootstrap_recall(spark, sf_small):
    """The trained codebook (PQ_K_REFINED=16 codewords, one
    distributed Lloyd step) must not lose recall vs the 8-codeword
    bootstrap seeds, and measurably gains on the fixture
    (0.2 -> 0.36 measured; pinned as >=)."""
    import numpy as np

    from parquet_extractor_spark.operators.similarity import (
        TOP_K,
        ann_ivf_pq,
        ann_ivf_pq_refined,
    )
    from parquet_extractor_spark.sources.tables import load_table

    embs = {
        r.vec_id: np.array([float(x) for x in r.embedding])
        for r in load_table(spark, sf_small, "embeddings").collect()
    }
    qids = sorted(embs)[:5]
    exact = {}
    for q in qids:
        d = sorted(
            (float(np.sum((embs[q] - embs[v]) ** 2)), v)
            for v in embs
            if v != q
        )
        exact[q] = {v for _, v in d[:TOP_K]}

    def recall(fn):
        got = {}
        for r in fn(spark, sf_small).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        num = sum(len(got.get(q, set()) & exact[q]) for q in qids)
        return num / sum(len(exact[q]) for q in qids)

    r_boot = recall(ann_ivf_pq)
    r_ref = recall(ann_ivf_pq_refined)
    assert r_ref >= r_boot
    assert r_ref >= 0.35


def test_random_projection_knn_shape_and_recall(spark, sf_small):
    """JL random-projection tier: structural invariants plus a
    measured recall floor. The fixture embeddings are near-isotropic
    (neighbor margins are tiny), so top-5 recall after 64→16
    projection is inherently modest — measured 0.08 at this fixture;
    the floor catches sign-matrix or fold regressions, it does not
    flatter the tier. Projection must stay map-side: one pruned scan,
    no shuffle before the pair stage."""
    from parquet_extractor_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        ann_random_projection,
        knn_bruteforce,
    )
    from parquet_extractor_spark.plans.explain import read_schema_columns

    out = ann_random_projection(spark, sf_small).collect()
    assert len(out) == N_QUERIES * TOP_K
    by_q = {}
    for r in out:
        assert -1.0 <= r.proj_cosine <= 1.0
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, TOP_K + 1)) for v in by_q.values())

    def neighbor_sets(df):
        s = {}
        for r in df.collect():
            s.setdefault(r.query_id, set()).add(r.neighbor_id)
        return s

    exact = neighbor_sets(knn_bruteforce(spark, sf_small))
    approx = neighbor_sets(ann_random_projection(spark, sf_small))
    num = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
    rec = num / sum(len(n) for n in exact.values())
    assert rec >= 0.05, rec

    df = ann_random_projection(spark, sf_small)
    assert set().union(*read_schema_columns(df)) <= {"vec_id", "embedding"}


def test_pagerank_mass_and_graph_consistency(spark, sf_small):
    """Integer PageRank invariants: node set = candidate-graph nodes,
    every rank at least the teleport floor, total mass bounded by the
    initial mass (floor divisions only lose mass, never create it),
    and centrality is non-degenerate. (Degree alone does NOT bound
    rank — a high-degree node also splits its outflow — so no
    hub-vs-median assertion.)"""
    from parquet_extractor_spark.operators.dedup import (
        PAGERANK_DAMP_PCT,
        PAGERANK_MASS,
        dedup_graph_pagerank,
        minhash_lsh_candidates,
    )

    rows = dedup_graph_pagerank(spark, sf_small).collect()
    pairs = minhash_lsh_candidates(spark, sf_small).collect()
    graph_nodes = {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    assert {r.doc_id for r in rows} == graph_nodes

    n = len(rows)
    teleport = (PAGERANK_MASS * (100 - PAGERANK_DAMP_PCT) // 100) // n
    ranks = [r.rank_micro for r in rows]
    assert all(rk >= teleport for rk in ranks)
    assert sum(ranks) <= PAGERANK_MASS
    assert sum(ranks) > PAGERANK_MASS // 2  # floors lose a little, not half

    assert ranks == sorted(ranks, reverse=True)  # output ordering
    assert min(ranks) < max(ranks)  # non-degenerate centrality


def test_lsh_quality_eval_counts_are_consistent(spark, sf_small):
    """Metric identities: hits bound both sets, micro ratios are the
    floor of the exact quotients, and the LSH tier on this fixture
    catches a meaningful share of true pairs without being vacuous."""
    from parquet_extractor_spark.operators.dedup import lsh_quality_eval

    r = lsh_quality_eval(spark, sf_small).collect()
    assert len(r) == 1
    r = r[0]
    assert 0 < r.n_hits <= min(r.n_exact_pairs, r.n_candidate_pairs)
    assert r.precision_micro == (r.n_hits * 1_000_000) // r.n_candidate_pairs
    assert r.recall_micro == (r.n_hits * 1_000_000) // r.n_exact_pairs
    assert 0 < r.precision_micro <= 1_000_000
    assert 0 < r.recall_micro <= 1_000_000


def test_reduction_report_monotone_and_consistent(spark, sf_small):
    """Stage sizes must shrink monotonically, raw totals must match
    the corpus, and the exact stage must equal exact_dedup's survivor
    count."""
    from parquet_extractor_spark.operators.dedup import (
        dedup_reduction_report,
        exact_dedup,
    )
    from parquet_extractor_spark.sources.tables import load_table

    rows = {r.stage: r for r in dedup_reduction_report(spark, sf_small).collect()}
    assert set(rows) == {"1_raw", "2_exact_dedup", "3_near_dedup"}
    assert rows["1_raw"].n_docs == load_table(
        spark, sf_small, "documents"
    ).count()
    assert (
        rows["1_raw"].n_docs
        >= rows["2_exact_dedup"].n_docs
        >= rows["3_near_dedup"].n_docs
        > 0
    )
    assert (
        rows["1_raw"].n_tokens
        >= rows["2_exact_dedup"].n_tokens
        >= rows["3_near_dedup"].n_tokens
        > 0
    )
    assert rows["2_exact_dedup"].n_docs == exact_dedup(spark, sf_small).count()


def test_dup_cluster_histogram_partitions_corpus(spark, sf_small):
    from parquet_extractor_spark.operators.dedup import (
        dup_cluster_histogram,
    )
    from parquet_extractor_spark.sources.tables import load_table

    rows = dup_cluster_histogram(spark, sf_small).collect()
    assert rows
    n_docs_total = load_table(spark, sf_small, "documents").count()
    # buckets are powers of two and partition the corpus exactly
    assert all(
        r.cluster_size_bucket & (r.cluster_size_bucket - 1) == 0
        for r in rows
    )
    assert sum(r.n_docs for r in rows) == n_docs_total
    # shares are consistent with counts (truncating micro division)
    for r in rows:
        assert r.doc_share_micro == (r.n_docs * 1_000_000) // n_docs_total
    # the fixture has real multi-doc clusters, not just singletons
    assert any(r.cluster_size_bucket > 1 for r in rows)


def test_incremental_dedup_probes_delta_against_prior_index(
    spark, sf_small
):
    """The delta/index doc-id sets are disjoint, planted exact
    duplicates across the snapshot boundary are always recalled
    (identical text → identical signature → same band buckets), and
    the persisted v1_band_index tier answers a second run
    identically."""
    from parquet_extractor_spark.functions.text import portable_hash64
    from parquet_extractor_spark.operators.versioning import (
        incremental_dedup_candidates,
    )
    from parquet_extractor_spark.sources.tables import load_table

    pairs = incremental_dedup_candidates(spark, sf_small).collect()
    assert pairs
    news = {r.doc_new for r in pairs}
    priors = {r.doc_prior for r in pairs}
    assert news.isdisjoint(priors)

    docs = load_table(spark, sf_small, "documents")
    h = portable_hash64(F.col("doc_id").cast("string"))
    sided = docs.select(
        "doc_id",
        F.md5("text").alias("digest"),
        (h % 10 == 0).alias("is_delta"),
    )
    planted = (
        sided.where("is_delta")
        .alias("d")
        .join(
            sided.where("NOT is_delta").alias("i"),
            F.col("d.digest") == F.col("i.digest"),
        )
        .select(
            F.col("d.doc_id").alias("doc_new"),
            F.col("i.doc_id").alias("doc_prior"),
        )
        .collect()
    )
    # sf0.001 plants no exact dup across the split; when any exists
    # (sf0.01+) it MUST be recalled — identical text, identical bands.
    found = {(r.doc_new, r.doc_prior) for r in pairs}
    assert all((p.doc_new, p.doc_prior) in found for p in planted)

    rerun = incremental_dedup_candidates(spark, sf_small).collect()
    assert sorted(map(tuple, rerun)) == sorted(map(tuple, pairs))


def test_ivf_pq_recall_eval_matches_pinned_recalls(spark, sf_small):
    """The registry recall table must agree with this module's pinned
    recall floors: refined >= bootstrap on average, every recall in
    [0, 1e6] micro, exactly TOP_K as k, one row per (variant, query),
    and n_hits consistent with recall_micro."""
    from parquet_extractor_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        ivf_pq_recall_eval,
    )

    rows = ivf_pq_recall_eval(spark, sf_small).collect()
    assert len(rows) == 2 * N_QUERIES
    by_cb = {}
    for r in rows:
        assert r.k == TOP_K
        assert 0 <= r.n_hits <= TOP_K
        assert r.recall_micro == r.n_hits * 1_000_000 // TOP_K
        by_cb.setdefault(r.codebook, []).append(r.n_hits)
    assert set(by_cb) == {"bootstrap", "refined"}
    assert len(by_cb["bootstrap"]) == len(by_cb["refined"]) == N_QUERIES
    assert sum(by_cb["refined"]) >= sum(by_cb["bootstrap"])
    # the documented floor: bootstrap recall >= 0.1 on the fixture
    assert sum(by_cb["bootstrap"]) / (N_QUERIES * TOP_K) >= 0.1
