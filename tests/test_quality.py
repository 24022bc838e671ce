import re

import pytest

from parquet_extractor_spark.operators import quality


@pytest.fixture(scope="module")
def lang_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("langfix")
    docs = [
        (0, "the cat and the dog that was in the house", "en", "s", 0),
        (1, "der Hund und die Katze ist nicht mit dem Mann", "de", "s", 0),
        (2, "el perro y la casa de los gatos una vez", "es", "s", 0),
        (3, "le chien est dans la maison pour les chats", "fr", "s", 0),
        (4, "这是一个中文文档的例子", "zh", "s", 0),
        (5, "zzz qqq xxx", "en", "s", 0),  # no stopword hits -> und
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_language_id_on_known_sentences(spark, lang_dir):
    rows = {r.doc_id: r.pred_lang for r in quality.language_id(spark, lang_dir).collect()}
    assert rows[0] == "en"
    assert rows[1] == "de"
    assert rows[2] == "es"
    assert rows[3] == "fr"
    assert rows[4] == "zh"  # CJK detection
    assert rows[5] == "und"


def test_language_id_on_fixture_is_deterministic(spark, sf_small):
    # NOTE: the driver fixture's text is language-agnostic synthetic
    # vocabulary (the lang column is a label only), so accuracy against
    # the label is not a meaningful check there — the known-sentences
    # test above validates accuracy. Here: valid labels + determinism.
    rows1 = {r.doc_id: r.pred_lang for r in quality.language_id(spark, sf_small).collect()}
    rows2 = {r.doc_id: r.pred_lang for r in quality.language_id(spark, sf_small).collect()}
    assert rows1 == rows2
    assert set(rows1.values()) <= {"en", "de", "es", "fr", "zh", "und"}


def test_bpe_token_counts_match_python_re(spark, lang_dir):
    rows = {r.doc_id: r.bpe_tokens for r in quality.bpe_token_counts(spark, lang_dir).collect()}
    texts = {
        0: "the cat and the dog that was in the house",
        5: "zzz qqq xxx",
    }
    for doc_id, text in texts.items():
        expected = len(re.findall(quality.BPE_PATTERN, text))
        assert rows[doc_id] == expected


def test_quality_scores_ranges(spark, sf_small):
    rows = quality.quality_scores(spark, sf_small).collect()
    for r in rows:
        assert 0.0 <= r.quality_score <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0
        assert r.n_tokens >= 0


def test_fingerprints_detect_shared_prefix(spark, tmp_path):
    d = tmp_path / "fp"
    shared = "identical long shared prefix that dominates the minimum hash "
    docs = [
        (0, shared + "tail one", "en", "s", 0),
        (1, shared + "tail two", "en", "s", 0),
        (2, "completely different material here", "en", "s", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    fps = {r.doc_id: r.fingerprint for r in quality.doc_fingerprints(spark, str(d)).collect()}
    # min-hash over shared 8-gram shingles is very likely equal for 0/1
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_gopher_flags_recomputed_locally(spark, sf_small):
    """Recompute every rule in pure Python on the tokenizer output —
    the flags and the conjunction must agree exactly, and each rule
    must split the corpus (non-vacuous thresholds)."""
    import re

    from parquet_extractor_spark.functions.text import tokenize
    from parquet_extractor_spark.operators.quality import (
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_MEAN_LEN,
        GOPHER_MIN_STOP_HITS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
        gopher_quality_flags,
    )
    from parquet_extractor_spark.sources.tables import load_table

    rows = {r.doc_id: r for r in gopher_quality_flags(spark, sf_small).collect()}
    toks = {
        r.doc_id: list(r.ts)
        for r in load_table(spark, sf_small, "documents")
        .select("doc_id", tokenize("text").alias("ts"))
        .collect()
    }
    assert set(rows) == set(toks)
    for doc_id, ts in toks.items():
        r = rows[doc_id]
        assert r.n_words == len(ts)
        mean_len = sum(len(t) for t in ts) / len(ts)
        # Spark/DuckDB round HALF_UP; Python round() is banker's
        import math

        half_up = math.floor(mean_len * 1e4 + 0.5) / 1e4
        assert abs(r.mean_word_len - half_up) < 1e-9
        assert r.words_ok == (len(ts) >= GOPHER_MIN_WORDS)
        assert r.mean_len_ok == (GOPHER_MIN_MEAN_LEN <= mean_len <= 10.0)
        alpha = sum(1 for t in ts if re.search("[a-z]", t)) / len(ts)
        assert r.alpha_ok == (alpha >= GOPHER_MIN_ALPHA_FRAC)
        stop = sum(1 for t in ts if t in GOPHER_STOPWORDS)
        assert r.stopword_hits == stop
        assert r.stop_ok == (stop >= GOPHER_MIN_STOP_HITS)
        assert r.gopher_keep == (
            r.words_ok and r.mean_len_ok and r.alpha_ok and r.stop_ok
        )
    keeps = [r.gopher_keep for r in rows.values()]
    assert any(keeps) and not all(keeps)
    # word-count rule specifically must split (fixture docs 10-99 toks)
    wc = [r.words_ok for r in rows.values()]
    assert any(wc) and not all(wc)


def test_gopher_flags_plan_is_map_side(spark, sf_small):
    from parquet_extractor_spark.operators.quality import gopher_quality_flags
    from parquet_extractor_spark.plans.explain import read_schema_columns

    df = gopher_quality_flags(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "HashAggregate" not in plan
    assert read_schema_columns(df)[0] == {"doc_id", "text"}


def test_winnowing_recomputed_locally_and_guarantee(spark, sf_small):
    """Recompute winnowing in pure Python (k-gram md5 hashes, window
    minima, distinct, mod-sum) and pin the coverage guarantee: the
    selected set is ~2/(w+1) of the grams, never empty, and every
    selected hash is a real gram hash of the doc."""
    import hashlib

    from parquet_extractor_spark.operators.quality import (
        FINGERPRINT_NGRAM,
        WINNOW_WINDOW,
        winnowing_fingerprints,
    )
    from parquet_extractor_spark.sources.tables import load_table

    def phash(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_small, "documents").collect()
    }
    rows = winnowing_fingerprints(spark, sf_small).collect()
    assert len(rows) == len(texts)
    for r in rows[:50]:
        t = texts[r.doc_id]
        k = FINGERPRINT_NGRAM
        grams = [t[i:i + k] for i in range(max(len(t) - k + 1, 1))]
        hs = [phash(g) for g in grams]
        w = WINNOW_WINDOW
        mins = [min(hs[i:i + w]) for i in range(max(len(hs) - w + 1, 1))]
        sel = list(dict.fromkeys(mins))
        assert r.n_grams == len(hs)
        assert r.n_selected == len(sel)
        assert r.fingerprint_checksum == sum(h % 1_000_000_007 for h in sel)
        assert 0 < r.n_selected <= r.n_grams


def test_source_quality_summary_consistent_with_flags(spark, sf_small):
    """The roll-up must agree exactly with the per-doc gopher flags."""
    from collections import Counter

    from parquet_extractor_spark.operators.quality import (
        gopher_quality_flags,
        source_quality_summary,
    )
    from parquet_extractor_spark.sources.tables import load_table

    src_of = {
        r.doc_id: r.source
        for r in load_table(spark, sf_small, "documents").collect()
    }
    keep_by_src, docs_by_src = Counter(), Counter()
    for r in gopher_quality_flags(spark, sf_small).collect():
        docs_by_src[src_of[r.doc_id]] += 1
        if r.gopher_keep:
            keep_by_src[src_of[r.doc_id]] += 1

    rows = source_quality_summary(spark, sf_small).collect()
    assert {r.source for r in rows} == set(docs_by_src)
    for r in rows:
        assert r.n_docs == docs_by_src[r.source]
        assert r.n_keep == keep_by_src[r.source]
        assert 0.0 <= r.keep_rate <= 1.0
        assert r.avg_tokens > 0


def test_quality_classifier_scores_properties(spark, sf_small):
    """Classifier stage invariants: one row per doc, the logit is the
    exact integer formula (recomputed in Python for a sample), the
    keep flag splits the corpus non-degenerately, and the plan is
    map-side (no aggregation, no keyed shuffle — the module
    contract)."""
    import hashlib

    from parquet_extractor_spark.operators.quality import (
        CLS_BIAS_MICRO,
        CLS_BUCKETS,
        _cls_weights_micro,
        quality_classifier_scores,
    )
    from parquet_extractor_spark.sources.tables import load_table

    rows = quality_classifier_scores(spark, sf_small).collect()
    n_docs = load_table(spark, sf_small, "documents").count()
    assert len(rows) == n_docs
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept < n_docs  # pseudo-weights must not be degenerate

    w = _cls_weights_micro()
    texts = dict(
        load_table(spark, sf_small, "documents")
        .select("doc_id", "text")
        .rdd.map(lambda r: (r.doc_id, r.text))
        .collect()
    )
    import math
    import re

    for r in rows[:25]:
        # re.ASCII: Java/RE2 \w is ASCII-only; Python's is Unicode
        toks = [
            t
            for t in re.sub(
                r"[^\w\s]", " ", texts[r.doc_id].lower(), flags=re.ASCII
            ).split()
            if t
        ]
        assert r.n_tokens == len(toks)
        s = sum(
            w[int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % CLS_BUCKETS]
            for t in toks
        )
        want = math.floor(
            CLS_BIAS_MICRO + (s / len(toks) if toks else 0.0)
        )
        assert r.logit_micro == want, r.doc_id
        assert r.keep == (want > 0)

    plan = (
        quality_classifier_scores(spark, sf_small)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" not in plan
    assert "hashpartitioning" not in plan


def test_k_anonymity_audit_consistency(spark, sf_small):
    from parquet_extractor_spark.operators.quality import (
        K_ANONYMITY,
        k_anonymity_audit,
    )

    row = k_anonymity_audit(spark, sf_small).collect()[0]
    assert row.k == K_ANONYMITY
    assert row.n_rows == 150  # sf0.001 customer cardinality
    assert 0 < row.n_classes <= 125  # 25 nations × 5 segments
    assert 0 <= row.risky_classes <= row.n_classes
    assert row.risky_rows <= row.n_rows
    # with 150 rows over ~125 classes nearly everything is risky
    assert row.min_class_size < K_ANONYMITY and row.risky_classes > 0
    assert abs(row.suppression_rate - row.risky_rows / row.n_rows) < 1e-6
    assert 1 <= row.min_l_diversity


def test_encoding_audit_ground_truth(spark):
    from parquet_extractor_spark.operators.quality import encoding_audit

    rows = {r.row_id: r for r in encoding_audit(spark, "unused").collect()}
    # clean rows — ascii, legit accents, emoji — never flagged
    for rid in (0, 1, 9):
        assert not rows[rid].is_suspect, rid
    # every planted corruption flagged with the right counter
    assert rows[2].n_mojibake == 3  # Ã© ×3
    assert rows[3].n_mojibake == 1  # cp1252 â€™
    assert rows[4].n_mojibake == 1  # Â£
    assert rows[5].n_replacement == 2
    assert rows[6].n_control == 3
    assert rows[7].n_control == 2  # C1 range
    assert (
        rows[8].n_mojibake == rows[8].n_replacement == rows[8].n_control == 1
    )
    assert all(rows[r].is_suspect for r in (2, 3, 4, 5, 6, 7, 8))


def test_readability_scores_buckets_and_bounds(spark, sf_small):
    from parquet_extractor_spark.operators.quality import readability_scores

    rows = readability_scores(spark, sf_small).collect()
    assert rows
    buckets = {"very_easy", "standard", "difficult", "very_difficult"}
    for r in rows:
        assert r.n_sentences >= 1 and r.n_words >= 1
        # the syllable heuristic's floor: every word has one
        assert r.n_syllables >= r.n_words
        assert r.ease_bucket in buckets
        # ease is bounded above by the formula's constant (sentences
        # and syllables only subtract)
        assert r.ease_micro <= 206_835_000
    # the fixture isn't degenerate: more than one bucket appears
    assert len({r.ease_bucket for r in rows}) > 1


def test_mixed_script_audit_hand_checked(spark):
    """Homoglyph fixture facts derived by hand: the Cyrillic-a spoof
    and the Greek-epsilon spoof are flagged; clean Latin, pure
    Cyrillic, and letterless docs are not."""
    from parquet_extractor_spark.operators.quality import (
        mixed_script_audit,
    )

    rows = {r.doc_id: r for r in mixed_script_audit(spark, "").collect()}
    assert not rows[1].homoglyph_suspect  # clean latin
    spoof = rows[2]  # "pаypаl аccount login" with three U+0430
    assert (spoof.n_cyrillic, spoof.mixed_script_tokens) == (3, 2)
    assert spoof.homoglyph_suspect
    assert not rows[3].homoglyph_suspect  # pure Cyrillic is fine
    eps = rows[4]  # "mixεd" Greek epsilon inside a Latin token
    assert eps.mixed_script_tokens == 1 and eps.homoglyph_suspect
    assert rows[6].n_tokens == 1 and not rows[6].homoglyph_suspect
    # accented Latin counts toward Latin dominance (\p{IsLatin}):
    clean = rows[7]  # "café crème naïve" — all-Latin, clean
    assert clean.n_latin == 14 and not clean.homoglyph_suspect
    acc = rows[8]  # "départеment sécurité" with one Cyrillic е
    assert (acc.n_latin, acc.n_cyrillic) == (18, 1)
    assert acc.mixed_script_tokens == 1 and acc.homoglyph_suspect


def test_quality_filter_ablation_consistent_with_flags(spark, sf_small):
    """Cross-query consistency: the ablation cube's fully-specified
    cells (gid=0) must re-aggregate gopher_quality_flags exactly, the
    all-NULL row must hold the corpus totals, and every flag's
    marginal must sum to the total."""
    from collections import Counter

    from parquet_extractor_spark.operators.quality import (
        gopher_quality_flags,
        quality_filter_ablation,
    )

    flags = gopher_quality_flags(spark, sf_small).collect()
    cube = quality_filter_ablation(spark, sf_small).collect()

    combos = Counter(
        (r.words_ok, r.mean_len_ok, r.alpha_ok, r.stop_ok) for r in flags
    )
    tokens = Counter()
    for r in flags:
        tokens[(r.words_ok, r.mean_len_ok, r.alpha_ok, r.stop_ok)] += (
            r.n_words
        )
    full = {
        (r.words_ok, r.mean_len_ok, r.alpha_ok, r.stop_ok): r
        for r in cube
        if r.gid == 0
    }
    assert set(full) == set(combos)
    for k, r in full.items():
        assert r.n_docs == combos[k] and r.n_tokens == tokens[k]

    top = [r for r in cube if r.gid == 15]
    assert len(top) == 1
    assert top[0].n_docs == len(flags)
    assert top[0].n_tokens == sum(tokens.values())
    assert top[0].token_share_micro == 1_000_000

    # one-flag marginals (gid with exactly one flag specified) sum to
    # the corpus totals
    for gid, col in [(7, "words_ok"), (11, "mean_len_ok"),
                     (13, "alpha_ok"), (14, "stop_ok")]:
        marg = [r for r in cube if r.gid == gid]
        assert sum(r.n_docs for r in marg) == len(flags)
        assert {getattr(r, col) for r in marg} <= {True, False}


def test_dp_source_release_matches_pure_python(spark, sf_small):
    """Third implementation: recompute the seeded Laplace mechanism in
    pure Python (hashlib + math.log) — both engines must match it
    exactly, and the noise must actually perturb at least one count."""
    import hashlib
    import math
    import re

    import duckdb

    from parquet_extractor_spark.operators.quality import (
        DP_EPSILON,
        DP_SALT,
        DP_TOKEN_CLAMP,
        _DP_M,
        dp_source_release,
    )

    docs = duckdb.sql(
        f"SELECT source, text FROM '{sf_small}/documents.parquet'"
    ).fetchall()
    agg = {}
    for source, text in docs:
        toks = [
            t for t in re.sub(r"[^\w\s]", " ", text.lower()).split() if t
        ]
        d = agg.setdefault(source, [0, 0])
        d[0] += 1
        d[1] += min(len(toks), DP_TOKEN_CLAMP)

    def lap(tag, source, sensitivity):
        h = int(
            hashlib.md5(
                (DP_SALT + tag + source).encode()
            ).hexdigest()[:15],
            16,
        )
        u = ((h % _DP_M) + 0.5) / float(_DP_M) - 0.5
        b = float(sensitivity) / DP_EPSILON
        return -b * math.copysign(1.0, u) * math.log(1.0 - 2 * abs(u))

    got = dp_source_release(spark, sf_small).collect()
    assert len(got) == len(agg)
    perturbed = 0
    for r in got:
        n_docs, tokens = agg[r.source]
        assert r.n_docs_true == n_docs
        assert r.clamped_tokens_true == tokens
        want_docs = max(
            0, math.floor(n_docs + lap("docs", r.source, 1) + 0.5)
        )
        want_tokens = max(
            0,
            math.floor(
                tokens + lap("tokens", r.source, DP_TOKEN_CLAMP) + 0.5
            ),
        )
        assert r.n_docs_released == want_docs, r.source
        assert r.tokens_released == want_tokens, r.source
        perturbed += int(r.n_docs_released != n_docs) + int(
            r.tokens_released != tokens
        )
    assert perturbed > 0


def test_quality_filter_ablation_zero_token_doc_parity(spark, tmp_path):
    """Regression (r09 review): a punctuation-only document tokenizes
    to 0 words, making mean_len/alpha_frac (and their flags) data-NULL
    inside fully-specified cube cells. Both engines must agree row for
    row — including the NULLS LAST order — on such a corpus."""
    import duckdb

    from parquet_extractor_spark.operators.quality import (
        QUALITY_FILTER_ABLATION_SQL,
        quality_filter_ablation,
    )

    fixture = tmp_path / "ablate_sf"
    fixture.mkdir()
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT * FROM (VALUES
                (0, '!!! ... ???', 'en', 'src0', 11),
                (1, 'the data and the table have rows with the be to of
                     and that have with more words here to pass the
                     stopword and length gates for this document row ' ||
                     repeat('word ', 40), 'en', 'src0', 300),
                (2, 'short text', 'en', 'src1', 10)
            ) t(doc_id, text, lang, source, n_chars)
        ) TO '{fixture}/documents.parquet' (FORMAT PARQUET)
        """
    )
    got = [
        tuple(r)
        for r in quality_filter_ablation(spark, str(fixture)).collect()
    ]
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{fixture}/documents.parquet'"
    )
    want = [tuple(w) for w in con.execute(
        QUALITY_FILTER_ABLATION_SQL
    ).fetchall()]
    assert got == want
    # the zero-token doc really produced data-NULL flags in gid=0 cells
    gid0 = [r for r in got if r[0] == 0]
    assert any(r[2] is None for r in gid0), "expected a NULL mean_len_ok"
