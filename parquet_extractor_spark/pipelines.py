"""End-to-end corpus curation: the composed training-data pipeline.

One lazy DataFrame chain from raw documents to a partitioned training
set: quality gate → exact dedup → near-dup dedup (LSH components) →
chunking → partitioned parquet. Each stage is an operator that is
individually oracle-checked; this module only composes them, so the
whole pipeline stays a single Catalyst plan per action with no
driver-side data movement (the one exception: the components loop,
which is iterative by nature and documented in operators/dedup.py).

Stage order matters at scale and is deliberate:
1. quality filter FIRST — it is a map-side predicate, so every
   discarded document is dropped before any shuffle pays for it;
2. exact dedup before near-dup — md5 groupBy is cheap and typically
   removes the bulk of duplicates, shrinking the LSH input;
3. near-dup components AFTER exact — pair generation cost scales with
   surviving docs;
4. chunking LAST — it multiplies row count, so it must run after all
   the filters, never before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_extractor_spark.operators.quality import quality_scores
from parquet_extractor_spark.operators.textprep import doc_chunks
from parquet_extractor_spark.sinks.dataset import write_dataset
from parquet_extractor_spark.sources.tables import load_table

MIN_QUALITY = 0.3


def curate(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    min_quality: float = MIN_QUALITY,
    semantic: bool = False,
    classifier: bool = False,
) -> DataFrame:
    """Run the full curation chain; returns the chunk-level training
    set (doc_id, lang, chunk_id, n_chunk_tokens, chunk_text). When
    ``out_dir`` is given, also writes it partitioned by lang.
    ``semantic=True`` appends the SemDeDup stage (embedding-space
    exemplar selection, joined on the embeddings.vec_id ==
    documents.doc_id relationship) after the lexical dedup tiers —
    the order the tiers run in production: lexical first (cheap,
    removes the bulk), semantic last (per-cell pair cost over the
    survivors' embedding space). ``classifier=True`` inserts the
    model-based filter (quality_classifier_scores keep flag) alongside
    the heuristic gate — the FineWeb-Edu ordering, where the cheap
    rule gate feeds the classifier stage.
    """
    docs = load_table(spark, sf_dir, "documents")

    # 1. quality gate (map-side predicate semantics: quality_scores is
    #    a pure column-expression pipeline over doc_id)
    quality = quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    keep_quality = quality.filter(
        F.col("quality_score") >= min_quality
    ).select("doc_id")

    # 1b. optional model-based gate (map-side like the heuristic one)
    if classifier:
        from parquet_extractor_spark.operators.quality import (
            quality_classifier_scores,
        )

        keep_cls = (
            quality_classifier_scores(spark, sf_dir)
            .filter(F.col("keep"))
            .select("doc_id")
        )
        keep_quality = keep_quality.join(keep_cls, "doc_id", "left_semi")

    # 2. exact dedup survivors (min doc_id per distinct text) — via
    #    the materialized tier store, shared with the report queries
    from parquet_extractor_spark.operators.dedup import (
        _components_tier,
        _exact_keep_tier,
    )

    exact_survivors = _exact_keep_tier(spark, sf_dir)

    # 3. near-dup components: keep only each component's canonical doc
    comp = _components_tier(spark, sf_dir)
    near_survivors = comp.filter(F.col("doc_id") == F.col("component")).select(
        "doc_id"
    )

    survivors = (
        keep_quality.join(exact_survivors, "doc_id", "left_semi")
        .join(near_survivors, "doc_id", "left_semi")
    )

    # 3b. optional semantic stage: SemDeDup over the SURVIVORS'
    #     embeddings (not the full table — an exemplar that already
    #     failed an earlier gate must not drag its group down with
    #     it). Docs without an embedding row pass through — SemDeDup
    #     only rules on what it can see.
    if semantic:
        from parquet_extractor_spark.operators.similarity import (
            semdedup_verdicts,
        )

        surv_emb = (
            load_table(spark, sf_dir, "embeddings")
            .select(F.col("vec_id"), "embedding")
            .join(
                survivors.select(F.col("doc_id").alias("vec_id")),
                "vec_id",
                "left_semi",
            )
        )
        sem_dropped = (
            semdedup_verdicts(spark, surv_emb)
            .filter(~F.col("keep"))
            .select(F.col("vec_id").alias("doc_id"))
        )
        survivors = survivors.join(sem_dropped, "doc_id", "left_anti")

    # 4. chunk the surviving documents; carry lang for partitioning
    chunks = doc_chunks(spark, sf_dir).join(
        survivors, "doc_id", "left_semi"
    )
    result = chunks.join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select("doc_id", "lang", "chunk_id", "n_chunk_tokens", "chunk_text")

    if out_dir:
        write_dataset(
            result,
            out_dir,
            partition_by=["lang"],
            sort_by=["doc_id", "chunk_id"],
            output_tasks=4,
        )
    return result


def curate_to_training_set(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    min_quality: float = MIN_QUALITY,
    semantic: bool = False,
    classifier: bool = False,
) -> DataFrame:
    """The curation chain extended to a TRAINING-READY set: curate →
    deterministic train/val/test assignment → packed-sequence ids,
    written partitioned by (split, lang).

    The split is assigned per DOCUMENT (portable hash, operators/
    training.py semantics), so all of a doc's chunks land in one
    split — chunk-level splitting leaks near-identical text across
    the eval boundary. Packing runs within (split, lang) streams in
    chunk order; at 100 TB each stream packs independently, so no
    global order exists anywhere in the plan.
    """
    from parquet_extractor_spark.functions.text import portable_hash64
    from parquet_extractor_spark.operators.training import (
        SEQ_BUDGET,
        SPLIT_SALT,
        TRAIN_PCT,
        VAL_PCT,
    )
    from pyspark.sql.window import Window

    chunks = curate(
        spark, sf_dir, out_dir=None, min_quality=min_quality,
        semantic=semantic, classifier=classifier,
    )

    pct = portable_hash64(
        F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))
    ) % 100
    split = (
        F.when(pct < TRAIN_PCT, "train")
        .when(pct < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    assigned = chunks.withColumn("split", split)

    w = Window.partitionBy("split", "lang").orderBy("doc_id", "chunk_id")
    packed = assigned.withColumn(
        "seq_id",
        (
            F.coalesce(
                F.sum("n_chunk_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("bigint"),
            )
            / SEQ_BUDGET
        ).cast("bigint"),
    )
    result = packed.select(
        "split", "lang", "seq_id", "doc_id", "chunk_id",
        "n_chunk_tokens", "chunk_text",
    )
    if out_dir:
        write_dataset(
            result,
            out_dir,
            partition_by=["split", "lang"],
            sort_by=["seq_id", "doc_id", "chunk_id"],
            output_tasks=4,
        )
    return result


def incremental_dedup(
    new_docs: DataFrame,
    seen_digests: DataFrame,
) -> DataFrame:
    """Incremental curation: drop new documents whose content digest
    already exists in the corpus (append-batch vs accumulated state).

    ``seen_digests`` is a single-column (text_md5) table — in
    production the running output of exact_dedup, stored bucketed on
    text_md5 so this anti-join is shuffle-free on the corpus side
    (see sinks.dataset.write_bucketed). Within the new batch itself,
    first-copy-wins via min(doc_id), same as exact_dedup.
    """
    digested = new_docs.withColumn("text_md5", F.md5("text"))
    w_first = (
        digested.groupBy("text_md5")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(digested, ["text_md5", "doc_id"])
    )
    return w_first.join(seen_digests, "text_md5", "left_anti").drop(
        "text_md5"
    )


def datacard(spark: SparkSession, sf_dir: str) -> dict:
    """Corpus datasheet (Gebru et al. 2021 "Datasheets for Datasets",
    mechanized): one JSON-able report assembling the bounded
    aggregates an LLM-data release ships alongside the shards —
    volume, language/source mix, quality pass rates, dedup reduction,
    length profile, and per-source drift screens.

    Every section is an existing registry query; each returns a
    GROUP-cardinality result (languages, sources, one-row stats), so
    the driver only ever collects constant-size tables no matter the
    corpus size. The heavy lifting stays in the same audited plans
    the driver hash-checks.
    """
    from parquet_extractor_spark.operators.analyze import (
        corpus_stats,
        doc_length_quantiles,
        source_length_ks,
        source_token_kl,
        tokens_per_lang,
    )
    from parquet_extractor_spark.operators.dedup import (
        dedup_reduction_report,
    )
    from parquet_extractor_spark.operators.quality import (
        source_quality_summary,
    )

    stats = corpus_stats(spark, sf_dir).first().asDict()
    langs = [
        r.asDict() for r in tokens_per_lang(spark, sf_dir).collect()
    ]
    lengths = [
        r.asDict() for r in doc_length_quantiles(spark, sf_dir).collect()
    ]
    quality = [
        r.asDict() for r in source_quality_summary(spark, sf_dir).collect()
    ]
    reduction = [
        r.asDict() for r in dedup_reduction_report(spark, sf_dir).collect()
    ]
    from parquet_extractor_spark.operators.contamination import (
        bloom_decontamination,
    )
    from parquet_extractor_spark.operators.training import (
        length_bucketing_efficiency,
        temperature_mixing_weights,
    )

    mixing = [
        r.asDict()
        for r in temperature_mixing_weights(spark, sf_dir).collect()
    ]
    buckets = [
        r.asDict()
        for r in length_bucketing_efficiency(spark, sf_dir).collect()
    ]
    # contamination rate: one more bounded aggregate over the
    # zero-join Bloom screen (flag counts, not per-doc rows)
    decon = (
        bloom_decontamination(spark, sf_dir)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("flagged").cast("int")).alias("n_flagged"),
        )
        .first()
    )
    kl = {r.source: r.kl_divergence for r in source_token_kl(spark, sf_dir).collect()}
    ks = {r.source: r.ks_stat for r in source_length_ks(spark, sf_dir).collect()}
    drift = [
        {
            "source": s,
            "token_kl": kl[s],
            "length_ks": ks.get(s),
        }
        for s in sorted(kl)
    ]
    return {
        "sf_dir": sf_dir,
        "corpus": stats,
        "languages": langs,
        "length_quantiles": lengths,
        "quality_by_source": quality,
        "dedup_reduction": reduction,
        "drift_by_source": drift,
        "mixing_weights": mixing,
        "length_buckets": buckets,
        "benchmark_contamination": {
            "screen": "bloom(ngram)",
            "n_docs": int(decon.n_docs),
            "n_flagged": int(decon.n_flagged or 0),
        },
    }
