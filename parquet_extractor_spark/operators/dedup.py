"""Deduplication operators for training-data pipelines.

Four tiers, all pure DataFrame expressions (no Python in the hot
path), each designed around its 100 TB shuffle profile:

- **Exact** — hash-groupBy on a content digest. One shuffle keyed on
  the digest; survivors picked with min(doc_id). Digest (md5) is
  computed map-side so the shuffle carries 32-byte keys, not documents.
- **N-gram Jaccard** — shingle → explode distinct shingles →
  self-join on shingle → jaccard from shared counts. The classic
  similarity-join; at 100 TB the shingle explode is the cost driver,
  which is why the MinHash tier exists (bounded signature size).
- **MinHash + LSH** — fixed-size signatures (NUM_HASHES portable
  hashes), banded into NUM_BANDS buckets; only docs sharing a band
  bucket become candidate pairs. Shuffle volume is O(docs × bands),
  independent of document length.
- **SimHash** — one 32-bit fingerprint per doc from token hashes;
  near-dups differ in few bits. Fingerprinting is a single map-side
  expression — no shuffle at all until the pair search.

Hashes use functions.text.portable_hash64 (md5-derived) so every tier
is reproducible in DuckDB for the oracle check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_extractor_spark.functions.text import (
    char_ngrams,
    portable_hash64,
    tokenize,
    word_ngrams,
)
from parquet_extractor_spark.sources.tables import load_table

# MinHash geometry: 16 hashes in 4 bands of 4 rows — catches
# jaccard ≳ 0.5 pairs with high probability at toy scale; at
# production scale you'd raise NUM_HASHES to 128+.
NUM_HASHES = 16
NUM_BANDS = 4
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS

JACCARD_THRESHOLD = 0.1
NGRAM_N = 3


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: md5(text) → keep min doc_id. Returns
    one row per distinct text with the surviving id and copy count."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5("text").alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .orderBy("keep_doc_id")
    )


EXACT_DEDUP_SQL = r"""
SELECT md5(text) AS text_md5,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY md5(text)
ORDER BY keep_doc_id
"""


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + exploded DISTINCT word-3-gram shingles."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_ngrams(tokenize("text"), NGRAM_N))
        ).alias("shingle"),
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by word-3-gram Jaccard similarity.

    Plan shape: explode distinct shingles → self-equi-join on shingle
    (Catalyst: shuffle-hash on the shingle key; hot shingles are the
    skew risk — at scale, drop shingles with document-frequency above
    a cap before joining, which is also a quality win) → count shared
    shingles per pair → jaccard from |A|,|B|,|A∩B|.
    """
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))

    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        shared.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_shared")
                / (F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
    )


NGRAM_JACCARD_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(
               regexp_replace(lower(text), '[^\w\s]', ' ', 'g'), '\s+'),
               x -> x != '') AS tokens
    FROM documents
),
shingled AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, greatest(len(tokens) - {NGRAM_N - 1}, 1) + 1),
               i -> array_to_string(tokens[i:i+{NGRAM_N - 1}], ' '))) AS shingles
    FROM toks
),
exploded AS (
    SELECT doc_id, unnest(shingles) AS shingle FROM shingled
),
sizes AS (
    SELECT doc_id, count(*) AS n_shingles FROM exploded GROUP BY doc_id
),
shared AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
    FROM exploded a JOIN exploded b ON a.shingle = b.shingle
    WHERE a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(n_shared / (sa.n_shingles + sb.n_shingles - n_shared), 6) AS jaccard
FROM shared
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_shared / (sa.n_shingles + sb.n_shingles - n_shared) >= {JACCARD_THRESHOLD}
ORDER BY jaccard DESC, doc_a ASC, doc_b ASC
"""


def _hash_with_suffix(suffix: str):
    """Factory returning a 1-arg lambda for F.transform (Spark counts
    the callable's parameters to decide lambda arity — a 2-arg lambda
    would be passed (element, index))."""
    return lambda s: portable_hash64(F.concat(s, F.lit(suffix)))


def _minhash_sig_cols(shingles_col):
    """NUM_HASHES portable min-hashes of a shingle array, as columns.

    hash_i(s) = portable_hash64(concat(s, '#', i)); signature element
    i = min over shingles. Pure expressions → codegen, map-side only.
    """
    sigs = []
    for i in range(NUM_HASHES):
        hashed = F.transform(shingles_col, _hash_with_suffix(f"#{i}"))
        sigs.append(F.array_min(hashed).alias(f"mh{i}"))
    return sigs


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signature columns mh0..mh{NUM_HASHES-1}."""
    docs = load_table(spark, sf_dir, "documents")
    shingles = F.array_distinct(word_ngrams(tokenize("text"), NGRAM_N))
    return docs.select("doc_id", *_minhash_sig_cols(shingles)).orderBy("doc_id")


def _minhash_sql_exprs() -> str:
    exprs = []
    for i in range(NUM_HASHES):
        exprs.append(
            f"list_min(list_transform(shingles, s -> "
            f"CAST(('0x' || substr(md5(s || '#{i}'), 1, 15)) AS BIGINT))) AS mh{i}"
        )
    return ",\n       ".join(exprs)


MINHASH_SIGNATURES_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(
               regexp_replace(lower(text), '[^\w\s]', ' ', 'g'), '\s+'),
               x -> x != '') AS tokens
    FROM documents
),
shingled AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, greatest(len(tokens) - {NGRAM_N - 1}, 1) + 1),
               i -> array_to_string(tokens[i:i+{NGRAM_N - 1}], ' '))) AS shingles
    FROM toks
)
SELECT doc_id,
       {_minhash_sql_exprs()}
FROM shingled
ORDER BY doc_id
"""


def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding over the MinHash signatures: docs agreeing on ALL
    rows of any band become candidate pairs. The join key is the band
    digest — shuffle volume O(docs × NUM_BANDS), never O(pairs)."""
    sig = minhash_signatures(spark, sf_dir)
    bands = []
    for b in range(NUM_BANDS):
        cols = [
            F.col(f"mh{b * ROWS_PER_BAND + r}").cast("string")
            for r in range(ROWS_PER_BAND)
        ]
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("bucket"),
            )
        )
    buckets = sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def _minhash_lsh_oracle() -> str:
    """DuckDB oracle for minhash_lsh_candidates, with the banding
    unrolled as a UNION ALL (portable, no lateral tricks)."""
    sig_cte = MINHASH_SIGNATURES_SQL.replace("ORDER BY doc_id", "").strip()
    band_selects = []
    for b in range(NUM_BANDS):
        cols = " || '|' || ".join(
            f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)"
            for r in range(ROWS_PER_BAND)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({cols}) AS bucket FROM sig"
        )
    bands_union = "\nUNION ALL\n".join(band_selects)
    return f"""
WITH sig AS ({sig_cte}),
buckets AS (
{bands_union}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM buckets a JOIN buckets b
  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


MINHASH_LSH_SQL = _minhash_lsh_oracle()

SIMHASH_BITS = 32


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document SimHash: sign-sum of token-hash bits. One pure
    map-side expression per document — zero shuffle; near-dup pairs
    differ in ≤ k bits (checked via xor+popcount downstream)."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.array_distinct(tokenize("text"))
    hashes = F.transform(tokens, portable_hash64)
    def _bit_vote(bit: int):
        # factory: F.aggregate's merge lambda must be exactly 2-arg
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_terms = []
    for b in range(SIMHASH_BITS):
        vote = F.aggregate(hashes, F.lit(0), _bit_vote(b))
        bit_terms.append(
            F.when(vote > 0, F.lit(2 ** b)).otherwise(F.lit(0)).cast("bigint")
        )
    simhash = sum(bit_terms[1:], bit_terms[0])
    return docs.select("doc_id", simhash.alias("simhash")).orderBy("doc_id")


def _simhash_oracle() -> str:
    bit_exprs = []
    for b in range(SIMHASH_BITS):
        bit_exprs.append(
            f"CASE WHEN list_sum(list_transform(hashes, h -> "
            f"CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 "
            f"THEN CAST({2 ** b} AS BIGINT) ELSE 0 END"
        )
    total = " + ".join(bit_exprs)
    return rf"""
WITH toks AS (
    SELECT doc_id,
           list_distinct(list_filter(regexp_split_to_array(
               regexp_replace(lower(text), '[^\w\s]', ' ', 'g'), '\s+'),
               x -> x != '')) AS tokens
    FROM documents
),
hashed AS (
    SELECT doc_id,
           list_transform(tokens, t ->
               CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) AS hashes
    FROM toks
)
SELECT doc_id, {total} AS simhash
FROM hashed
ORDER BY doc_id
"""


SIMHASH_SQL = _simhash_oracle()
