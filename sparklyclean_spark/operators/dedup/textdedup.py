"""Document near-duplicate detection at training-data scale.

Five strategies, cheapest→strongest, per the standard LLM-corpus
cleaning stack:

* exact (hash groupBy on normalized fingerprint)
* token-set Jaccard (exact, block-free — quadratic; oracle-checkable)
* word-n-gram-shingle Jaccard (exact — oracle-checkable)
* MinHash + LSH banding (shingle → minhash sig → band buckets →
  bucket join → exact-Jaccard verify) — the scale path: candidate
  generation is linear in corpus size + bucket-collision pairs
* SimHash (64-bit, banded hamming) — the cheap fuzzy path
* embedding cosine near-dup (see similarity/knn.py for ANN)

MinHash/SimHash signatures use ``xxhash64(token, seed_i)`` — fully
deterministic, no RNG state (same principle as the dedup anchor fix,
SURVEY.md §2.9 G6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparklyclean_spark.functions import text as T
from sparklyclean_spark.functions.vectors import cosine


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group by content fingerprint; keep the smallest id as canonical.
    Returns (fp, keep_id, n_dups). Pure hash aggregation — one shuffle
    on the fingerprint, scales linearly."""
    return (
        docs.select(F.col(id_col).alias("id"), T.fingerprint_md5(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min("id").alias("keep_id"), (F.count(F.lit(1)) - 1).alias("n_dups"))
    )


def _jaccard(a, b) -> F.Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0.0, F.lit(0.0)).otherwise(inter / union)


def token_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact token-set Jaccard over all pairs (quadratic — small-corpus
    oracle / verification path, not the 100 TB path; use
    ``minhash_lsh_pairs`` there)."""
    t = docs.select(
        F.col(id_col).alias("id"), F.array_distinct(T.words(text_col)).alias("toks")
    )
    a = t.select(F.col("id").alias("id1"), F.col("toks").alias("t1"))
    b = t.select(F.col("id").alias("id2"), F.col("toks").alias("t2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("jaccard", F.round(_jaccard(F.col("t1"), F.col("t2")), 4))
        .where(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def shingle_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact word-n-gram-shingle Jaccard over all pairs (quadratic
    verification path)."""
    t = docs.select(
        F.col(id_col).alias("id"), T.word_shingles(text_col, n).alias("sh")
    )
    a = t.select(F.col("id").alias("id1"), F.col("sh").alias("s1"))
    b = t.select(F.col("id").alias("id2"), F.col("sh").alias("s2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("jaccard", F.round(_jaccard(F.col("s1"), F.col("s2")), 4))
        .where(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def minhash_signature(shingles, num_hashes: int = 32) -> F.Column:
    """array<bigint> minhash signature: sig[i] = min(xxhash64(s, i))."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Scale path: shingle → minhash → LSH band buckets → bucket join →
    exact-Jaccard verification.

    Cost is linear in corpus + colliding candidate pairs: each doc
    emits ``bands`` bucket keys; the equi-join on (band, bucket-hash)
    is an ordinary shuffled hash join that AQE can skew-split. With
    32 hashes / 8 bands (r=4), collision prob at j=0.3 is
    1-(1-0.3^4)^8 ≈ 6% per band set — tune bands/hashes per corpus.
    Returned pairs are verified exact, so precision is 1.0 vs the
    quadratic path; only recall depends on the banding.
    """
    rows_per_band = num_hashes // bands
    t = docs.select(
        F.col(id_col).alias("id"),
        T.word_shingles(text_col, n).alias("sh"),
    ).where(F.size("sh") > 0)
    sig = t.withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
    banded = sig.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select("band", "bucket", F.col("id").alias("id1"), F.col("sh").alias("s1"))
    b = banded.select("band", "bucket", F.col("id").alias("id2"), F.col("sh").alias("s2"))
    cands = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "s1", "s2")
        .dropDuplicates(["id1", "id2"])
    )
    return (
        cands.withColumn("jaccard", F.round(_jaccard(F.col("s1"), F.col("s2")), 4))
        .where(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def simhash64_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sh64): 64-bit SimHash per document.

    Explode distinct tokens, then ONE hash aggregation computing all
    64 bit-votes as sum columns (map-side partial agg → tiny shuffle
    on doc id), then pack sign bits into a bigint. Entirely JVM-side;
    this is the scan-shaped plan you want at 100 TB.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(T.words(text_col))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    packed = F.lit(0).cast("bigint")
    for b in range(64):
        packed = packed.bitwiseOR(
            F.shiftleft((F.col(f"b{b}") > 0).cast("bigint"), b)
        )
    return votes.select("id", packed.alias("sh64"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dups: candidates share at least one of 4 16-bit
    bands (guarantees recall for hamming ≤ 3), verified by exact
    hamming distance ≤ max_hamming via bit_count(xor)."""
    t = simhash64_table(docs, id_col, text_col)
    banded = t.select(
        "id",
        "sh64",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sh64"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh64", "bb.band", "bb.bucket")
    a = banded.select("band", "bucket", F.col("id").alias("id1"), F.col("sh64").alias("h1"))
    b = banded.select("band", "bucket", F.col("id").alias("id2"), F.col("sh64").alias("h2"))
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("id1") < F.col("id2"))
        .dropDuplicates(["id1", "id2"])
        .withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id1", "id2", F.col("hamming").cast("int").alias("hamming"))
    )


def embedding_cosine_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup: all pairs with cosine ≥ threshold (exact,
    quadratic — the ANN path in similarity/knn.py is the scale route)."""
    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a = e.select(F.col("id").alias("id1"), F.col("v").alias("v1"))
    b = e.select(F.col("id").alias("id2"), F.col("v").alias("v2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("cos", cosine(F.col("v1"), F.col("v2")))
        .where(F.col("cos") >= threshold)
        .select("id1", "id2", F.round("cos", 4).alias("cos"))
    )
