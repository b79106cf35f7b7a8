"""Sliding-window chunking + corpus mixture sampling contracts."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sparklyclean_spark.catalog import load_table
from sparklyclean_spark.operators.chunking import sliding_chunks
from sparklyclean_spark.operators.mixing import mixture_sample
from tests.conftest import SF_DIR

CHUNK, OVERLAP = 400, 80
STEP = CHUNK - OVERLAP


def test_chunks_reassemble_to_original(spark):
    """Dropping each chunk's overlap tail and concatenating in
    chunk_idx order must reproduce the document exactly; chunk ids are
    dense from 0 and counts follow the grid formula."""
    docs = load_table(spark, SF_DIR, "documents")
    out = sliding_chunks(docs, CHUNK, OVERLAP)
    rows = out.orderBy("doc_id", "chunk_idx").collect()
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, chunks in by_doc.items():
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        text = texts[doc_id]
        expect_n = max(1, math.ceil((len(text) - OVERLAP) / STEP))
        assert len(chunks) == expect_n, (doc_id, len(text))
        rebuilt = "".join(c["chunk_text"][:STEP] for c in chunks[:-1]) + chunks[-1]["chunk_text"]
        assert rebuilt == text, doc_id
        for c in chunks:
            assert c["n_chunk_chars"] == len(c["chunk_text"]) <= CHUNK


def test_chunks_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "x" * STEP), (3, "y" * (CHUNK + 1))], "doc_id long, text string"
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"]
        for r in sliding_chunks(df, CHUNK, OVERLAP).collect()
    }
    assert out[(1, 0)] == ""  # empty doc still yields one chunk
    assert out[(2, 0)] == "x" * STEP and (2, 1) not in out
    # one char past the chunk: second window holds the overlap + 1
    assert out[(3, 0)] == "y" * CHUNK and out[(3, 1)] == "y" * (OVERLAP + 1)


def test_chunks_unicode_and_boundary_lengths(spark):
    """Chunking is CHARACTER-addressed (Spark substr == DuckDB substr
    == Python slicing on chars, not bytes): multi-byte text must
    reassemble exactly, and lengths sitting exactly on the grid
    boundaries must not off-by-one."""
    cases = {
        1: "汉字" * 300,               # 600 CJK chars (multi-byte UTF-8)
        2: "🚀a" * 250,               # astral-plane + ascii mix, 500 chars
        3: "x" * CHUNK,               # exactly one chunk
        4: "x" * (CHUNK + 1),         # one char past -> 2 chunks
        5: "x" * OVERLAP,             # fits entirely inside the overlap
        6: "é" * (2 * STEP),          # combining-free accented latin
    }
    df = spark.createDataFrame(list(cases.items()), "doc_id long, text string")
    rows = sliding_chunks(df, CHUNK, OVERLAP).orderBy("doc_id", "chunk_idx").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in cases.items():
        chunks = by_doc[doc_id]
        expect_n = max(1, math.ceil((len(text) - OVERLAP) / STEP))
        assert len(chunks) == expect_n, (doc_id, len(text), len(chunks))
        rebuilt = "".join(c["chunk_text"][:STEP] for c in chunks[:-1]) + chunks[-1]["chunk_text"]
        assert rebuilt == text, doc_id
        assert all(c["n_chunk_chars"] == len(c["chunk_text"]) for c in chunks)


def test_stratified_prefilter_equals_exact(spark):
    """The md5-prefix prefilter keeps a PREFIX of the window's sort
    order, so the bounded-pool sample must equal the exact window
    sample row-for-row — including strata smaller than n (keep-all
    sentinel path) and across slack values."""
    from sparklyclean_spark.operators.sampling import stratified_sample

    docs = load_table(spark, SF_DIR, "documents")
    # add a tiny stratum (< n rows) via a derived column
    d = docs.withColumn(
        "stratum", F.when(F.col("doc_id") % 97 == 0, F.lit("tiny")).otherwise(F.col("lang"))
    )
    exact = {
        (r["doc_id"],) for r in stratified_sample(d, ["stratum"], 10, "doc_id").collect()
    }
    for slack in (4.0, 8.0):
        fast = {
            (r["doc_id"],)
            for r in stratified_sample(
                d, ["stratum"], 10, "doc_id", prefilter_slack=slack
            ).collect()
        }
        assert fast == exact, f"slack={slack}"


def test_cluster_safe_split_no_leakage(spark):
    """No near-dup pair may straddle splits: both endpoints of every
    pair in the near-dup graph must share the cluster-derived split
    (the invariant plain per-doc hash_split violates)."""
    from sparklyclean_spark.operators.dedup.clusters import neardup_clusters
    from sparklyclean_spark.operators.dedup.textdedup import minhash_lsh_pairs
    from sparklyclean_spark.operators.sampling import hash_split

    docs = load_table(spark, SF_DIR, "documents")
    split = hash_split(neardup_clusters(docs, 0.3), "comp").select("doc_id", "split")
    pairs = minhash_lsh_pairs(docs, 0.3).select("id1", "id2")
    straddling = (
        pairs.join(split.withColumnRenamed("doc_id", "id1").withColumnRenamed("split", "s1"), "id1")
        .join(split.withColumnRenamed("doc_id", "id2").withColumnRenamed("split", "s2"), "id2")
        .where(F.col("s1") != F.col("s2"))
        .count()
    )
    assert straddling == 0


def test_mixture_hits_target_proportions(spark):
    """Output proportions match targets (the most-constrained source
    at rate 1.0), the sample is deterministic, and unlisted sources
    are dropped."""
    docs = load_table(spark, SF_DIR, "documents")
    targets = {"en": 0.40, "de": 0.20, "es": 0.20, "fr": 0.20}
    out = mixture_sample(docs, "lang", targets, "doc_id")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) <= set(targets)  # zh dropped
    total = sum(counts.values())
    for lang, p in targets.items():
        share = counts.get(lang, 0) / total
        assert abs(share - p) < 0.08, (lang, share)
    # most-constrained source is kept (near-)whole: its rate is 1.0
    src = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    constrained = min(targets, key=lambda s: src[s] / targets[s])
    assert counts[constrained] == src[constrained]
    # deterministic across runs
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {r["doc_id"] for r in mixture_sample(docs, "lang", targets, "doc_id").select("doc_id").collect()}
    assert a == b


def test_chunk_dedup_within_doc_semantics_and_plan(spark):
    """Intra-doc span dedup: first occurrence kept in order, other
    docs' identical chunks untouched (the contrast with the global
    form), and the plan has ZERO exchanges (pure projection)."""
    from sparklyclean_spark.operators.dedup.chunks import chunk_dedup_within_doc

    ten = "a b c d e f g h i j"
    df = spark.createDataFrame(
        [
            (1, f"{ten} {ten} k l"),  # repeated chunk inside one doc
            (2, ten),  # same chunk in ANOTHER doc: must stay
            (3, ""),
        ],
        "doc_id bigint, text string",
    )
    out = chunk_dedup_within_doc(df, 10)
    got = {r.doc_id: (r.n_chunks, r.n_kept, r.text_deduped) for r in out.collect()}
    assert got == {
        1: (3, 2, f"{ten} k l"),
        2: (1, 1, ten),
        3: (0, 0, ""),
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_proportional_sample_exact_n_and_hamilton_law(spark):
    """Largest-remainder allocation: output is EXACTLY total_n rows,
    every stratum's take is within 1 of its exact proportional share
    (the Hamilton quota property), and the result is deterministic."""
    from pyspark.sql import functions as F

    from sparklyclean_spark.operators.sampling import proportional_sample

    rows = [(i, "s%d" % (i % 3), "en" if i % 5 else "fr") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string")
    out = proportional_sample(df, ["source", "lang"], 37, "doc_id")
    got = out.collect()
    assert len(got) == 37
    takes = {
        (r["source"], r["lang"]): r["n"]
        for r in out.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sizes = {
        (r["source"], r["lang"]): r["n"]
        for r in df.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for k, n in takes.items():
        exact = 37 * sizes[k] / 200
        assert exact - 1 < n < exact + 1 + 1e-9, (k, n, exact)
    # deterministic: second run identical
    again = {tuple(r) for r in proportional_sample(df, ["source", "lang"], 37, "doc_id").collect()}
    assert {tuple(r) for r in got} == again
