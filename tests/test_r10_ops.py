"""Round-10 operator tests: advisor-fix regressions plus the new
residual-encoding IVF-PQ, BPE merge loop, PQ-prefiltered SemDeDup
funnel, and the lg_k=12 HLL bound."""
import pytest


def test_pq_empty_sample_raises():
    """r10 advisor regression: an empty training sample must raise a
    clear ValueError, not an opaque numpy IndexError."""
    from sparklyclean_spark.operators.similarity.pq import codebooks_from_vectors

    with pytest.raises(ValueError, match="empty training sample"):
        codebooks_from_vectors([])


def test_residual_ivf_pq_recall_beats_raw(spark):
    """VERDICT r9 item 3's done-gate: residual-encoding IVF-PQ (cell-
    MEAN origins, Jégou §V) must reach mean recall@5 >= the raw-vector
    composition on a statistically meaningful query set (100 queries —
    at 10 the delta is inside the ±1/50 hit granularity)."""
    from tests.conftest import SF_DIR

    import __spark_entry__ as entry
    from sparklyclean_spark.operators.similarity.pq import (
        ivf_pq_residual_topk,
        ivf_pq_topk,
    )

    means = {}
    for name, fn in (("raw", ivf_pq_topk), ("residual", ivf_pq_residual_topk)):
        rows = entry._recall_vs_exact(
            spark, SF_DIR,
            lambda emb, q: fn(emb, q, k=5, n_cells=32, nprobe=8),
            nq=100,
        ).collect()
        means[name] = sum(r.recall_at_5 for r in rows) / len(rows)
    assert means["residual"] >= means["raw"], means


def test_residual_ivf_pq_duplicate_wins_and_is_deterministic(spark):
    """An exact duplicate of the query lands in the query's own cell,
    shares its residual, and therefore its codes — its ADC distance is
    the per-cell table minimum and nothing can beat it (ties break by
    id). Output is invariant under repartitioning; self-pairs are
    excluded and ranks are 1..k."""
    import random

    from sparklyclean_spark.operators.similarity.pq import ivf_pq_residual_topk

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    rows.append((100, list(rows[0][1])))  # exact dup of vec 0
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = emb.where("vec_id = 0")
    out = ivf_pq_residual_topk(emb, q, k=5, n_cells=4, nprobe=4, m=4, ks=8)
    got = sorted(map(tuple, out.collect()), key=lambda t: t[3])
    assert len(got) == 5
    assert [t[3] for t in got] == [1, 2, 3, 4, 5]
    assert all(t[1] != 0 for t in got)
    assert got[0][1] == 100
    out2 = sorted(
        map(
            tuple,
            ivf_pq_residual_topk(
                emb.repartition(5), q, k=5, n_cells=4, nprobe=4, m=4, ks=8
            ).collect(),
        ),
        key=lambda t: t[3],
    )
    assert got == out2


def test_cell_means_shrink_residual_energy():
    """The point of the mean origin: on a weakly-clustered corpus the
    unit spherical centroid gives residuals with MORE energy than the
    vectors themselves, the per-cell mean strictly less."""
    import numpy as np

    from sparklyclean_spark.operators.similarity.knn import _spherical_kmeans
    from sparklyclean_spark.operators.similarity.pq import (
        cell_means_from_sample,
        residuals_from_vectors,
    )

    rng = np.random.RandomState(3)
    vecs = rng.uniform(-1, 1, size=(400, 16))
    cents = _spherical_kmeans(vecs, 8, 10, 647)
    r_unit, _ = residuals_from_vectors(vecs, cents)
    means = cell_means_from_sample(vecs, cents)
    r_mean, _ = residuals_from_vectors(vecs, cents, means)
    e_unit = (r_unit ** 2).sum(1).mean()
    e_mean = (r_mean ** 2).sum(1).mean()
    assert e_mean < 1.0 < e_unit
    assert e_mean < e_unit


def test_bpe_merge_table_sennrich_example(spark):
    """The ACL'16 worked example: vocab {low:5, lower:2, newest:6,
    widest:3} learns es, est, lo, low, ... in that order."""
    from sparklyclean_spark.operators.text_analysis import bpe_merge_table

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = [
        (r.step, r.lhs, r.rhs, r.merged, r.cnt)
        for r in bpe_merge_table(docs, n_merges=4).collect()
    ]
    assert got == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
        (4, "lo", "w", "low", 7),
    ]


def test_bpe_merge_rewrite_is_greedy_nonoverlapping(spark):
    """'aaaa' under merge (a,a) must become [aa][aa] (both pairs),
    'aaa' must become [aa][a] — the overlap cases where a naive
    rewrite diverges from the Spark accumulator and the oracle's
    delimited-string replace. Counts: step 1 counts OVERLAPPING
    adjacent pairs (aaaa -> 3), step 2 counts pairs of the REWRITTEN
    symbols."""
    from sparklyclean_spark.operators.text_analysis import bpe_merge_table

    docs = spark.createDataFrame(
        [(1, "aaaa aaa")], "doc_id bigint, text string"
    )
    got = [
        (r.step, r.lhs, r.rhs, r.merged, r.cnt)
        for r in bpe_merge_table(docs, n_merges=2).collect()
    ]
    # step 1: pairs (a,a): 3 in 'aaaa' + 2 in 'aaa' = 5
    assert got[0] == (1, "a", "a", "aa", 5)
    # after rewrite: [aa,aa] and [aa,a] -> pairs (aa,aa):1, (aa,a):1;
    # tie broken lexicographically: (aa,a) < (aa,aa)
    assert got[1] == (2, "aa", "a", "aaa", 1)


def test_bpe_merge_table_multibyte_and_oracle_parity(spark, duck):
    """Code-point splitting (zh + accents + BMP symbols) must agree
    with the DuckDB twin bit-for-bit — the cross-engine gate for the
    delimited-string rewrite."""
    import pandas as pd

    from __spark_entry__ import _bpe_merge_table_sql
    from sparklyclean_spark.operators.text_analysis import bpe_merge_table

    rows = [
        (1, "héllo héllo héllo wörld wörld"),
        (2, "你好 你好 你好世界 café café"),
        (3, "aaaa aaa ✓✓ ✓✓"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (r.step, r.lhs, r.rhs, r.merged, r.cnt)
        for r in bpe_merge_table(docs, n_merges=6).collect()
    )
    duck.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(map(tuple, duck.sql(_bpe_merge_table_sql(6)).fetchall()))
    duck.unregister("documents")
    assert got == want


def test_semdedup_pq_funnel_parity_and_pruning(spark):
    """The PQ-prefiltered funnel must return EXACTLY
    semdedup_dispositions' table (the triangle-inequality bound admits
    every true duplicate), on both a clustered corpus with planted
    near-dups (where the prefilter genuinely prunes) and the sf
    fixture corpus at the driver threshold."""
    import random

    from tests.conftest import SF_DIR

    import __spark_entry__ as entry
    from sparklyclean_spark.operators.similarity.semdedup import (
        semdedup_dispositions,
        semdedup_dispositions_pq,
    )

    rng = random.Random(23)
    rows = []
    # 5 tight clusters of 20 + planted near-dup pairs
    for c in range(5):
        base = [rng.uniform(-1, 1) for _ in range(16)]
        for i in range(20):
            rows.append(
                (c * 100 + i,
                 [b + rng.uniform(-0.05, 0.05) for b in base])
            )
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    for thr, m in ((0.92, 4), (0.99, 4), (0.99, 8)):
        # m=8 pins the r11 advisor fix: the snap deficit 2*sqrt(m*5e-10)
        # ≈ 1.26e-4 EXCEEDS the old literal 1e-4 slack, which could
        # silently prune true duplicates; the slack is now derived
        # from m so exact parity must hold for every m
        base = sorted(map(tuple, semdedup_dispositions(
            emb, thr, n_cells=8, sample_cap=4096).collect()))
        funnel = sorted(map(tuple, semdedup_dispositions_pq(
            emb, thr, n_cells=8, m=m, ks=8, sample_cap=4096).collect()))
        assert base == funnel, f"thr={thr} m={m}"
        assert any(r[3] for r in base)  # fixture actually has dups

    # the sf fixture at the driver row's threshold
    emb_sf = entry._tables(spark, SF_DIR)["embeddings"]
    base = sorted(map(tuple, semdedup_dispositions(emb_sf, 0.35).collect()))
    funnel = sorted(map(tuple, semdedup_dispositions_pq(emb_sf, 0.35).collect()))
    assert base == funnel


def test_distinct_rollup_lgk12_error_bound(spark):
    """The lg_k=12 deployment contract (VERDICT r9 item 5): beyond the
    coupon-list exact mode (~384 distinct), estimates obey the HLL
    relative-error bound ~1.04/sqrt(2^12) per 1 sigma — asserted at 4
    sigma (~6.5%) on 50k distinct keys, per shard and merged. (The
    error realization is DETERMINISTIC for a fixed key set — this
    half/half split of range(50k) happens to land one shard at 3.7
    sigma, hence the 4-sigma gate.)"""
    from pyspark.sql import functions as F

    from sparklyclean_spark.operators.sketches import distinct_rollup

    df = spark.range(50_000).select(
        F.col("id"), (F.col("id") % 2).alias("half")
    )
    out = {
        r.shard: r.est_distinct
        for r in distinct_rollup(df, F.col("id"), F.col("half"), lg_k=12).collect()
    }
    bound = 4 * 1.04 / (2 ** 12) ** 0.5
    assert abs(out["0"] - 25_000) <= 25_000 * bound
    assert abs(out["1"] - 25_000) <= 25_000 * bound
    assert abs(out["ALL"] - 50_000) <= 50_000 * bound


def test_residual_distortion_beats_raw(spark):
    """The quantified fidelity claim behind the residual tier: at the
    same (m, ks) budget, residual-tier total quantization MSE must run
    below the raw tier's on the fixture corpus (0.60 vs 0.72 at
    sf0.01 — the headroom the recall gain comes from)."""
    from tests.conftest import SF_DIR

    import __spark_entry__ as entry
    from sparklyclean_spark.operators.similarity.pq import (
        ivf_pq_residual_distortion,
        pq_distortion,
    )

    emb = entry._tables(spark, SF_DIR)["embeddings"]
    raw = sum(r.mse for r in pq_distortion(emb).collect())
    res = sum(r.mse for r in ivf_pq_residual_distortion(emb).collect())
    assert res < raw, (res, raw)


def test_lsh_tuning_curve_math(spark):
    """The banding S-curve values must equal the closed form
    1-(1-s^r)^b (checked against libm at 1e-6), s_star must sit where
    the curve crosses ~1-1/e, and the curve must be monotone."""
    from sparklyclean_spark.operators.dedup.textdedup import lsh_tuning_curve

    rows = {r.jaccard: r for r in lsh_tuning_curve(spark, 64, 16).collect()}
    assert len(rows) == 19
    b, r = 16, 4
    for s, row in rows.items():
        assert abs(row.p_band - s ** r) < 1e-6
        assert abs(row.p_detect - (1 - (1 - s ** r) ** b)) < 1e-6
        assert row.s_star == (1 / b) ** (1 / r) == 0.5
    ps = [rows[s].p_detect for s in sorted(rows)]
    assert ps == sorted(ps)
    # detection prob at the threshold similarity is ~1 - 1/e
    assert abs(rows[0.5].p_detect - (1 - (1 - 0.5 ** 4) ** 16)) < 1e-6
    import pytest

    with pytest.raises(ValueError):
        lsh_tuning_curve(spark, 64, 7)  # 64 not divisible by 7


def test_ivf_empty_sample_and_lsh_band_validation(spark):
    """r10 review batch: empty IVF training samples must raise a clear
    ValueError (the PQ advisor fix, applied symmetrically), and
    lsh_bucketed_topk must reject a (n_planes, bands) pair that would
    silently drop trailing planes from every bucket."""
    import numpy as np

    from sparklyclean_spark.operators.similarity.knn import (
        _spherical_kmeans,
        lsh_bucketed_topk,
    )

    with pytest.raises(ValueError, match="empty training sample"):
        _spherical_kmeans(np.zeros((0, 8)), 4)

    emb = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [0.5] * 8)], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        lsh_bucketed_topk(emb, emb, n_planes=16, bands=5, dim=8)


def test_bpe_apply_counts_hand_case(spark):
    """Applying the learned merges must reproduce the hand-derivable
    segmentation: on the Sennrich corpus after 4 merges (es, est, lo,
    low), 'lowest' segments to [low][est] = 2 tokens, 'low' to 1,
    'newest' to [n][e][w][est] = 4."""
    from sparklyclean_spark.operators.text_analysis import bpe_apply_counts

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame(
        [(1, text), (2, "lowest"), (3, "")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in bpe_apply_counts(docs, n_merges=4).collect()}
    # doc 2: 'lowest' -> low + est
    assert (out[2].n_words, out[2].n_chars, out[2].n_bpe_tokens) == (1, 6, 2)
    assert out[2].chars_per_tok == 3.0
    # doc 3: empty -> all zeros
    assert (out[3].n_words, out[3].n_chars, out[3].n_bpe_tokens) == (0, 0, 0)
    assert out[3].chars_per_tok == 0.0
    # doc 1: 5*low(1) + 2*lower(low,e,r=3) + 6*newest(n,e,w,est=4) + 3*widest(w,i,d,est=4)
    assert out[1].n_bpe_tokens == 5 * 1 + 2 * 3 + 6 * 4 + 3 * 4


def test_bpe_apply_oracle_parity_with_empty_doc(spark, duck):
    """r10 review regression: DuckDB array_to_string([]) is NULL while
    Spark array_join([]) is '' — a zero-word document must count 0 bpe
    tokens on BOTH engines (the shipped fixtures have no empty docs,
    so only this gate catches it)."""
    import pandas as pd

    from __spark_entry__ import _bpe_apply_counts_sql
    from sparklyclean_spark.operators.text_analysis import bpe_apply_counts

    rows = [(1, "bb bbaba"), (2, "bbb"), (3, ""), (4, "   ")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (r.doc_id, r.n_words, r.n_chars, r.n_bpe_tokens, r.chars_per_tok)
        for r in bpe_apply_counts(docs, n_merges=3).collect()
    )
    duck.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(map(tuple, duck.sql(_bpe_apply_counts_sql(3)).fetchall()))
    duck.unregister("documents")
    assert got == want
    assert got[2][1:] == (0, 0, 0, 0.0)  # doc 3, empty
    assert got[3][1:] == (0, 0, 0, 0.0)  # doc 4, whitespace-only


def test_semdedup_funnel_stage_taps_and_pruning(spark):
    """The funnel's instrumentation taps (lsh_cosine_pairs precedent):
    cellmates >= prefiltered >= verified pairs, and on a TIGHT
    clustered corpus at a high threshold the SDC bound genuinely
    prunes (survivors < cellmates)."""
    import random

    from sparklyclean_spark.operators.similarity.semdedup import (
        semdedup_dispositions_pq,
    )

    rng = random.Random(31)
    rows = []
    for c in range(4):
        base = [rng.uniform(-1, 1) for _ in range(16)]
        for i in range(25):
            rows.append(
                (c * 100 + i, [b + rng.uniform(-0.01, 0.01) for b in base])
            )
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    # n_cells=2 with 4 clusters: each cell holds TWO dissimilar
    # clusters, so cross-cluster cellmate pairs exist for the SDC
    # bound to prune (with one cell per cluster every cellmate is a
    # true near-dup and there is nothing to prune)
    kw = dict(n_cells=2, ks=8, sample_cap=4096)
    cellmates = semdedup_dispositions_pq(emb, 0.9999, stage="cellmates", **kw).count()
    pref = semdedup_dispositions_pq(emb, 0.9999, stage="prefiltered", **kw).count()
    assert cellmates >= pref
    assert pref < cellmates  # the bound prunes on tight clusters
    out = semdedup_dispositions_pq(emb, 0.9999, **kw)
    assert out.count() == len(rows)  # dispositions cover every vector
    import pytest

    with pytest.raises(ValueError, match="unknown stage"):
        semdedup_dispositions_pq(emb, 0.9, stage="bogus")
