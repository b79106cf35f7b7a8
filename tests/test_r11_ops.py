"""Round-11 operator tests: the IVF-PQ refine (re-rank) tier, the
driver-side BPE trainer, the perplexity-bucket approx escape, and the
LSH tuning-grid regression."""
import pytest


def test_refine_recall_beats_residual(spark):
    """VERDICT r10 item 3's done-gate: the refine tier (exact-cosine
    re-rank of the residual funnel's top-R ADC candidates, FAISS
    IndexRefineFlat) must STRICTLY improve mean recall@5 over the
    residual tier on the 100-query comparison set — measured 0.588 vs
    0.230 at sf0.01."""
    from tests.conftest import SF_DIR

    import __spark_entry__ as entry
    from sparklyclean_spark.operators.similarity.pq import (
        ivf_pq_refine_topk,
        ivf_pq_residual_topk,
    )

    means = {}
    for name, fn in (
        ("residual", lambda emb, q: ivf_pq_residual_topk(
            emb, q, k=5, n_cells=32, nprobe=8)),
        ("refine", lambda emb, q: ivf_pq_refine_topk(
            emb, q, k=5, refine_r=40, n_cells=32, nprobe=8)),
    ):
        rows = entry._recall_vs_exact(spark, SF_DIR, fn, nq=100).collect()
        means[name] = sum(r.recall_at_5 for r in rows) / len(rows)
    assert means["refine"] > means["residual"], means


def test_refine_is_exact_over_candidates(spark):
    """The refine tier's output must equal brute force whenever R
    covers every candidate the probes admit — the re-rank is EXACT
    math, so with refine_r >= |corpus| and nprobe = n_cells the
    funnel admits everything and refine == brute force."""
    import random

    from sparklyclean_spark.operators.similarity.knn import brute_force_topk
    from sparklyclean_spark.operators.similarity.pq import ivf_pq_refine_topk

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(80)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = emb.where("vec_id < 6")
    exact = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in brute_force_topk(emb, q, k=5).collect()
    )
    refined = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_pq_refine_topk(
            emb, q, k=5, refine_r=80, n_cells=4, nprobe=4, m=4, ks=4
        ).collect()
    )
    assert refined == exact


def test_bpe_local_trainer_equals_distributed(spark):
    """VERDICT r10 item 5's done-gate: the driver-side heap trainer
    must return the EXACT merge table of the distributed loop (same
    pair counts, same tie-breaks, same greedy rewrite) at n=8 and
    n=16, on both a hand corpus with overlap/tie edge cases and the
    sf fixture corpus."""
    from tests.conftest import SF_DIR

    import __spark_entry__ as entry
    from sparklyclean_spark.operators.text_analysis import (
        bpe_merge_table,
        bpe_merge_table_local,
    )

    hand = spark.createDataFrame(
        [
            (1, "aaa banana bandana"),
            (2, "aaaa abab low lower lowest"),
            (3, "banana band bandit"),
            (4, None),
            (5, "low low low newest newest"),
        ],
        "doc_id bigint, text string",
    )
    corpora = [hand, entry._tables(spark, SF_DIR)["documents"]]
    for docs in corpora:
        for n in (8, 16):
            dist = [tuple(r) for r in bpe_merge_table(docs, n).collect()]
            local = [tuple(r) for r in bpe_merge_table_local(docs, n).collect()]
            assert local == dist, f"n={n}"


def test_bpe_apply_accepts_precomputed_merges(spark):
    """bpe_apply_counts(merges=...) must skip the embedded re-train
    and produce the identical table (VERDICT r10 'what's wrong 2')."""
    from sparklyclean_spark.operators.text_analysis import (
        bpe_apply_counts,
        bpe_merge_table_local,
    )

    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer newest"), (3, "")],
        "doc_id bigint, text string",
    )
    merges = [
        (r.lhs, r.rhs) for r in bpe_merge_table_local(docs, 6).collect()
    ]
    default = sorted(map(tuple, bpe_apply_counts(docs, 6).collect()))
    pre = sorted(map(tuple, bpe_apply_counts(docs, merges=merges).collect()))
    assert pre == default


@pytest.mark.parametrize("seed", [3, 77])
def test_perplexity_buckets_approx_parity(spark, seed):
    """VERDICT r10 item 4's done-gate: the approx_cutoffs escape
    (per-lang approx_percentile cutoffs broadcast back, no per-lang
    sort) must agree with the exact NTILE form except on rows within
    the sketch's rank-error bound of a tercile boundary — and any
    divergence moves a row only to the ADJACENT bucket."""
    import math
    import random

    from sparklyclean_spark.operators.text_analysis import perplexity_buckets

    rng = random.Random(seed)
    langs = ["en", "de", "fr"]
    vocab = [f"w{i}" for i in range(50)]
    rows = [
        (
            i,
            " ".join(rng.choices(vocab, k=rng.randrange(3, 40))),
            rng.choice(langs),
        )
        for i in range(600)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")

    accuracy = 10000
    exact = {
        r.doc_id: (r.lang, r.cross_entropy, r.bucket)
        for r in perplexity_buckets(docs).collect()
    }
    approx = {
        r.doc_id: r.bucket
        for r in perplexity_buckets(
            docs, approx_cutoffs=True, accuracy=accuracy
        ).collect()
    }
    assert set(exact) == set(approx)

    # per-lang rank table in the exact NTILE order
    order = {"head": 0, "middle": 1, "tail": 2}
    by_lang = {}
    for doc_id, (lang, xe, _) in exact.items():
        by_lang.setdefault(lang, []).append((xe, doc_id))
    rank = {}
    for lang, lst in by_lang.items():
        lst.sort()
        for r_, (xe, doc_id) in enumerate(lst, start=1):
            rank[doc_id] = (r_, len(lst))
    for doc_id, (lang, xe, eb) in exact.items():
        ab = approx[doc_id]
        if ab == eb:
            continue
        assert abs(order[ab] - order[eb]) == 1, (doc_id, eb, ab)
        r_, n = rank[doc_id]
        err = max(1, math.ceil(n / accuracy))
        # ties at this doc's (rounded) xent widen the admissible window
        ties = sum(1 for xe2, _ in by_lang[lang] if xe2 == xe)
        # NTILE group sizes: floor(n/3) each, first (n mod 3) get +1
        n1 = n // 3 + (1 if n % 3 >= 1 else 0)
        n2 = n1 + n // 3 + (1 if n % 3 >= 2 else 0)
        near = min(abs(r_ - n1), abs(r_ - n2))
        assert near <= err + ties, (doc_id, lang, r_, n, eb, ab, ties)


def test_opq_beats_pq_on_anisotropic_data(spark):
    """OPQ's value claim, gated where it holds (Ge CVPR'13 §1): on
    data whose variance concentrates in directions STRADDLING subspace
    boundaries, the learned rotation must cut total quantization MSE
    well below plain PQ (measured ~0.29x on this fixture). Also pins
    trainer determinism and R's orthogonality."""
    import numpy as np

    from sparklyclean_spark.operators.similarity.pq import (
        opq_distortion,
        pq_distortion,
    )

    rng = np.random.RandomState(7)
    dirs = rng.randn(6, 64)
    coef = rng.randn(800, 6) * np.array([8, 5, 3, 2, 1.5, 1])
    x = coef @ dirs + 0.05 * rng.randn(800, 64)
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    mse_pq = sum(r.mse for r in pq_distortion(emb).collect())
    mse_opq = sum(r.mse for r in opq_distortion(emb).collect())
    assert mse_opq < 0.7 * mse_pq, (mse_opq, mse_pq)

    from sparklyclean_spark.operators.similarity.pq import opq_train

    xs = x / np.linalg.norm(x, axis=1, keepdims=True)
    r1, c1 = opq_train(xs, 4, 16, 10, 8, 647)
    r2, c2 = opq_train(xs, 4, 16, 10, 8, 647)
    assert np.array_equal(r1, r2) and np.array_equal(c1, c2)
    assert np.allclose(r1 @ r1.T, np.eye(64), atol=1e-10)


def test_kn_bigram_xent_hand_case(spark):
    """Interpolated Kneser-Ney bigram xent against hand-computed
    probabilities (D=0.75): corpus 'a b a b' / 'a c' / 'x' gives
    p(b|a) = 1.25/3 + (1.5/3)(1/3), p(a|b) = .25 + .75(1/3),
    p(c|a) = .25/3 + (1.5/3)(1/3); the 1-token doc carries no bigram
    and is excluded."""
    import math

    from sparklyclean_spark.operators.text_analysis import (
        kn_bigram_cross_entropy,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "x")],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.cross_entropy)
        for r in kn_bigram_cross_entropy(docs).collect()
    }
    p_ba = 1.25 / 3 + (0.75 * 2 / 3) * (1 / 3)
    p_ab = 0.25 + 0.75 * (1 / 3)
    p_ca = 0.25 / 3 + (0.75 * 2 / 3) * (1 / 3)
    ce1 = -(2 * round(math.log(p_ba), 6) + round(math.log(p_ab), 6)) / 3
    ce2 = -round(math.log(p_ca), 6)
    assert set(got) == {1, 2}  # the 1-token doc is excluded
    assert got[1] == (3, round(ce1, 4))
    assert got[2] == (1, round(ce2, 4))


def test_lsh_tuning_grid_non_divisor_step(spark):
    """r11 advisor regression: a non-divisor grid_step must still
    reach the top grid point below 1.0 (0.15 ends at 0.90, not
    0.75)."""
    from sparklyclean_spark.operators.dedup.textdedup import lsh_tuning_curve

    rows = lsh_tuning_curve(spark, grid_step=0.15).collect()
    got = sorted(r.jaccard for r in rows)
    assert got == [0.15, 0.3, 0.45, 0.6, 0.75, 0.9]
