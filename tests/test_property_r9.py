"""Property-based invariants for the r9 operator families, in the
style of test_property_r6b: hypothesis generates adversarial small
corpora; each property compares the Spark operator to a brute-force
pure-Python reference (the strongest gate a declarative pipeline can
have below the DuckDB oracle).

Strategies stay tiny (≤12 docs, short tokens) — each example pays a
Spark job; the value is input SHAPE diversity (1-char tokens, unicode,
duplicate docs, empty/whitespace text), not volume.
"""

from __future__ import annotations

import collections
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tokens from a tiny alphabet (forces collisions) incl. 1-char tokens
# (the empty-pair-list guard) and a multibyte char (substr semantics)
_TOK = st.text(alphabet="abzé", min_size=1, max_size=4)
_DOC = st.lists(_TOK, min_size=0, max_size=6).map(" ".join)


def _py_pairs(docs: list[str]) -> collections.Counter:
    c: collections.Counter = collections.Counter()
    for text in docs:
        for tok in text.lower().split():
            for i in range(len(tok) - 1):
                c[tok[i : i + 2]] += 1
    return c


@given(texts=st.lists(_DOC, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_bpe_pairs_match_python_reference(spark, texts):
    """bpe_merge_candidates == brute-force Python pair counting for
    any corpus, including the (cnt DESC, pair ASC) order."""
    from sparklyclean_spark.operators.text_analysis import bpe_merge_candidates

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = [(r.pair, r.cnt) for r in bpe_merge_candidates(docs, top_k=1000).collect()]
    ref = sorted(_py_pairs(texts).items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == ref


@given(texts=st.lists(_DOC, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_vocab_coverage_matches_python_reference(spark, texts):
    """For every k in the grid: n_terms, covered, and the floor-snap
    coverage equal the brute-force computation over the same ranking
    (count DESC, term ASC)."""
    from sparklyclean_spark.operators.text_analysis import vocab_coverage

    toks = [t for text in texts for t in text.lower().split()]
    if not toks:
        return  # no tokens: operator yields 0 rows (div-by-zero domain)
    counts = collections.Counter(toks)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    out = {r.k: r for r in vocab_coverage(docs, ks=(1, 3, 7)).collect()}
    for k in (1, 3, 7):
        top = ranked[:k]
        covered = sum(c for _, c in top)
        assert out[k].n_terms == len(top)
        assert out[k].covered == covered
        assert out[k].coverage == math.floor(covered * 10000.0 / total + 0.5) / 10000.0


@given(
    texts=st.lists(_DOC, min_size=1, max_size=10),
    langs=st.lists(st.sampled_from(["en", "fr"]), min_size=10, max_size=10),
)
@settings(**_SETTINGS)
def test_perplexity_buckets_are_valid_terciles(spark, texts, langs):
    """For any corpus: every tokenful doc gets exactly one bucket; per
    lang the bucket sizes follow NTILE's ceil-distribution; and bucket
    order respects the (cross_entropy, doc_id) sort — no 'tail' doc
    may have lower xent than a 'head' doc of the same lang."""
    from sparklyclean_spark.operators.text_analysis import perplexity_buckets

    rows = [(i, t, langs[i]) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = perplexity_buckets(docs).collect()
    tokenful = {i for i, t, _ in rows if t.split()}
    assert {r.doc_id for r in out} == tokenful

    order = {"head": 0, "middle": 1, "tail": 2}
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        sizes = collections.Counter(r.bucket for r in rs)
        expected = [n // 3 + (1 if i < n % 3 else 0) for i in range(3)]
        got = [sizes.get(b, 0) for b in ("head", "middle", "tail")]
        assert got == expected, (lang, got, expected)
        rs.sort(key=lambda r: (r.cross_entropy, r.doc_id))
        tiles = [order[r.bucket] for r in rs]
        assert tiles == sorted(tiles), (lang, tiles)


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
            min_size=8,
            max_size=8,
        ),
        min_size=3,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_pq_topk_invariants(spark, vecs):
    """For any corpus: per-query ranks are 1..k', self excluded, adist
    non-decreasing in rank, and every adist equals the brute-force
    ADC distance recomputed in Python from the trained codebooks."""
    import numpy as np

    from sparklyclean_spark.operators.similarity.pq import (
        _encode_udf,  # noqa: F401  (documented private reuse)
        pq_topk,
        train_pq_codebooks,
    )

    rows = [(i, list(v)) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = emb.where("vec_id = 0")
    out = sorted(map(tuple, pq_topk(emb, q, k=3, m=4, ks=4).collect()),
                 key=lambda t: t[3])
    assert [t[3] for t in out] == list(range(1, len(out) + 1))
    assert all(t[1] != 0 for t in out)
    adists = [t[2] for t in out]
    assert adists == sorted(adists)

    # brute-force ADC reference from the same deterministic codebooks
    cents = train_pq_codebooks(emb, m=4, ks=4)
    x = np.array([v for _, v in rows], dtype=np.float64)
    x = x / np.clip(np.linalg.norm(x, axis=1, keepdims=True), 1e-12, None)
    sub = cents.shape[2]

    def codes(vec):
        return [
            int(np.round(((vec[j * sub : (j + 1) * sub] - cents[j]) ** 2).sum(-1), 9).argmin())
            for j in range(4)
        ]

    lut = [
        np.round(((x[0][j * sub : (j + 1) * sub] - cents[j]) ** 2).sum(-1), 9)
        for j in range(4)
    ]
    for _, nid, adist, _ in out:
        ref = sum(float(lut[j][codes(x[nid])[j]]) for j in range(4))
        assert abs(adist - round(ref, 4)) < 1e-9
