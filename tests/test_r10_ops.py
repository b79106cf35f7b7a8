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
