"""Bloom-filter pre-join pruning.

The 100 TB probe-side problem: a semi join against a dimension of a
few million keys still shuffles (or broadcast-hashes) the ENTIRE fact
table before non-matching rows die at the join operator. A Bloom
filter inverts that: ~10 bits/key (vs ~32 bytes/key for a hash
table) rides into the scan as a literal bit array, and a pure-Column
membership test kills >99% of non-matching rows MAP-SIDE, before any
exchange. The exact join that follows only sees survivors, so the
false-positive tail (rate ``fpp``) costs nothing but a few extra rows
through the real join — results are exactly equal to the plain semi
join (asserted by the oracle), the bloom is purely a physical
prefilter. Spark's own runtime-filter injection
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) does this
opportunistically for shuffle joins; this operator is the explicit,
guaranteed form (and works for any downstream consumer, not just one
join).

Membership test = k probes of ``xxhash64(key, seed_i) mod m`` into a
packed ``array<bigint>`` literal — whole-stage codegen, no UDF, no
shuffle. The build side collects only bit INDICES of the (small) dim
side: O(n_dim * k) ints, the same order as the broadcast a semi join
ships anyway; a guard caps the filter at ``max_bits``.

No reference counterpart; §2.10 capability row (join-pruning
infrastructure the curation joins can reuse).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class BloomFilter:
    """Packed bit array + parameters; built once per dimension."""

    def __init__(self, words: list[int], m: int, seeds: list[int]):
        self.words = words
        self.m = m
        self.seeds = seeds

    def contains(self, key: Column) -> Column:
        """Membership test as a pure Column expression (codegen)."""
        arr = F.lit(self.words)
        cond = F.lit(True)
        for s in self.seeds:
            idx = F.pmod(F.xxhash64(key, F.lit(s)), F.lit(self.m))
            word = F.element_at(arr, (idx / 64).cast("int") + 1)
            # getbit: bit test with a COLUMN position (shiftright's
            # python wrapper only takes literal shift amounts)
            cond = cond & (F.getbit(word, (idx % 64).cast("int")) == 1)
        return cond


def build_bloom(
    dim: DataFrame,
    key_col: str,
    expected_keys: int,
    fpp: float = 0.01,
    max_bits: int = 1 << 24,
) -> BloomFilter:
    """Size the filter for ``expected_keys`` at ``fpp``, compute the
    k*n bit indices IN SPARK (same xxhash64 the probe side uses), and
    collect only those integers."""
    m = int(-expected_keys * math.log(fpp) / (math.log(2) ** 2)) + 1
    m = min(m, max_bits)
    k = max(1, round(m / max(expected_keys, 1) * math.log(2)))
    seeds = list(range(k))
    idx_cols = [
        F.pmod(F.xxhash64(F.col(key_col), F.lit(s)), F.lit(m)).alias(f"i{s}")
        for s in seeds
    ]
    rows = dim.where(F.col(key_col).isNotNull()).select(*idx_cols).collect()
    words = [0] * ((m + 63) // 64)
    for r in rows:
        for s in seeds:
            i = r[f"i{s}"]
            words[i // 64] |= 1 << (i % 64)
    # pack as SIGNED 64-bit for the BIGINT array literal
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    return BloomFilter(words, m, seeds)


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    expected_keys: int,
    fpp: float = 0.01,
) -> DataFrame:
    """Exact semi join with a bloom prefilter on the fact side: the
    membership test runs in the fact SCAN stage (map-side, before any
    exchange); the exact join then removes false positives. Result is
    identical to ``fact.join(dim, ..., "left_semi")``."""
    bf = build_bloom(dim, dim_key, expected_keys, fpp)
    pruned = fact.where(bf.contains(F.col(fact_key)))
    return pruned.join(
        F.broadcast(dim.select(F.col(dim_key).alias(fact_key)).distinct()),
        fact_key,
        "left_semi",
    )
