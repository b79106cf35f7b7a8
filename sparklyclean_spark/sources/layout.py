"""Z-order (Morton) clustered data layout.

Bucketing (``sources/bucketing.py``) co-locates JOINS; Z-ordering
co-locates SCANS: interleaving the bits of several columns' ranks
gives a 1-D sort key whose contiguous ranges are small hyper-rectangles
in N-D value space, so after ``repartitionByRange(zkey)`` + sorted
parquet writes, every file's min/max footer stats are tight on EVERY
participating column — a predicate on any one of them prunes most
files (the "OPTIMIZE ZORDER BY" of lakehouse engines, rebuilt from
primitives). On a 100 TB table this turns full scans with selective
2-D predicates into reads of a few percent of files; the key is
computed with pure Column bit arithmetic (whole-stage codegen, no
UDF), and the min/max scaling bounds come from one tiny aggregation
broadcast back into the plan (no driver round-trip in the operator
itself).

No reference counterpart (the reference reads flat CSV); §2.10
storage-layout capability row alongside bucketed tables and
compacted writes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min/max-scale ``col`` to an integer rank in [0, 2^bits): explicit
    floor arithmetic (oracle-reproducible), degenerate range -> 0."""
    span = hi.cast("double") - lo.cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    maxrank = (1 << bits) - 1
    # NULL values rank 0 EXPLICITLY: least() skips NULL operands, so
    # an unguarded form returned maxrank and clustered NULL rows into
    # the max-corner files — inflating their min/max stats so nothing
    # near the max pruned (r9 review finding). Rank 0 keeps NULLs in
    # one corner with tight stats on the other columns.
    return F.when(col.isNull(), F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.floor(frac * F.lit(maxrank + 1)).cast("bigint"), F.lit(maxrank)
        )
    )


def zorder_key_from_ranks(ranks: list[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each rank column (first column
    owns the least-significant interleaved bit). Pure shift/or/and
    Column arithmetic — one codegen expression, no UDF.

    ``len(ranks) * bits`` must fit in the 63 value bits of a signed
    long: 4 columns at the default 16 bits silently produced NEGATIVE
    keys (signed-sort scrambles the clustering) and ≥5 columns wrap
    the JVM shift count mod 64, colliding distinct points (r9 review
    finding, reproduced). Lower ``bits`` for wide column sets (15
    bits × 4 cols or 12 × 5 lose nothing at file granularity)."""
    n = len(ranks)
    if n * bits > 63:
        raise ValueError(
            f"{n} columns x {bits} bits = {n * bits} interleaved bits"
            " exceeds the 63 available in a signed 64-bit key; lower"
            f" bits to <= {63 // n}"
        )
    terms = []
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, b * n + i))
    return reduce(lambda a, c: a.bitwiseOR(c), terms).alias("zkey")


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    key_name: str = "zkey",
) -> DataFrame:
    """Append the Morton key over ``cols`` (numeric), scaling each to
    its observed min/max. The bounds aggregate is one row, broadcast
    back — the scan side never shuffles for key computation."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    bounds = df.agg(*aggs)
    based = df.crossJoin(F.broadcast(bounds))
    ranks = [
        _scale(F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits) for c in cols
    ]
    out = based.withColumn(key_name, zorder_key_from_ranks(ranks, bits))
    return out.drop(*[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols])


def with_hilbert_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    key_name: str = "hkey",
) -> DataFrame:
    """Append a 2-D HILBERT curve key over ``cols`` — the refinement
    lakehouse engines moved to after Z-order (e.g. liquid clustering):
    the Hilbert curve visits grid cells so that CONSECUTIVE keys are
    always grid-neighbors (the Morton curve takes long diagonal jumps
    at every power-of-two boundary), so contiguous key ranges map to
    tighter value-space boxes and file min/max stats prune better for
    the same file count. 2-D only by design — the classic xy→d walk
    (the public-domain iterative form: per level, emit the quadrant's
    Gray-coded index, then reflect/swap the frame); multi-column sets
    beyond 2 keep using ``with_zorder_key``.

    Scaling/NULL/bounds treatment is shared with the Morton key
    (``_scale``: min/max floor ranks, NULLs pinned to rank 0, one
    1-row bounds aggregate broadcast back). The per-level state
    (x, y, d) advances through a ``withColumns`` chain — each level is
    one Project whose expressions reference the previous level's
    columns more than once, so Catalyst keeps the plan LINEAR in
    ``bits`` (no expression-tree blowup) and the whole key is still
    pure codegen arithmetic, no UDF.
    """
    if len(cols) != 2:
        raise ValueError(
            "hilbert key is the 2-D tier (the published xy2d walk);"
            " use with_zorder_key for other column counts"
        )
    if 2 * bits > 63:
        raise ValueError(f"2 x {bits} bits exceeds the signed-long key")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    bounds = df.agg(*aggs)
    based = df.crossJoin(F.broadcast(bounds))
    cx, cy = cols
    side = (1 << bits) - 1
    cur = based.withColumns({
        "_hx": _scale(F.col(cx), F.col(f"_lo_{cx}"), F.col(f"_hi_{cx}"), bits),
        "_hy": _scale(F.col(cy), F.col(f"_lo_{cy}"), F.col(f"_hi_{cy}"), bits),
        "_hd": F.lit(0).cast("bigint"),
    })
    for level in range(bits - 1, -1, -1):
        rx = F.shiftright(F.col("_hx"), level).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), level).bitwiseAND(F.lit(1))
        refl = (ry == F.lit(0)) & (rx == F.lit(1))
        swap = ry == F.lit(0)
        x2 = F.when(refl, F.lit(side) - F.col("_hx")).otherwise(F.col("_hx"))
        y2 = F.when(refl, F.lit(side) - F.col("_hy")).otherwise(F.col("_hy"))
        cur = cur.withColumns({
            "_hd": F.col("_hd")
            + F.shiftleft(
                (rx * 3).bitwiseXOR(ry).cast("bigint"), 2 * level
            ),
            "_hx": F.when(swap, y2).otherwise(x2),
            "_hy": F.when(swap, x2).otherwise(y2),
        })
    out = cur.withColumn(key_name, F.col("_hd")).drop(
        "_hx", "_hy", "_hd",
        *[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols],
    )
    return out


def write_hilbert_clustered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int,
    bits: int = 8,
) -> None:
    """Cluster ``df`` into ``num_files`` parquet files by Hilbert order
    over two columns — ``write_zordered`` with the tighter curve."""
    keyed = with_hilbert_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, "hkey")
        .sortWithinPartitions("hkey")
        .drop("hkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int,
    bits: int = 16,
) -> None:
    """Cluster ``df`` into ``num_files`` parquet files by Z-order over
    ``cols``: range-partition on the key (contiguous key ranges =
    compact value-space boxes per file), sort within partitions so
    row-group stats are tight too, drop the key before writing."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
