"""Deterministic sampling & splitting for training-data pipelines.

Both operators derive randomness from ``md5`` of the row id rather
than an RNG: the result is a pure function of the data — stable
across runs, executors, partitionings, and engines (DuckDB computes
the identical md5, so both are exactly oracle-checkable, unlike
``rand(seed)`` whose stream depends on partition layout).

* ``stratified_sample`` — exactly ``n`` rows per stratum, chosen by
  md5 order. One window shuffle on the strata columns; at 100 TB with
  a hot stratum, pre-filter with an approximate md5-prefix threshold
  first (keeps ~n·slack rows/stratum) so the window sees a bounded
  set — the exact top-n then runs on the survivors.
* ``hash_split`` — train/val/test assignment from the first 4 hex
  chars of md5(id): pure map-side, no shuffle, stable under
  re-partitioning and incremental reruns (a row never changes split
  when the corpus grows — the property random splits lack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministic
    (md5-of-id order, id tie-break)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    boundaries: tuple[str, str] = ("cccc", "e666"),
    names: tuple[str, str, str] = ("train", "val", "test"),
) -> DataFrame:
    """Append a ``split`` column: 3-way assignment by comparing the
    first 4 hex chars of md5(id) against the boundary strings
    (defaults ≈ 0.80 / 0.10 / 0.10 — 0xCCCC/0x10000 and 0xE666/0x10000)."""
    h4 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    return df.withColumn(
        "split",
        F.when(h4 < boundaries[0], names[0])
        .when(h4 < boundaries[1], names[1])
        .otherwise(names[2]),
    )


def weighted_sample(
    df: DataFrame,
    weight: "F.Column",
    id_col: str,
    weight_name: str = "keep_p",
) -> DataFrame:
    """Per-row Bernoulli keep with probability ``weight`` (a Column
    in [0,1], e.g. a quality score) — the quality-weighted
    downsampling pass of a pretraining mix. Deterministic: the
    uniform draw is the first 8 hex chars of md5(id) scaled to [0,1),
    so the decision is a pure function of (id, weight) — stable
    across reruns and engine-portable (DuckDB reproduces it exactly).
    Pure map-side; no shuffle, no RNG state."""
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(16**8))
    )
    return df.withColumn(weight_name, weight).where(u < F.col(weight_name))
