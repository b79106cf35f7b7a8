"""Engine-portable rounding for hash-checked ratio columns.

Engine ``round()`` tie semantics are implementation-defined (banker's
vs half-up vs decimal-string conversion differ across Spark, DuckDB,
and versions of each). For any ratio of exact integers that feeds an
order-insensitive value hash, the repo's contract (established r5, see
``operators/text_analysis.py``) is explicit floor arithmetic:

    floor(num * 10000.0 / den + 0.5) / 10000.0

Every step is a single IEEE-754 double operation on exact integer
inputs, so ANY engine produces the bit-identical double. Use this on
BOTH the Spark side and the DuckDB oracle side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ratio4(num: Column | str, den: Column | str) -> Column:
    """``floor(num * 10000.0 / den + 0.5) / 10000.0`` — the 4-decimal
    engine-portable ratio. Caller guards den == 0 (NULL propagates)."""
    num_c = F.col(num) if isinstance(num, str) else num
    den_c = F.col(den) if isinstance(den, str) else den
    return F.floor(num_c * 10000.0 / den_c + 0.5) / 10000.0


def round4(col: Column | str) -> Column:
    """``floor(col * 10000.0 + 0.5) / 10000.0`` — the scalar form of
    the same contract, for values already derived deterministically
    (percentiles, z-scores, entropy sums). NULL propagates; do not
    feed non-finite values (floor(inf) diverges between engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 10000.0 + 0.5) / 10000.0
