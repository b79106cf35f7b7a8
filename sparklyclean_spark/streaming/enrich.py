"""Stream-static enrichment: join a live stream against a broadcast
dimension table.

The standard streaming-ETL shape (events x user/dim attributes): the
static side is planned as a broadcast hash join against every
micro-batch, so the join is stateless — no watermark, no state store,
append output mode. The static side is re-resolvable per batch for
file sources, which is how slowly-refreshed dims are picked up on a
real cluster.

The reference has no streaming surface (SURVEY.md §2.8); §2.10
capability-gap operator alongside the windowing/sessionize/
stream-stream-join stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_enrich(
    spark,
    path: str,
    schema: str,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """readStream from ``path`` and enrich with the static ``dim``
    via a broadcast equi-join on ``on``. Stateless — works in append
    mode with no watermark."""
    src = spark.readStream.schema(schema).parquet(path)
    return src.join(F.broadcast(dim), on, how)
