"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]``; the config below is chosen so the
same logical plans survive a 1000-executor / 100 TB deployment:
AQE on (runtime coalesce + skew-join splitting), adaptive broadcast,
Arrow for every pandas interchange, and shuffle-partition counts that
AQE re-sizes from runtime statistics rather than a hardcoded guess.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults tuned for the local[32] test harness; on a real cluster the
# site config (executor memory, dynamic allocation, shuffle service)
# overrides these — nothing here pins local mode.
_DEFAULTS = {
    # AQE: runtime partition coalescing, skew-join splitting, and
    # join-strategy re-planning from actual sizes. Core to surviving
    # skew at 100 TB without hand-tuning.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-batched transfer for every pandas UDF / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Starting shuffle width; AQE coalesces down from this.
    "spark.sql.shuffle.partitions": "32",
    # Bound per-task input so a 100 TB scan yields sane task counts.
    "spark.sql.files.maxPartitionBytes": "128m",
    # Broadcast dimension tables aggressively (region/nation/etc.).
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Deterministic timestamp semantics across JVMs.
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    # Local mode runs driver+executor in ONE JVM with up to 32
    # concurrent tasks (sort/shuffle buffers) plus persisted blocks —
    # an undersized heap turns heavy operators into GC storms. On a
    # real cluster spark-submit overrides this per-site.
    "spark.driver.memory": "48g",
    # Whole-stage codegen emits a new class per plan; a session running
    # many distinct queries can fill the JIT's default 240 MB code
    # cache, after which compilation stops and hot loops run
    # INTERPRETED. Reserve more. -Xms keeps early heap growth out of
    # the first heavy query's critical path.
    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g -Xms8g",
}


def get_spark(
    app_name: str = "sparklyclean_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    cluster leave it unset and let spark-submit supply it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for key, value in conf.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
