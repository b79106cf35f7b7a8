"""Dis-Dedup flagship scale rehearsal at sf1-equivalent input (VERDICT r6
item 6): validate the W/k work bound empirically at 10x the per-round
bench scale.

The driver ships testdata only up to sf0.1, so the 10x input is built
deterministically FROM sf0.1 (ten key-shifted copies of customer —
blocking-attribute distributions, and therefore block-size skew, are
preserved exactly; pair work scales ~100x). This synthesized table is a
load rehearsal only — every correctness check still runs on the driver's
own parquet.

Measured quantities, mirroring the reference's published skew band
(/root/reference/README.md:193-197 — naive min 15s / max 3.4min task
skew at 20k records on 8x m4.2xlarge):

- wall-clock to enumerate the full candidate-pair universe
- per-reducer pair counts (with_cell_stats rid): max/median/min and the
  max/W-over-k ratio — the Dis-Dedup bound says max <= ~W/k + triangle
  quantization slack

Usage:  python scripts/scale_rehearsal.py [copies] [k]
Prints one JSON line; paste the table into README.md when re-run.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
K = int(sys.argv[2]) if len(sys.argv) > 2 else 199

spark = (
    SparkSession.builder.appName("disdedup-scale-rehearsal")
    .master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import __spark_entry__ as E
from sparklyclean_spark.operators.dedup.blocking import BlockingRule
from sparklyclean_spark.operators.dedup.disdedup import candidate_pairs_disdedup

base = E._tables(spark, "/root/testdata/sf0.1")["customer"]
n_base = base.count()
# ten key-shifted copies: same nationkey/mktsegment marginals -> identical
# blocking skew SHAPE at 10x rows (pair work ~100x)
sf1 = None
for i in range(COPIES):
    c = base.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * 10_000_000))
    sf1 = c if sf1 is None else sf1.unionByName(c)
sf1 = sf1.repartition(64).persist()
n = sf1.count()

results = {"rows": n, "base_rows": n_base, "copies": COPIES, "k": K}

for label, df, rules in (
    (
        "flagship",
        sf1,
        [BlockingRule(1, "c_nationkey"), BlockingRule(2, "c_mktsegment")],
    ),
    (
        "skewed_hot50",
        sf1.withColumn(
            "c_hotkey",
            F.when(F.col("c_custkey") % 2 == 0, F.lit(-1)).otherwise(
                F.col("c_nationkey")
            ),
        ),
        [BlockingRule(1, "c_hotkey")],
    ),
):
    t0 = time.time()
    pairs = candidate_pairs_disdedup(
        df, rules, "c_custkey", k=K, with_cell_stats=True
    )
    per_rid = pairs.groupBy("rid").agg(F.count(F.lit(1)).alias("w")).collect()
    wall = time.time() - t0
    ws = sorted(r["w"] for r in per_rid)
    total = sum(ws)
    results[label] = {
        "wall_sec": round(wall, 1),
        "total_pairs": total,
        "reducers": len(ws),
        "w_min": ws[0],
        "w_median": ws[len(ws) // 2],
        "w_max": ws[-1],
        "max_over_Wk": round(ws[-1] / (total / K), 3),
    }
    print(json.dumps({label: results[label]}), file=sys.stderr)

print(json.dumps(results))
