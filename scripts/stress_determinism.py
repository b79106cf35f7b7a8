"""Cross-session-shape determinism stress harness.

Runs each named query under FOUR hostile session configurations
(2 cores/2 shuffle partitions, 200 partitions, aggressive AQE
coalescing, AQE off) x 3 repetitions and asserts ONE value hash per
query. This is the harness that exposed the spark_partition_id
prefix-sum race and the deep when-chain stack overflow that repeated
same-config reruns never caught.

Usage: python scripts/stress_determinism.py [query ...]
(defaults below; ~6 min for 6 queries)

different core counts, shuffle partitions, AQE coalesce settings.
Every config must produce ONE hash per query."""
import hashlib, math, sys
from datetime import datetime, date
sys.path.insert(0, "/root/repo")

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NULL"
        return f"{round(v, 4):.4f}"
    if isinstance(v, datetime): return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date): return v.isoformat()
    return str(v)

def valhash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]

import sys as _sys
NAMES = _sys.argv[1:] or [
    "pack_training_sequences", "dense_ids_documents",
    "text_repetition_signals", "text_bm25_rank",
    "text_unigram_cross_entropy", "sample_docs_exact_k_weighted",
]
CONFIGS = [
    {"master": "local[2]", "spark.sql.shuffle.partitions": "2"},
    {"master": "local[8]", "spark.sql.shuffle.partitions": "200"},
    {"master": "local[32]", "spark.sql.shuffle.partitions": "7",
     "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1b",
     "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1048576b"},
    {"master": "local[32]", "spark.sql.shuffle.partitions": "64",
     "spark.sql.adaptive.enabled": "false"},
]
from pyspark.sql import SparkSession
hashes = {n: set() for n in NAMES}
for ci, cfg in enumerate(CONFIGS):
    b = SparkSession.builder.appName(f"stress{ci}").master(cfg.pop("master"))
    b = b.config("spark.ui.enabled", "false")
    for k, v in cfg.items(): b = b.config(k, v)
    spark = b.getOrCreate()
    import importlib
    import __spark_entry__ as E
    importlib.reload(E)
    Q = E.queries()
    for n in NAMES:
        for rep in range(3):
            sdf = Q[n](spark, "/root/testdata/sf0.01")
            h = valhash(sdf.columns, [tuple(r) for r in sdf.collect()])
            hashes[n].add(h)
    spark.stop()
    print(f"config {ci} done")
bad = {n: hs for n, hs in hashes.items() if len(hs) != 1}
print("RESULT:", "ALL STABLE" if not bad else f"UNSTABLE: {bad}")
for n, hs in hashes.items(): print(" ", n, hs)
