"""Capture .explain('formatted') for bench queries into plans/<tag>/.

Usage: python scripts/plan_capture.py <tag> [query ...]
  tag     subdirectory under plans/ and filename suffix, e.g. "r12" writes
          plans/r12/<query>_before.txt (set SUFFIX=after for the post pass)
  query   optional subset; default = the full bench.py headline list

Runs the same session shape as bench.py (local[$SPARK_GRAFT_CPUS],
2*cpus shuffle partitions) so the captured plans match what the bench
executes. Construction-side jobs (trainer collects) do run; the query
itself is only explained, never executed.
"""
from __future__ import annotations

import os
import re
import sys

TAG = sys.argv[1] if len(sys.argv) > 1 else "r12"
SUFFIX = os.environ.get("SUFFIX", "before")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sparklyclean_spark import get_spark  # noqa: E402

spark = get_spark(
    "plan-capture",
    master=f"local[{cpus}]",
    extra_conf={
        "spark.sql.shuffle.partitions": str(2 * int(cpus)),
        "spark.ui.showConsoleProgress": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry  # noqa: E402

queries = entry.queries()

names = sys.argv[2:]
if not names:
    src = open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")).read()
    body = src[src.index("headline = ["):]
    body = body[: body.index("]")]
    names = re.findall(r'"([a-z0-9_]+)"', body)

outdir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", TAG
)
os.makedirs(outdir, exist_ok=True)

from sparklyclean_spark.cache import release_caches  # noqa: E402

for name in names:
    try:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    except Exception as e:  # pragma: no cover - capture tool
        plan = f"ERROR constructing/explaining {name}: {e!r}"
    path = os.path.join(outdir, f"{name}_{SUFFIX}.txt")
    with open(path, "w") as f:
        f.write(plan)
    n_ex = plan.count("Exchange")
    n_py = sum(plan.count(t) for t in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow", "FlatMapGroupsInPandas"))
    print(f"{name}: exchanges~{n_ex} python-nodes~{n_py} -> {path}", flush=True)
    release_caches()

spark.stop()
