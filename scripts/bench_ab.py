"""Controlled A/B for the r9 bench drift cluster (VERDICT r9 item 2).

Hypothesis space: (a) box noise / hypervisor stalls, (b) session
composition (the r9 bench ran 50 queries vs r8's 42 — JIT profile
pollution, GC pressure, cache residue accumulating before the
outliers), (c) a real code delta. `disdedup.py` was untouched r8->r9,
so (c) is already excluded for the flagship; this script separates
(a) from (b) by timing the outlier queries in ONE session under
three interleaved passes of two preludes:

  pass layout: [prelude-A, outliers] [prelude-B, outliers] x3
  prelude-A = first N queries of the r8 42-list (light context)
  prelude-B = the heavy array/text queries the r9 window added
              (winnowing, DSIR, PQ) (heavy context)

If the outliers' walls are stable across A and B contexts, the r9
drift was box noise (a); if B-context runs are systematically slower,
it is session composition (b). Medians are printed against the
recorded r8/r9 numbers.

Usage: python scripts/bench_ab.py [passes]
"""
from __future__ import annotations

import json
import statistics
import sys
import time

OUTLIERS = [
    "dedup_pairs_disdedup_customer",
    "events_cohort_retention",
    "neardup_minhash_lsh_exploded",
    "events_session_windows",
    "neardup_containment",
    "neardup_simhash_md5",
    "sketch_distinct_users_daily",
]
PRELUDE_A = [
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "q3_shipping_priority",
    "topk_orders_per_customer",
]
PRELUDE_B = [
    "text_winnowing_fp",
    "winnowing_overlap_pairs",
    "dsir_scores",
    "knn_pq_recall",
]


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = "/root/testdata/sf0.1"

    sys.path.insert(0, "/root/repo")
    from sparklyclean_spark import get_spark

    spark = get_spark(
        "bench-ab",
        master="local[32]",
        extra_conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from sparklyclean_spark.cache import release_caches

    queries = entry.queries()
    for t in entry._tables(spark, sf_dir).values():
        t.limit(32).write.format("noop").mode("overwrite").save()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_caches()
        return dt

    results: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in OUTLIERS
    }
    for p in range(passes):
        for ctx, prelude in (("A", PRELUDE_A), ("B", PRELUDE_B)):
            for n in prelude:
                run(n)
            for n in OUTLIERS:
                results[n][ctx].append(run(n))

    r8 = json.load(open("/root/repo/BENCH_r08.json"))
    r9 = json.load(open("/root/repo/BENCH_r09.json"))
    q8 = (r8.get("parsed") or r8)["queries"]
    q9 = (r9.get("parsed") or r9)["queries"]
    print(f"\n{'query':34s} {'r8':>6s} {'r9':>6s} {'medA':>6s} {'medB':>6s} raw")
    verdicts = []
    for n in OUTLIERS:
        a, b = results[n]["A"], results[n]["B"]
        ma, mb = statistics.median(a), statistics.median(b)
        print(
            f"{n:34s} {q8.get(n, float('nan')):6.2f} {q9.get(n, float('nan')):6.2f}"
            f" {ma:6.2f} {mb:6.2f}  A={[round(x,2) for x in a]} B={[round(x,2) for x in b]}"
        )
        base = q8.get(n)
        if base:
            verdicts.append((n, min(ma, mb) / base, mb / ma if ma else float("nan")))
    print("\nper-query: best-median/r8 (<=1.3 clears the bar), B/A context ratio")
    for n, vs_r8, b_over_a in verdicts:
        print(f"  {n}: vs_r8={vs_r8:.2f}x  B/A={b_over_a:.2f}x")


if __name__ == "__main__":
    main()
