"""Controlled same-session A/B for bench drift clusters (first used
for the r9 cluster, VERDICT r9 item 2; r12 defaults target the six
rows the r11 closing bench flagged at 1.5-2.1x of r10 — all on code
untouched in r11, VERDICT r11 item 7).

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
    # r12 defaults: the six rows the final r11 session flagged at
    # 1.5-2.1x of r10 with zero r11 diffs in their files
    "heavy_hitters_orders",
    "brand_cooccurrence_lift",
    "neardup_containment",
    "dq_orders_constraints",
    "event_transition_matrix",
    "text_bigram_pmi",
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

    def load_queries(path):
        d = json.load(open(path))
        src_ = d.get("parsed") or d
        if "queries" in src_:
            return src_["queries"]
        # driver artifacts sometimes ship a truncated tail with
        # parsed=None (BENCH_r11.json); the builder's own BENCH_RAW
        # carries the same session's full record
        return None

    q8 = load_queries("/root/repo/BENCH_r10.json")
    q9 = load_queries("/root/repo/BENCH_r11.json") or load_queries(
        "/root/repo/BENCH_RAW.json"
    )
    # fail FAST on a malformed baseline (r12 review finding: an
    # unguarded q8=None crashed only AFTER the full benchmark ran)
    if q8 is None or q9 is None:
        raise SystemExit(
            "baseline bench artifact unparseable (parsed=None and no"
            " queries key) — fix the artifact before burning minutes"
            " of benchmark passes"
        )
    print(f"\n{'query':34s} {'r10':>6s} {'r11':>6s} {'medA':>6s} {'medB':>6s} raw")
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
    print("\nper-query: best-median/r10 (<=1.2 clears the r12 bar), B/A context ratio")
    for n, vs_r8, b_over_a in verdicts:
        print(f"  {n}: vs_r10={vs_r8:.2f}x  B/A={b_over_a:.2f}x")


if __name__ == "__main__":
    main()
