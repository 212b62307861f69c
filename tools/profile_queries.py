"""Per-query profiler for the optimization rounds (guide §1).

For each named registry query (default: the bench headline list) at
$SPARK_GRAFT_SF_DIR (default sf0.1):
- time `collect()` (the bench's timed action) — warmup 1, median of 3
- time the noop sink (`write.format("noop")`) for comparison (§1.4)
- count Spark jobs/stages launched per timed run (status tracker)
- dump `.explain("formatted")` to plans/$PROFILE_PLANS_ROUND/<query>_<tag>.txt
- extract plan-shape stats: Exchange count, join strategies,
  BatchEvalPython/ArrowEvalPython/MapInArrow nodes, scans

Usage: python tools/profile_queries.py <tag> [query ...]
Writes a JSON summary to /tmp/profile_<tag>.json and the plan files.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "vs_topk", "vs_multi_search", "vs_topk_per_label", "vs_knn_join",
    "vs_nested_search", "vs_neardup_cos", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_groups",
    "vs_pq_topk", "vs_sq8_topk", "text_boilerplate", "mm_audio_windows",
    "pipe_stratified_sample", "text_quality", "text_fingerprint",
    "mm_image_features", "pipe_chunk_docs", "pipe_dataset_split",
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "part_promo_share",
    "events_hourly", "events_user_gap", "events_asof_signup",
    "events_sessions", "events_funnel", "events_retention",
    "events_sliding", "pipe_upsert_latest", "profile_documents",
    "hybrid_search", "pipe_curate", "pipe_epoch_shuffle",
    "zorder_cluster", "events_variant", "lateral_top_orders",
    "lineitem_unpivot",
]


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "py_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython", plan)
        ),
        "map_arrow": len(re.findall(r"MapInArrow|MapInPandas", plan)),
        "scans": len(re.findall(r"Scan parquet|BatchScan", plan)),
        "window": len(re.findall(r"\bWindow\b", plan)),
        "agg": len(re.findall(r"HashAggregate|SortAggregate", plan)),
    }


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE

    os.environ.setdefault("SPARK_MASTER", f"local[{CPUS}]")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    from nebuia_vector_db_spark import queries as Q
    from nebuia_vector_db_spark.session import get_spark

    spark = get_spark("nvdb-profile", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    reg = Q.queries()
    st = spark.sparkContext.statusTracker()

    plans_dir = os.path.join(
        REPO, "plans", os.environ.get("PROFILE_PLANS_ROUND", "r16")
    )
    os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in names:
        fn = reg[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # warmup (also triggers any shared-cache builds, matching the
        # bench's warmup-then-median protocol)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).collect()
        warm = time.perf_counter() - t0

        # jobs-per-run (ADVICE r15: the r15 version computed jobs0 and
        # never used it): run the timed calls under a job group and
        # count the group's job ids — eager driver actions hidden in
        # query CONSTRUCTION (parameter fetches, strategy-pick counts)
        # show up here as extra jobs per run.
        spark.sparkContext.setJobGroup(f"prof_{name}", f"profile:{name}")
        jobs0 = len(st.getJobIdsForGroup(f"prof_{name}") or [])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        jobs_per_run = (
            len(st.getJobIdsForGroup(f"prof_{name}") or []) - jobs0
        ) / 3.0
        spark.sparkContext.setJobGroup(
            f"prof_{name}_done", f"profile:{name}:done"
        )

        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        stats = plan_stats(plan)
        out[name] = {
            "collect_med": round(med, 4),
            "collect_warm": round(warm, 4),
            "jobs_per_run": round(jobs_per_run, 1),
            **stats,
        }
        print(
            f"{name:28s} {med:7.3f}s (warm {warm:6.3f})  "
            f"jobs={jobs_per_run:.1f} "
            f"ex={stats['exchanges']} py={stats['py_eval']} "
            f"arrow={stats['map_arrow']} scans={stats['scans']}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)

    total = round(sum(v["collect_med"] for v in out.values()), 3)
    print(f"TOTAL (median collects): {total}s")
    with open(f"/tmp/profile_{tag}.json", "w") as fh:
        json.dump({"total": total, "queries": out}, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
