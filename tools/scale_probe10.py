"""Second-decade scale probe: sf1 -> sf10 slopes for the queries whose
round-9 sf0.1 -> sf1 slope was >= 8, where one decade cannot separate
linear from mildly super-linear (VERDICT r9 item 4). Also re-probes the
two round-10 bounded-sample reformulations (label_noise_knn,
dedup_embedding_cosine) across all three scales to evidence the fix.

Build the corpus first:
    python tools/make_scale_probe.py                       # sf0.1 -> sf1
    python tools/make_scale_probe.py .scale_probe/sf1 .scale_probe/sf10

Writes /root/repo/.scale_probe/results_sf10.json (resumable).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from history_collector_spark import registry
from history_collector_spark.session import get_spark

# the round-9 slope>=8 cohort (VERDICT r9 "what's missing" #3 list)
PROBE = [
    "scalar_pack",
    "posexplode_opindex",
    "text_fingerprint",
    "dedup_edit_distance",
    "hard_negative_mining",
    "zip_join_oppairs",
    "dedup_prefix_filter",
    "ann_ivf_nprobe_sweep",
    "text_gopher_signals",
    # round-10 reformulated audits: expect flat-to-linear now
    "label_noise_knn",
    "dedup_embedding_cosine",
    # round-11 cohort (VERDICT r10 item 3): the six remaining
    # first-decade slope>=8 rows that had no second-decade row —
    # round 10 proved one decade hides real quadratics (3 of 9
    # probed rows were genuinely super-linear)
    "dedup_semantic",
    "multimodal_video_shot_boundaries",
    "ann_ivf_topk",
    "text_rouge_l",
    "explode_txset",
    "dedup_exact_substring",
]

RESULTS_PATH = "/root/repo/.scale_probe/results_sf10.json"
DIRS = {
    "sf1": "/root/repo/.scale_probe/sf1",
    "sf10": "/root/repo/.scale_probe/sf10",
}


def main():
    spark = get_spark()
    registry.load_all()
    # warm the JVM + page cache so the first measured cell doesn't
    # absorb codegen/classloading cost (observed: scalar_pack's first
    # sf1 run read 6.7s vs 0.6s warmed — enough to invert a slope)
    for d in DIRS.values():
        spark.read.parquet(f"{d}/orders.parquet").count()
        spark.read.parquet(f"{d}/documents.parquet").count()
    results = {}
    if os.path.exists(RESULTS_PATH):
        with open(RESULTS_PATH) as f:
            results = json.load(f)
    todo = sys.argv[1:] or PROBE
    for name in todo:
        if name in results:
            continue
        fn = registry.QUERIES[name]
        row = {}
        try:
            for sf, d in DIRS.items():
                # min-of-2: the round-9 single-shot sweep recorded a
                # 13.7s sf1 cell for a query that measures 0.6s warmed
                # (GC/JIT spike), flagging a scan-bound query as x10;
                # noop sink measures the distributed plan, not driver
                # collect
                best = None
                for _ in range(2):
                    t0 = time.time()
                    fn(spark, d).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                row[sf] = round(best, 2)
            row["slope"] = round(row["sf10"] / row["sf1"], 1)
        except Exception as ex:
            row["err"] = f"{type(ex).__name__}: {str(ex)[:200]}"
        results[name] = row
        with open(RESULTS_PATH, "w") as f:
            json.dump(results, f, indent=1)
        if "err" in row:
            print(f"{name:35s} ERR {row['err'][:90]}", flush=True)
        else:
            print(
                f"{name:35s} {row['sf1']:8.2f} {row['sf10']:9.2f} "
                f"x{row['slope']}",
                flush=True,
            )
    print("DONE")


if __name__ == "__main__":
    main()
