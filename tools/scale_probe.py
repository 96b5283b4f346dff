"""Measured 10x scale probe: run queries at sf0.1 and at the synthetic
sf1 (tools/make_scale_probe.py), report wall seconds and the measured
slope t(sf1)/t(sf0.1). Linear work => slope ~10 with a floor from fixed
overheads; anything clearly super-linear needs a fix or an explanation
in SCALING.md.

Round 8 probed the 26 slowest/rewritten families; round 9 extends the
sweep to EVERY registered query (resumable — rerun after a crash and it
picks up where it left off). With no argv the todo list is every
registered-but-unmeasured query, fastest-first by the latest
BENCH_FULL.json sf0.1 time so results accumulate early. Queries that
raise (e.g. the documented work-budget refusal guards firing on the
10x corpus) are recorded with an "err" field instead of aborting the
sweep."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from history_collector_spark import registry
from history_collector_spark.session import get_spark

PROBE = [
    "cross_source_contamination", "bootstrap_mean_ci", "ewma_smoothing",
    "graph_pagerank_dups", "dedup_edit_distance", "dedup_prefix_filter",
    "pipeline_parity", "dedup_containment", "ann_pq_adc_topk",
    "dedup_minhash_lsh", "heavy_hitter_tokens",
    "tpch_q21_waiting_supplier", "star_schema_revenue",
    "streaming_ewma_e2e", "streaming_scd2_cdc_e2e",
    # round-8 rewrites
    "customer_migration_matrix", "curation_curriculum_phases",
    "lineitem_weighted_median", "customer_spend_gini",
    "assign_global_ids", "curation_sequence_pack",
    "curation_class_balance", "retrieval_rrf_fusion",
    "dedup_cluster_representative", "multimodal_decode_jpeg",
    # last: positional index over a 10x-deep clone corpus is the
    # probe's heaviest cell — don't let it block the rest
    "dedup_exact_substring",
]


RESULTS_PATH = "/root/repo/.scale_probe/results.json"


def _default_todo(results):
    """All registered queries not yet measured, fastest-first by the
    latest full-bench sf0.1 time (unknowns last)."""
    bench = {}
    try:
        with open("/root/repo/BENCH_FULL.json") as f:
            bench = json.load(f).get("queries", {})
    except Exception:
        pass
    names = [n for n in registry.QUERIES if n not in results]
    return sorted(names, key=lambda n: bench.get(n, 1e9))


def main():
    spark = get_spark()
    registry.load_all()
    dirs = {"sf0.1": "/root/testdata/sf0.1",
            "sf1": "/root/repo/.scale_probe/sf1"}
    results = {}
    if os.path.exists(RESULTS_PATH):
        with open(RESULTS_PATH) as f:
            results = json.load(f)
    todo = sys.argv[1:] or _default_todo(results)
    for name in todo:
        if name in results:  # resumable: crash-safe across sessions
            continue
        fn = registry.QUERIES[name]
        row = {}
        try:
            for sf, d in dirs.items():
                best = None
                # min-of-2 damps JIT/GC noise; single run at sf1 for
                # queries already >5s at sf0.1 (noise is relatively
                # small there and the second run is expensive)
                n_runs = 1 if sf == "sf1" and row.get("sf0.1", 0) > 5 else 2
                for _ in range(n_runs):
                    t0 = time.time()
                    # noop sink (same as bench.py): measures the
                    # distributed plan, not driver-side collect()
                    # materialization — a 24M-row unpivot at sf1 spent
                    # most of its wall in driver deserialization under
                    # collect(), reading as a fake x17 slope
                    fn(spark, d).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                row[sf] = round(best, 2)
            row["slope"] = round(row["sf1"] / row["sf0.1"], 1)
        except Exception as ex:  # refusal guards / sf1-only failures
            row["err"] = f"{type(ex).__name__}: {str(ex)[:200]}"
        results[name] = row
        with open(RESULTS_PATH, "w") as f:
            json.dump(results, f, indent=1)
        if "err" in row:
            print(f"{name:35s} ERR {row['err'][:80]}", flush=True)
        else:
            print(f"{name:35s} {row['sf0.1']:7.2f} {row['sf1']:8.2f} "
                  f"x{row['slope']}", flush=True)
    done = sum(1 for r in results.values() if "slope" in r)
    errs = sum(1 for r in results.values() if "err" in r)
    print(f"DONE: {done} measured, {errs} errored, "
          f"{len(registry.QUERIES) - len(results)} remaining")


if __name__ == "__main__":
    main()
