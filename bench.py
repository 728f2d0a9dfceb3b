#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) on a fresh ray session with
num_cpus=$RAY_GRAFT_CPUS (default 32) and print ONE JSON line.

--scaling: run the headline job twice in fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same input and report both
throughputs + scaling efficiency = (t8/t32)/4 (the sandbox stand-in for
N vs 4N nodes — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    default_shuffle = ctx.shuffle_strategy

    from rayrl import pipeline, synth
    from rayrl.linkage import LinkageConfig, link_datasets
    import __ray_entry__ as entry_mod

    # bench at 3× the correctness-fixture scale so compute dominates
    # the fixed per-stage orchestration cost (sf0.1 → 600k pages);
    # GRAFT_BENCH_PAGES overrides (the --scaling run uses the
    # FIXTURES.md bench scale of 2M rows)
    n_pages = int(os.environ.get("GRAFT_BENCH_PAGES", entry_mod._n_pages(sf_dir) * 3))

    # warm the OS page cache (untimed) so we measure compute, not cold reads
    ray.data.read_parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    t0 = time.perf_counter()
    clean = synth.pages_dataset(n_pages).materialize()
    timings["synth"] = round(time.perf_counter() - t0, 3)

    from rayrl.errors import strip_ledger

    cfg = LinkageConfig(num_buckets=max(64, num_cpus * 4))

    # hash-partitioned shuffles beat the sort-based default ~1.4× for
    # the linkage pipeline's bucketed groupbys (scoped to the headline:
    # small-key groupbys and the ANN top-k do better on the default)
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE

    # min-of-N warm repetitions (default 3); the sandbox VM shows ±40%
    # steal-time jitter on short runs — the min is the compute signal
    n_reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    best_inject, best_linkage = None, None
    for _ in range(n_reps):
        t0 = time.perf_counter()
        combined = pipeline.mess_dataset(
            clean, pipeline.benchmark_specs(0.10), seed=7, batch_size=8192
        ).combined.materialize()
        t_inject = time.perf_counter() - t0

        dirty = strip_ledger(combined).materialize()

        t0 = time.perf_counter()
        res = link_datasets(clean, dirty, cfg)
        t_linkage = time.perf_counter() - t0
        if best_linkage is None or t_inject + t_linkage < best_inject + best_linkage:
            best_inject, best_linkage = t_inject, t_linkage
            best_res = res

    timings["inject"] = round(best_inject, 3)
    timings["linkage"] = round(best_linkage, 3)
    extras["inject_rows_per_sec"] = round(n_pages / best_inject, 1)
    extras["linkage_phases"] = best_res["timings"]
    res = best_res
    f1 = res["metrics"]["f1"]

    # distinct candidate pairs scored (each scored exactly once)
    pairs_scored = res["n_candidates"]
    extras["pairs_scored"] = int(pairs_scored)
    extras["pairs_scored_per_sec"] = round(pairs_scored / timings["linkage"], 1)
    extras["f1"] = round(float(f1), 5)

    ctx.shuffle_strategy = default_shuffle

    # --- operator queries over the sf tables (min-of-reps like the
    # headline: 1-rep numbers on this VM measure steal windows, not
    # the engine — see BASELINE.md's jitter notes) ---
    for qname in (
        "pricing_summary",
        "token_frequencies",
        "dedup_exact",
        "events_hourly",
        "ann_topk",
        "sessionized_events",
        "order_price_quantiles",
        "tfidf_top_terms",
        "pack_assignments",
        "user_event_windows",
        "ranked_orders",
        "repetition_scores",
        "contaminated_docs",
        "corpus_pipeline",
        "inverted_index",
        "dsir_logratio",
        "duplicated_spans",
        "paragraph_deduped",
        "quality_classifier",
        "bm25_topk",
        "chunk_documents",
        "rag_topk",
        "bpe_token_counts",
        "ann_pq_topk",
        "shuffled_documents",
        "canonical_documents",
        "surprisal_weighted_sample",
        "curriculum_buckets",
        "lang_top_terms",
        "soft_dedup_weights",
        "table_quality_report",
        "c4_filtered",
        "corpus_splits",
    ):
        fn = entry_mod.queries()[qname]
        best = None
        for _ in range(n_reps):
            t0 = time.perf_counter()
            out = fn(sf_dir)
            if hasattr(out, "materialize"):
                out.materialize()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[qname] = round(best, 3)

    total = timings["inject"] + timings["linkage"]
    result = {
        "metric": "e2e_inject_plus_linkage_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_pages": n_pages,
        **extras,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    # the scaling measurement runs at 2M pages (FIXTURES.md bench
    # scale): at 600k the ~10 s of serial driver tail plus the VM's
    # minutes-long steal windows dominate the 32-cpu time and the
    # efficiency ratio measures noise, not the engine. 2 in-session
    # reps per level (min) keep the wall-clock sane.
    def run_once(ncpu: int, reps: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_PAGES=os.environ.get("GRAFT_SCALING_PAGES", "2000000"),
            GRAFT_BENCH_REPS=os.environ.get("GRAFT_SCALING_REPS", str(reps)),
        )
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__) or ".", "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # one fresh process per level; inside each, bench.py measures two
    # repetitions and reports the warm one (warm-worker reps are where
    # the sandbox VM's ±40% steal-time jitter dies down)
    run = run_once

    # levels configurable (N and 4N). Default 4→16: on this single
    # 32-core box the num_cpus=32 level has zero headroom for the
    # driver, raylet, GCS and the host's own steal, so its time
    # measures contention, not the engine (measured: identical 32-cpu
    # runs spread 26–82 s); 4→16 keeps the same 4× factor with both
    # levels below the machine. 8→32 numbers are reported alongside in
    # BASELINE.md.
    lo = int(os.environ.get("GRAFT_SCALING_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "16"))
    # CLAUDE.md rule-5 steal-escape protocol, now the code's default
    # (r5 review — it used to be lo-first / 2 reps, relying on the
    # operator to override): HI leg FIRST (a steal window starting
    # mid-run then lands on the slower lo leg, where its relative
    # damage is smaller), min-of-3 reps @ hi, min-of-2 @ lo (lo reps
    # are 4× the wall-clock each; GRAFT_SCALING_REPS overrides both).
    r_hi = run(hi, 3)
    r_lo = run(lo, 2)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "pairs_per_sec_lo": r_lo["pairs_scored_per_sec"],
        "pairs_per_sec_hi": r_hi["pairs_scored_per_sec"],
        "inject_rows_per_sec_lo": r_lo["inject_rows_per_sec"],
        "inject_rows_per_sec_hi": r_hi["inject_rows_per_sec"],
        "linkage_phases_lo": r_lo["linkage_phases"],
        "linkage_phases_hi": r_hi["linkage_phases"],
        "sf": r_hi["sf"],
        "n_pages": r_hi["n_pages"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
