"""CLI entry point — the ``ray job submit`` surface of the north rule.

Usage (local or against a cluster address in RAY_ADDRESS):

    ray job submit -- python -m rayrl.cli er-benchmark \
        --n-pages 200000 --rate 0.10 --out /tmp/er_run
    python -m rayrl.cli er-benchmark --n-pages 20000 --rate 0.3 --out /tmp/er

Runs the checkpointed end-to-end benchmark (synth → inject → linkage →
metrics); a rerun with the same parameters resumes from the completed
stages (rayrl.checkpoint)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="rayrl")
    sub = parser.add_subparsers(dest="cmd", required=True)

    er = sub.add_parser("er-benchmark", help="checkpointed inject + linkage benchmark")
    er.add_argument("--n-pages", type=int, default=20_000)
    er.add_argument("--rate", type=float, default=0.10)
    er.add_argument("--seed", type=int, default=7)
    er.add_argument("--out", required=True, help="checkpoint/output directory")
    er.add_argument("--num-buckets", type=int, default=64)

    inj = sub.add_parser("inject", help="error-inject a parquet pages table")
    inj.add_argument("--input", required=True, help="parquet path of pages")
    inj.add_argument("--spec", help="error_table CSV (default: benchmark specs)")
    inj.add_argument("--rate", type=float, default=0.10)
    inj.add_argument("--seed", type=int, default=7)
    inj.add_argument("--out", required=True)

    pk = sub.add_parser(
        "pack-corpus",
        help="checkpointed sequence packing of a documents dir (resumable)",
    )
    pk.add_argument("--sf-dir", required=True, help="dir containing documents.parquet")
    pk.add_argument("--budget", type=int, default=2048)
    pk.add_argument("--range-bits", type=int, default=12)
    pk.add_argument("--out", required=True, help="checkpoint/output directory")

    sc = sub.add_parser(
        "score-corpus",
        help="checkpointed per-doc scorecard (lang/quality/repetition/PII), resumable",
    )
    sc.add_argument("--sf-dir", required=True, help="dir containing documents.parquet")
    sc.add_argument("--redact", action="store_true", help="include redacted text column")
    sc.add_argument("--out", required=True, help="checkpoint/output directory")

    tf = sub.add_parser(
        "train-filter",
        help="checkpointed quality-classifier training (features stage + "
        "per-iteration weight checkpoints + scored output), resumable",
    )
    tf.add_argument("--sf-dir", required=True, help="dir containing documents.parquet")
    tf.add_argument("--target-lang", default="en")
    tf.add_argument("--iters", type=int, default=12)
    tf.add_argument("--out", required=True, help="checkpoint/output directory")

    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    try:
        if args.cmd == "er-benchmark":
            from .checkpoint import run_er_benchmark
            from .linkage import LinkageConfig

            res = run_er_benchmark(
                args.out,
                n_pages=args.n_pages,
                rate=args.rate,
                seed=args.seed,
                cfg=LinkageConfig(num_buckets=args.num_buckets),
            )
            print(json.dumps({k: float(v) for k, v in res["metrics"].items() if k != "run"}))
        elif args.cmd == "inject":
            from . import pipeline

            specs = (
                pipeline.load_specs(args.spec)
                if args.spec
                else pipeline.benchmark_specs(args.rate)
            )
            clean = ray.data.read_parquet(args.input)
            out = pipeline.mess_dataset(clean, specs, seed=args.seed)
            manifest = pipeline.checkpoint_combined(out, args.out)
            print(json.dumps(manifest))
        elif args.cmd == "pack-corpus":
            from .checkpoint import Run
            from .packing import pack_assignments, packed_texts

            run = Run(args.out)
            params = {
                "sf_dir": args.sf_dir,
                "budget": args.budget,
                "range_bits": args.range_bits,
            }
            # resumed means "the cached stage was actually REUSED":
            # a manifest written under different params hash-mismatches
            # and forces a full rebuild (r5 review)
            resumed = run.load("assignments", params) is not None
            assign = run.stage(
                "assignments",
                params,
                lambda: pack_assignments(args.sf_dir, args.budget, args.range_bits),
            )
            packs = run.stage(
                "packs",
                params,
                lambda: packed_texts(args.sf_dir, args.budget, args.range_bits),
            )
            summary = {
                "docs": assign.count(),
                "packs": packs.count(),
                "assignments": run.manifest("assignments")["rows"],
                "resumed": resumed,
            }
            run.write_result("summary", summary)
            print(json.dumps(summary))
        elif args.cmd == "score-corpus":
            from .checkpoint import Run
            from .text import score_corpus_ds

            run = Run(args.out)
            params = {"sf_dir": args.sf_dir, "redact": bool(args.redact)}
            resumed = run.load("scores", params) is not None  # params-hash aware
            scores = run.stage(
                "scores",
                params,
                lambda: score_corpus_ds(
                    ray.data.read_parquet(
                        f"{args.sf_dir}/documents.parquet", columns=["doc_id", "text"]
                    ),
                    redact=args.redact,
                ),
            )
            n_docs = scores.count()
            n_pii = scores.filter(
                expr="n_email > 0 or n_ipv4 > 0 or n_phone > 0"
            ).count()
            summary = {"docs": int(n_docs), "pii_docs": int(n_pii), "resumed": resumed}
            run.write_result("summary", summary)
            print(json.dumps(summary))
        elif args.cmd == "train-filter":
            from .mlfilter import train_filter_run

            summary = train_filter_run(
                args.out,
                args.sf_dir,
                target_lang=args.target_lang,
                iters=args.iters,
            )
            print(json.dumps(summary))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
