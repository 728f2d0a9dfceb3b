"""Per-stage Parquet checkpointing with manifest-based resume.

The reference's only resume mechanism is file-existence checks per
county shard (/root/reference/benchmarking/standard_n.R:12-40) plus
per-phase write_rds (paper_flow_dob_latest.Rmd:91-97). The Parquet-
native generalization here: every stage writes a directory of part
files plus a ``_MANIFEST.json`` carrying a hash of the stage's
parameters, row counters, and user counters. A rerun with identical
parameters reads the checkpoint instead of recomputing; a changed
parameter hash invalidates (the stage is rewritten to a fresh tmp dir
and atomically renamed, so a crash mid-write never yields a manifest
without its data)."""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Any, Callable

import pyarrow.parquet as pq

import ray.data

MANIFEST = "_MANIFEST.json"


def params_hash(params: dict[str, Any]) -> str:
    return hashlib.blake2b(
        json.dumps(params, sort_keys=True, default=str).encode(), digest_size=12
    ).hexdigest()


class Run:
    """One checkpointed run rooted at a directory."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def load(self, name: str, params: dict[str, Any]) -> "ray.data.Dataset | None":
        """Return the stage's Dataset iff a complete checkpoint with
        matching params exists."""
        path = self._stage_dir(name)
        mf_path = os.path.join(path, MANIFEST)
        if not os.path.exists(mf_path):
            return None
        with open(mf_path) as f:
            mf = json.load(f)
        if not mf.get("complete") or mf.get("params_hash") != params_hash(params):
            return None
        return ray.data.read_parquet(path)

    def manifest(self, name: str) -> dict | None:
        mf_path = os.path.join(self._stage_dir(name), MANIFEST)
        if not os.path.exists(mf_path):
            return None
        with open(mf_path) as f:
            return json.load(f)

    def stage(
        self,
        name: str,
        params: dict[str, Any],
        build: Callable[[], "ray.data.Dataset"],
        counters: "dict[str, Any] | Callable[[], dict[str, Any]] | None" = None,
    ) -> "ray.data.Dataset":
        """Run-or-resume one stage. ``build`` is only called on a cache
        miss; its Dataset is written partitioned, the manifest sealed,
        and the checkpoint read back (so downstream stages consume the
        on-disk lineage, not the in-memory plan — a crashed downstream
        rerun starts from here). ``counters`` may be a callable — it is
        evaluated AFTER ``build`` runs, so side outputs of the build
        (metrics, counts) can be sealed into the manifest atomically
        with the data."""
        cached = self.load(name, params)
        if cached is not None:
            return cached
        path = self._stage_dir(name)
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        ds = build()
        ds.write_parquet(tmp)
        rows = 0
        parts = []
        for f in sorted(os.listdir(tmp)):
            if f.endswith(".parquet"):
                n = pq.ParquetFile(os.path.join(tmp, f)).metadata.num_rows
                parts.append({"file": f, "rows": n})
                rows += n
        if not parts:
            # zero-row stage: Ray writes NO files, and the sealed
            # checkpoint would read back SCHEMALESS forever — every
            # resume's first column access would raise (CLAUDE.md rule
            # 21, r5 review). Persist one typed empty file when the
            # build's schema is known; a schemaless build is an
            # upstream bug worth failing loudly on.
            schema = ds.schema()
            if schema is None:
                raise ValueError(
                    f"stage {name!r} produced a schemaless empty Dataset — "
                    "build() must return typed empties (rule 21)"
                )
            import pyarrow as _pa

            types = {
                nm: (t if isinstance(t, _pa.DataType) else _pa.null())
                for nm, t in zip(schema.names, schema.types)
            }
            empty = _pa.table({c: _pa.array([], type=t) for c, t in types.items()})
            pq.write_table(empty, os.path.join(tmp, "empty-0.parquet"))
            parts.append({"file": "empty-0.parquet", "rows": 0})
        if callable(counters):
            counters = counters()
        mf = {
            "stage": name,
            "params_hash": params_hash(params),
            "params": {k: str(v) for k, v in params.items()},
            "rows": rows,
            "partitions": parts,
            "counters": counters or {},
            "written_at": time.time(),
            "complete": True,
        }
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(mf, f, indent=1)
        os.replace(tmp, path)  # atomic publish: manifest + data together
        return ray.data.read_parquet(path)

    def write_result(self, name: str, payload: dict) -> None:
        with open(os.path.join(self.root, f"{name}.json"), "w") as f:
            json.dump(payload, f, indent=1)


def run_er_benchmark(
    out_dir: str,
    n_pages: int,
    rate: float = 0.10,
    seed: int = 7,
    cfg=None,
) -> dict:
    """The flagship pipeline with per-stage checkpoints: synth → inject
    (dirty+ledger) → linkage → metrics. Re-running after a crash skips
    every completed stage (same params ⇒ same hash ⇒ resume)."""
    from . import pipeline, synth
    from .errors import strip_ledger
    from .linkage import LinkageConfig, link_datasets

    cfg = cfg or LinkageConfig()
    run = Run(out_dir)
    base = {"n_pages": n_pages, "seed": 42}
    clean = run.stage("clean_pages", base, lambda: synth.pages_dataset(n_pages))

    inj_params = {**base, "rate": rate, "err_seed": seed}
    combined = run.stage(
        "dirty_combined",
        inj_params,
        lambda: pipeline.mess_dataset(clean, pipeline.benchmark_specs(rate), seed=seed).combined,
    )
    dirty = strip_ledger(combined)

    link_params = {**inj_params, "cfg": cfg}
    res_holder: dict = {}

    def build_edges():
        res = link_datasets(clean, dirty, cfg)
        res_holder.update(res)
        return res["edges"]

    # metrics + n_candidates are sealed into the edges-stage manifest
    # (counters evaluated post-build), so a crash between the edges
    # write and any later step never loses them — a resumed run reads
    # them back from the manifest instead of recomputing
    edges = run.stage(
        "edges",
        link_params,
        build_edges,
        counters=lambda: {
            "metrics": {k: float(v) for k, v in res_holder["metrics"].items()},
            "n_candidates": int(res_holder["n_candidates"]),
        },
    )
    ctrs = (run.manifest("edges") or {}).get("counters", {})
    if "metrics" in ctrs:
        metrics = {k: float(v) for k, v in ctrs["metrics"].items()}
        n_candidates = int(ctrs.get("n_candidates", -1))
    else:  # legacy checkpoint (pre-counter manifests): recompute from
        # the sealed edges + the clean/dirty stages
        metrics = _metrics_from_edges(edges, clean, dirty)
        n_candidates = -1
    run.write_result("metrics", {**metrics, "n_candidates": n_candidates})
    # identical return shape on fresh and resumed paths
    return {"run": run, "edges": edges, "metrics": metrics, "n_candidates": n_candidates}


def _metrics_from_edges(edges, clean, dirty) -> dict:
    """Recompute pairwise metrics from a checkpointed edges table plus
    the clean/dirty page stages (fallback for resumed runs whose edges
    manifest predates metric counters). Driver numpy path — legacy
    checkpoints are bounded by the old driver gate, so edges fit."""
    import numpy as np
    import pandas as pd

    from .linkage.clustering import _driver_union_find
    from .linkage.metrics import _pairs_local

    edges_df = edges.select_columns(["node_a", "node_b", "truth_a", "truth_b"]).to_pandas()
    labels_df = _driver_union_find(edges_df)
    node_truth_df = pd.DataFrame(
        {
            "node": np.concatenate([edges_df["node_a"], edges_df["node_b"]]),
            "truth": np.concatenate([edges_df["truth_a"], edges_df["truth_b"]]),
        }
    ).drop_duplicates("node")
    lwt = labels_df.merge(node_truth_df, on="node", how="inner")

    def truth_of(ds):
        return ds.select_columns(["record_id"]).to_pandas()["record_id"].to_numpy()

    all_truth = np.concatenate([truth_of(clean), truth_of(dirty)])
    truth_pairs = _pairs_local({"truth": all_truth}, ["truth"])
    cluster_pairs = _pairs_local(lwt, ["label"])
    tp = _pairs_local(lwt, ["label", "truth"])
    precision = tp / cluster_pairs if cluster_pairs else 1.0
    recall = tp / truth_pairs if truth_pairs else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp_pairs": float(tp),
        "predicted_pairs": float(cluster_pairs),
        "truth_pairs": float(truth_pairs),
        "precision": float(precision),
        "recall": float(recall),
        "f1": float(f1),
    }
