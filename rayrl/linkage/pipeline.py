"""End-to-end linkage driver: clean + dirty Datasets → blocking →
candidate pairs → scoring → clustering → pairwise metrics (the
Ray-native analogue of ``generate_pairs_for_county`` + evaluation,
/root/reference/benchmarking/utils.R:1282-1360, 997-1047)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..shuffle import distinct_rows
from .blocking import LinkageConfig, band_rows_from_payload, node_payload
from .clustering import cluster_edges
from .metrics import pairwise_f1
from .scoring import candidate_pairs, score_pairs_broadcast, score_pairs_join

# edges below this count run clustering + metrics on the driver in
# numpy; above it the distributed label-propagation path is used
DRIVER_LINKAGE_MAX_EDGES = 5_000_000


def link_datasets(clean, dirty, cfg: LinkageConfig | None = None) -> dict:
    """Run the full pipeline; returns dict with ``edges``, ``labels``
    (node, label, truth), candidate-pair count under ``n_candidates``,
    per-phase timings under ``timings`` and the pairwise metric dict
    under ``metrics``."""
    import time as _time

    timings: dict[str, float] = {}

    def _t(name, t0):
        timings[name] = round(_time.perf_counter() - t0, 3)
        return _time.perf_counter()

    cfg = cfg or LinkageConfig()
    t = _time.perf_counter()
    payload = node_payload(clean, 0, cfg).union(node_payload(dirty, 1, cfg)).materialize()
    n_payload = payload.count()
    t = _t("payload", t)

    # distinct BEFORE scoring: a pair colliding in k bands must be
    # scored once, not k times. Below the index gate the clean side's
    # band rows become broadcast probe-index shards and dirty payload
    # rows fold+probe them (no shuffle at all — the per-batch unique is
    # the exact distinct); above it every band row shuffles (cluster
    # scale). The CLEAN side is counted exactly (one narrow int scan):
    # n_payload // 2 assumed equal sides and mis-routed the gate when
    # clean and dirty differ — e.g. a 2M-clean / 20M-dirty linkage fell
    # to the all-shuffle path the 534 s → 187 s rule exists to avoid
    # (r5 review).
    def _clean_count(batch):
        import pandas as _pd

        n = int((batch.column("node").to_numpy() % 2 == 0).sum())
        return _pd.DataFrame({"n": [n]})

    n_clean = int(
        payload.select_columns(["node"])
        .map_batches(_clean_count, batch_format="pyarrow")
        .sum("n")
        or 0
    )
    n_clean_bands = n_clean * (cfg.char_bands + cfg.word_bands)
    if n_clean_bands <= cfg.broadcast_index_max_entries:
        from .scoring import candidate_pairs_broadcast

        pairs = candidate_pairs_broadcast(payload, cfg).materialize()
    else:
        pairs = candidate_pairs(band_rows_from_payload(payload, cfg), cfg).materialize()
    n_candidates = pairs.count()
    t = _t("candidates", t)

    shard_refs = None
    truth_pairs_ref = None
    if n_payload <= cfg.broadcast_payload_max_rows:
        from .metrics import truth_pairs_from_shards
        from .scoring import payload_shard_refs

        # numpy payload built OFF-driver as parallel shard tasks — the
        # driver's only serial work here is submitting them
        shard_refs = payload_shard_refs(payload)
        # the truth-pair denominator depends only on the payload, so it
        # runs as a Ray task concurrent with the entire score phase
        # instead of a serial collect+unique after clustering
        truth_pairs_ref = truth_pairs_from_shards(shard_refs)
        edges = score_pairs_broadcast(pairs, shard_refs, cfg)
    else:
        edges = score_pairs_join(pairs, payload, cfg)
    edges = edges.materialize()
    t = _t("score", t)

    n_edges = edges.count()
    if n_edges <= DRIVER_LINKAGE_MAX_EDGES:
        # single-node fast path: edges fit on the driver — run
        # clustering, truth attachment and the metric contingency in
        # numpy (no Ray joins / shuffles for the small tail phases;
        # these serial barriers were the Amdahl term killing N→4N
        # scaling). The distributed path below handles cluster scale.
        import pandas as _pd

        from .clustering import _components_arrays
        from .metrics import _pairs_local

        if n_edges:
            edges_df = edges.select_columns(
                ["node_a", "node_b", "truth_a", "truth_b"]
            ).to_pandas()
        else:
            # a zero-edge run (all-clean input, or filters that drop
            # every candidate) yields a SCHEMALESS empty Dataset —
            # rebuild the frame so the numpy tail sees typed empties
            edges_df = _pd.DataFrame(
                {c: _pd.Series([], dtype="int64") for c in ("node_a", "node_b", "truth_a", "truth_b")}
            )
        ea = edges_df["node_a"].to_numpy(dtype=np.int64)
        eb = edges_df["node_b"].to_numpy(dtype=np.int64)
        nodes, labels_arr, inv = _components_arrays(ea, eb)
        # align truth to the unique-node order through the same inverse
        # the component kernel used — no pandas merge (last write wins;
        # every occurrence of a node carries the same truth)
        truth_arr = np.empty(len(nodes), dtype=np.int64)
        truth_arr[inv] = np.concatenate(
            [
                edges_df["truth_a"].to_numpy(dtype=np.int64),
                edges_df["truth_b"].to_numpy(dtype=np.int64),
            ]
        )
        lwt_df = _pd.DataFrame({"node": nodes, "label": labels_arr, "truth": truth_arr})
        t = _t("cluster", t)

        if truth_pairs_ref is not None:  # overlapped with the score phase
            import ray as _ray

            truth_pairs = float(_ray.get(truth_pairs_ref))
        else:
            # this branch means payload > broadcast_payload_max_rows:
            # NEVER collect it driver-side (CLAUDE.md rule 4, r5
            # review) — Σ C(n,2) per truth group reduces to
            # num_buckets scalars distributed
            from ..shuffle import group_sizes_pair_sum

            truth_pairs = group_sizes_pair_sum(
                payload.select_columns(["truth"]), ["truth"]
            )
        cluster_pairs = _pairs_local(lwt_df, ["label"])
        tp = _pairs_local(lwt_df, ["label", "truth"])
        precision = tp / cluster_pairs if cluster_pairs else 1.0
        recall = tp / truth_pairs if truth_pairs else 1.0
        f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
        metrics = {
            "tp_pairs": tp,
            "predicted_pairs": cluster_pairs,
            "truth_pairs": truth_pairs,
            "precision": precision,
            "recall": recall,
            "f1": f1,
        }
        labels_with_truth = ray.data.from_pandas(lwt_df)
        _t("metrics", t)
    else:
        labels = cluster_edges(edges)
        t = _t("cluster", t)

        # attach truth to clustered nodes: (node → truth) from edge ends
        def ends(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": pa.array(
                        np.concatenate(
                            [batch.column("node_a").to_numpy(), batch.column("node_b").to_numpy()]
                        ),
                        pa.int64(),
                    ),
                    "truth": pa.array(
                        np.concatenate(
                            [batch.column("truth_a").to_numpy(), batch.column("truth_b").to_numpy()]
                        ),
                        pa.int64(),
                    ),
                }
            )

        node_truth = distinct_rows(
            edges.map_batches(ends, batch_format="pyarrow", zero_copy_batch=True), ["node"]
        )
        labels_with_truth = labels.join(
            node_truth,
            join_type="inner",
            num_partitions=max(2, labels.num_blocks()),
            on=("node",),
        )
        t = _t("label_join", t)
        all_nodes = payload.select_columns(["node", "truth"])
        metrics = pairwise_f1(labels_with_truth, all_nodes, truth_pairs_ref=truth_pairs_ref)
        _t("metrics", t)

    return {
        "edges": edges,
        "labels": labels_with_truth,
        "metrics": metrics,
        "n_candidates": n_candidates,
        "timings": timings,
    }
