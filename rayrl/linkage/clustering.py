"""Transitive clustering over match edges — distributed union-find via
iterative min-label propagation (north_rule), with a driver-side
union-find fast path for small edge sets.

The reference never clusters transitively (its 1-to-1 resolution,
/root/reference/benchmarking/utils.R:368-389,457-470, is a per-id
grouped filter); transitive closure is required here because duplicate
rows reach the clean original only through the dirty original. Web
duplicate clusters are shallow (star-shaped through the clean record),
so label propagation converges in ~2-3 rounds; rounds are capped and
each round is a checkpointable label table (SURVEY.md §7.5(6)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

DRIVER_UNION_FIND_MAX_EDGES = 2_000_000


def _driver_union_find(edges_df: pd.DataFrame) -> pd.DataFrame:
    """Connected components on the driver: vectorized min-label
    propagation with pointer jumping AND edge contraction between
    rounds. Contraction is the key: after each round, edges are
    relabeled, self-loops dropped, and duplicates uniqued, so the
    star-shaped bulk (clean↔dirty two-node components) vanishes after
    round 1 and later rounds touch only the surviving chain edges —
    measured 3.9 s → 1.4 s at 4.1M edges vs the fixed-edge-set loop
    (and a reduceat scatter-min read 5.97 s; scipy is unavailable
    here). The driver fast path must not become the serial bottleneck
    (Amdahl eats the cluster-size scaling otherwise). Labels
    canonicalize to the component's minimum node id, matching the
    distributed min-label propagation exactly (regression-tested in
    test_round4 and test_linkage's random-graph mirror)."""
    a = edges_df["node_a"].to_numpy(dtype=np.int64)
    b = edges_df["node_b"].to_numpy(dtype=np.int64)
    nodes, label, _ = _components_arrays(a, b)
    return pd.DataFrame({"node": nodes, "label": label})


def _components_arrays(
    a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Array core of ``_driver_union_find``: returns (sorted unique
    nodes, component-min label per node, ``np.unique`` inverse over
    ``concat([a, b])``). Callers that already hold numpy edge arrays
    (the pipeline fast path) use this directly and align per-node
    attributes through the returned inverse (``attr[inv] = edge_attr``)
    instead of a pandas merge."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    n = len(nodes)
    ea, eb = inv[: len(a)], inv[len(a) :]
    label = np.arange(n, dtype=np.int64)
    while len(ea):
        m = np.minimum(label[ea], label[eb])
        np.minimum.at(label, ea, m)
        np.minimum.at(label, eb, m)
        # pointer jumping: labels only ever decrease, so label[label]
        # always points at an equal-or-smaller member of the component
        label = label[label]
        label = label[label]
        label = label[label]
        # contract: relabel the edge set, drop intra-label self-loops,
        # unique the rest — the surviving edge count shrinks
        # geometrically (two-node components die in round 1)
        ea, eb = label[ea], label[eb]
        keep = ea != eb
        ea, eb = ea[keep], eb[keep]
        if len(ea):
            # canonicalize direction before uniquing so (u,v) and (v,u)
            # collapse to one surviving edge
            lo = np.minimum(ea, eb)
            hi = np.maximum(ea, eb)
            packed = np.unique(hi * n + lo)
            ea, eb = packed // n, packed % n
    # final full compression: contraction can terminate with label
    # chains still one jump from the root on the last-merged nodes
    while True:
        nxt = label[label]
        if np.array_equal(nxt, label):
            break
        label = nxt
    # labels are indices into the ascending `nodes` array, so the
    # component minimum index IS the minimum node id
    return nodes, nodes[label], inv


def _propagate_distributed(edges, max_rounds: int) -> "ray.data.Dataset":
    """Min-label propagation: labels(node) = min(label of node, labels of
    neighbors); iterate to fixpoint. Each round is two map_batches + one
    groupby — all shuffles keyed on ``node``."""

    def seed_labels(batch: pa.Table) -> pa.Table:
        a = batch.column("node_a").to_numpy()
        b = batch.column("node_b").to_numpy()
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b, a, b]), pa.int64()),
                "label": pa.array(np.concatenate([b, a, a, b]), pa.int64()),
            }
        )

    from ..shuffle import group_agg

    labels = group_agg(
        edges.map_batches(seed_labels, batch_format="pyarrow", zero_copy_batch=True),
        ["node"],
        {"label": ("label", "min")},
    ).materialize()
    bidir = edges.map_batches(
        lambda t: pa.table(
            {
                "src": pa.array(
                    np.concatenate([t.column("node_a").to_numpy(), t.column("node_b").to_numpy()]),
                    pa.int64(),
                ),
                "dst": pa.array(
                    np.concatenate([t.column("node_b").to_numpy(), t.column("node_a").to_numpy()]),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        # neighbor messages: join labels onto edge sources
        msgs = bidir.join(
            labels.map_batches(lambda t: t.rename_columns(["src", "label"]), batch_format="pyarrow"),
            join_type="inner",
            num_partitions=max(2, bidir.num_blocks()),
            on=("src",),
        ).select_columns(["dst", "label"]).map_batches(
            lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow"
        )
        # materialized: consumed as BOTH the pointer-jump join's left
        # side and (renamed) the label_map — unmaterialized, the
        # min-label shuffle (plus the union/msgs join feeding it) would
        # execute twice per round (r5 review)
        labels = group_agg(
            labels.union(msgs), ["node"], {"label": ("label", "min")}
        ).materialize()
        # pointer jumping (label ← label[label]): every label value is
        # itself a node (self-rows are seeded), so one self-join hop
        # doubles the propagation distance — rounds scale with
        # log2(component diameter), not the diameter itself
        label_map = labels.map_batches(
            lambda t: t.rename_columns(["label", "label_next"]), batch_format="pyarrow"
        )
        labels = (
            labels.join(
                label_map,
                join_type="inner",
                num_partitions=max(2, bidir.num_blocks()),
                on=("label",),
            )
            .select_columns(["node", "label_next"])
            .map_batches(lambda t: t.rename_columns(["node", "label"]), batch_format="pyarrow")
            .materialize()
        )
        s = labels.sum("label")
        if prev_sum is not None and s == prev_sum:
            converged = True
            break  # labels are non-increasing ⇒ equal sum = fixpoint
        prev_sum = s
    if not converged:
        import logging

        logging.getLogger(__name__).warning(
            "label propagation hit max_rounds=%d without a verified fixpoint; "
            "components wider than 2^%d hops may carry split labels",
            max_rounds,
            max_rounds,
        )
    return labels


def cluster_edges(edges, max_rounds: int = 10) -> "ray.data.Dataset":
    """edges Dataset (node_a, node_b, ...) → labels Dataset
    (node, label); label = min node id of the connected component."""
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"node": pd.Series([], dtype="int64"), "label": pd.Series([], dtype="int64")})
        )
    if n_edges <= DRIVER_UNION_FIND_MAX_EDGES:
        df = edges.select_columns(["node_a", "node_b"]).to_pandas()
        return ray.data.from_pandas(_driver_union_find(df))
    return _propagate_distributed(edges.select_columns(["node_a", "node_b"]), max_rounds)
