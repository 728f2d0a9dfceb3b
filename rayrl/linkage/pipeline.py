"""End-to-end linkage driver: clean + dirty Datasets → blocking →
scoring → clustering → pairwise metrics (the Ray-native analogue of
``generate_pairs_for_county`` + evaluation,
/root/reference/benchmarking/utils.R:1282-1360, 997-1047)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Max

from .blocking import LinkageConfig, band_rows
from .clustering import cluster_edges
from .metrics import pairwise_f1
from .scoring import score_blocks


def _nodes_of(ds, side: int):
    def to_nodes(batch: pa.Table) -> pa.Table:
        uids = batch.column("row_uid").to_numpy()
        rids = batch.column("record_id").to_numpy()
        return pa.table(
            {
                "node": pa.array(uids * 2 + side, pa.int64()),
                "truth": pa.array(rids, pa.int64()),
            }
        )

    return ds.select_columns(["row_uid", "record_id"]).map_batches(
        to_nodes, batch_format="pyarrow", zero_copy_batch=True
    )


def link_datasets(clean, dirty, cfg: LinkageConfig | None = None) -> dict:
    """Run the full pipeline; returns dict with ``edges``, ``labels``
    (node, label, truth) and the pairwise metric dict under
    ``metrics``."""
    cfg = cfg or LinkageConfig()
    bands = band_rows(clean, cfg, side=0).union(band_rows(dirty, cfg, side=1))
    edges = score_blocks(bands, cfg).materialize()

    labels = cluster_edges(edges)

    # attach truth to clustered nodes: (node → truth) from the edge ends
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

    from ..shuffle import distinct_rows

    node_truth = distinct_rows(
        edges.map_batches(ends, batch_format="pyarrow", zero_copy_batch=True), ["node"]
    )
    labels_with_truth = labels.join(
        node_truth,
        join_type="inner",
        num_partitions=max(2, labels.num_blocks()),
        on=("node",),
    )

    all_nodes = _nodes_of(clean, 0).union(_nodes_of(dirty, 1))
    metrics = pairwise_f1(labels_with_truth, all_nodes)
    return {"edges": edges, "labels": labels_with_truth, "metrics": metrics}
