"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in rayrl) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship record-linkage benchmark on a deterministic
  pages fixture sized from /root/testdata/sf0.001 — inject errors at
  10%, block/score/cluster, return the pairwise metrics row.
- ``queries()``: one callable per implemented operator (SURVEY.md §2);
  each takes ``sf_dir``.
- ``oracle_sql()``: DuckDB equivalents for the SQL-expressible ops.
  ER/linkage/LSH ops are intentionally absent (non-SQL semantics) →
  driver records rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd
import pyarrow.parquet as pq


def _n_pages(sf_dir: str) -> int:
    """Deterministic fixture size per scale: lineitem rows // 3
    (sf0.001 → 2k, sf0.01 → 20k, sf0.1 → 200k pages)."""
    return max(2000, pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows // 3)


def _clean_pages(sf_dir: str):
    from rayrl import synth

    return synth.pages_dataset(_n_pages(sf_dir))


def _dirty_combined(sf_dir: str, rate: float = 0.10):
    from rayrl import pipeline

    return pipeline.mess_dataset(_clean_pages(sf_dir), pipeline.benchmark_specs(rate), seed=7)


def er_dirty_pages(sf_dir: str):
    """Dirty copy of the pages fixture at 10% error rate."""
    return _dirty_combined(sf_dir).dirty


def er_ledger(sf_dir: str):
    """Ground-truth error ledger for the same run."""
    return _dirty_combined(sf_dir).ledger


def er_error_rate(sf_dir: str):
    """Realized distinct-id error rate (calc_perc_id_err analogue)."""
    from rayrl import pipeline

    n = _n_pages(sf_dir)
    rate = pipeline.calc_perc_id_err(_dirty_combined(sf_dir).ledger, n)
    return pd.DataFrame({"n_rows": [n], "distinct_err_rate": [round(rate, 4)]})


def er_linkage_metrics(sf_dir: str):
    """End-to-end blocking → scoring → clustering → pairwise F1 at 10%
    error (the north-rule headline)."""
    from rayrl.linkage import LinkageConfig, link_datasets

    clean = _clean_pages(sf_dir).materialize()
    dirty = _dirty_combined(sf_dir).dirty.materialize()
    m = link_datasets(clean, dirty, LinkageConfig())["metrics"]
    return pd.DataFrame([{k: round(float(v), 6) for k, v in m.items()}])


def multimodal_features(sf_dir: str):
    """Byte-level media features over the pages html payload (decode
    stubbed — see rayrl.multimodal)."""
    from rayrl.multimodal import media_features

    return media_features(_clean_pages(sf_dir).select_columns(["record_id", "html"]))


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001."""
    return er_linkage_metrics("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from rayrl.ann import ANN_QUERIES
    from rayrl.dedup import DEDUP_QUERIES
    from rayrl.relational import QUERIES as REL_QUERIES
    from rayrl.text import TEXT_QUERIES

    out: dict[str, Callable[[str], Any]] = {}
    out.update(REL_QUERIES)
    out.update(TEXT_QUERIES)
    out.update(DEDUP_QUERIES)
    out.update(ANN_QUERIES)
    out.update(
        {
            "er_dirty_pages": er_dirty_pages,
            "er_ledger": er_ledger,
            "er_error_rate": er_error_rate,
            "er_linkage_metrics": er_linkage_metrics,
            "multimodal_features": multimodal_features,
        }
    )
    return out


def oracle_sql() -> dict[str, str]:
    from rayrl.ann import ANN_TOPK_ORACLE
    from rayrl.relational import ORACLES as REL_ORACLES
    from rayrl.text import TEXT_ORACLES

    out: dict[str, str] = {}
    out.update(REL_ORACLES)
    out.update(TEXT_ORACLES)
    out["ann_topk"] = ANN_TOPK_ORACLE
    return out
