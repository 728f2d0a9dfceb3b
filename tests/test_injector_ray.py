"""Ray-level injector tests: rate contract, parallelism-independence,
byte-identity invariant over Datasets (FIXTURES.md F5)."""

import numpy as np
import pandas as pd

from rayrl import pipeline, synth

N = 8000
SEED = 11


def _sorted_df(ds):
    df = ds.to_pandas()
    return df.sort_values("row_uid").reset_index(drop=True)


def test_rate_contract_and_parallelism_independence(ray_session):
    specs = pipeline.benchmark_specs(0.10)
    clean_1 = synth.pages_dataset(N, override_num_blocks=1)
    clean_8 = synth.pages_dataset(N, override_num_blocks=8)

    out_1 = pipeline.mess_dataset(clean_1, specs, seed=SEED, batch_size=N)
    out_8 = pipeline.mess_dataset(clean_8, specs, seed=SEED, batch_size=512)

    d1, l1 = _sorted_df(out_1.dirty), out_1.ledger.to_pandas()
    d8, l8 = _sorted_df(out_8.dirty), out_8.ledger.to_pandas()

    # identical dirty table + ledger regardless of partitioning/batching
    pd.testing.assert_frame_equal(d1, d8)
    key = ["record_id", "field", "error", "seq"]
    pd.testing.assert_frame_equal(
        l1.sort_values(key).reset_index(drop=True), l8.sort_values(key).reset_index(drop=True)
    )

    # realized distinct-id rate within ±25% of the 10% target
    # (full-precision targeting is the calibration loop's job)
    rate = l1["record_id"].nunique() / N
    assert 0.075 <= rate <= 0.125, rate


def test_calibration_hits_target(ray_session):
    clean = synth.pages_dataset(N, override_num_blocks=4)
    base = pipeline.benchmark_specs(0.05)
    specs, realized = pipeline.calibrate_rate(clean, base, 0.05, seed=SEED, sample_rows=N)
    assert realized >= 0.05
    assert realized <= 0.05 * 1.5


def test_rate_sweep_1_to_30_pct(ray_session):
    clean = synth.pages_dataset(N, override_num_blocks=4).materialize()
    for target in (0.01, 0.10, 0.30):
        out = pipeline.mess_dataset(clean, pipeline.benchmark_specs(target), seed=SEED)
        rate = pipeline.calc_perc_id_err(out.ledger, N)
        assert abs(rate - target) <= 0.3 * target + 0.005, (target, rate)
