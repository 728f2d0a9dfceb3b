"""Checkpoint/resume tests (manifest invalidation, crash recovery,
end-to-end resumable benchmark)."""

import json
import os
import shutil

import pytest

import ray.data

from rayrl import checkpoint


def test_stage_runs_once_and_resumes(ray_session, tmp_path):
    run = checkpoint.Run(str(tmp_path / "run"))
    calls = []

    def build():
        calls.append(1)
        return ray.data.range(100)

    ds1 = run.stage("numbers", {"n": 100}, build)
    assert ds1.count() == 100
    ds2 = run.stage("numbers", {"n": 100}, build)
    assert ds2.count() == 100
    assert len(calls) == 1  # second call resumed from the checkpoint
    mf = run.manifest("numbers")
    assert mf["complete"] and mf["rows"] == 100
    assert sum(p["rows"] for p in mf["partitions"]) == 100


def test_param_change_invalidates(ray_session, tmp_path):
    run = checkpoint.Run(str(tmp_path / "run"))
    calls = []

    def build():
        calls.append(1)
        return ray.data.range(50)

    run.stage("s", {"n": 50}, build)
    run.stage("s", {"n": 51}, build)  # different params ⇒ rebuild
    assert len(calls) == 2


def test_incomplete_checkpoint_ignored(ray_session, tmp_path):
    root = tmp_path / "run"
    run = checkpoint.Run(str(root))
    run.stage("s", {"n": 10}, lambda: ray.data.range(10))
    # simulate a crash that corrupted the manifest
    mf_path = root / "s" / checkpoint.MANIFEST
    mf = json.loads(mf_path.read_text())
    mf["complete"] = False
    mf_path.write_text(json.dumps(mf))
    calls = []

    def rebuild():
        calls.append(1)
        return ray.data.range(10)

    run.stage("s", {"n": 10}, rebuild)
    assert len(calls) == 1


def test_er_benchmark_resumable(ray_session, tmp_path):
    out = str(tmp_path / "er")
    res1 = checkpoint.run_er_benchmark(out, n_pages=1500, rate=0.1)
    assert res1["metrics"]["f1"] >= 0.99
    # wipe only the edges stage → rerun recomputes edges, reuses the rest
    shutil.rmtree(os.path.join(out, "edges"))
    res2 = checkpoint.run_er_benchmark(out, n_pages=1500, rate=0.1)
    assert abs(res2["metrics"]["f1"] - res1["metrics"]["f1"]) < 1e-9
    # full resume: nothing recomputed, metrics read from disk
    res3 = checkpoint.run_er_benchmark(out, n_pages=1500, rate=0.1)
    assert res3["metrics"]["f1"] == pytest.approx(res1["metrics"]["f1"])
    # return shape identical on fresh and resumed paths
    assert set(res3["metrics"]) == set(res1["metrics"])
    assert "n_candidates" not in res3["metrics"] and res3["n_candidates"] == res1["n_candidates"]


def test_er_benchmark_resume_survives_missing_metrics(ray_session, tmp_path):
    """Crash window: edges manifest sealed but metrics.json never
    written. A resumed run must still return metrics (from the manifest
    counters), not raise FileNotFoundError."""
    out = str(tmp_path / "er2")
    res1 = checkpoint.run_er_benchmark(out, n_pages=1500, rate=0.1)
    os.remove(os.path.join(out, "metrics.json"))
    res2 = checkpoint.run_er_benchmark(out, n_pages=1500, rate=0.1)
    assert res2["metrics"]["f1"] == pytest.approx(res1["metrics"]["f1"])
    assert os.path.exists(os.path.join(out, "metrics.json"))


def test_er_benchmark_resume_legacy_manifest(ray_session, tmp_path):
    """A pre-counter edges manifest (no metrics inside) triggers the
    recompute-from-edges fallback with the same F1."""
    out = str(tmp_path / "er3")
    res1 = checkpoint.run_er_benchmark(out, n_pages=1500, rate=0.1)
    mf_path = os.path.join(out, "edges", checkpoint.MANIFEST)
    mf = json.loads(open(mf_path).read())
    mf["counters"] = {}
    open(mf_path, "w").write(json.dumps(mf))
    os.remove(os.path.join(out, "metrics.json"))
    res2 = checkpoint.run_er_benchmark(out, n_pages=1500, rate=0.1)
    assert res2["metrics"]["f1"] == pytest.approx(res1["metrics"]["f1"])
    assert res2["n_candidates"] == -1  # honestly unknown on this path
