"""Distributed hashed-feature logistic classifier — the fasttext-style
quality/domain filter of an LLM data pipeline (the CCNet / GPT-3-era
"looks like the reference corpus" classifier: train on a labeled
slice, score every document, keep the high-probability tail).

Reference parity: an added LLM-corpus operator (no rlErrorGeneratoR
counterpart); no SQL oracle (iterative ML) — the driver records a
rows-only check, pytest verifies planted-separable accuracy and
determinism at any parallelism.

Scale shape: the corpus is tokenized exactly ONCE — a featurize pass
materializes per-document sparse features as LIST columns (one row per
doc: label, bucket ids, L1-normalized counts), so a doc's features can
never straddle a batch boundary however later stages re-batch
(CLAUDE.md rule 13 by construction). Each full-batch GD iteration then
broadcasts the (2^n_bits,) weight vector via ``ray.put`` and runs ONE
cheap map_batches pass over the feature rows: gather, residual, and a
``bincount`` scatter emit only the batch's NONZERO gradient buckets as
(bucket, g) rows — a vocabulary-bounded stream. One bucketed reduce
sums them; the driver touches 2^n_bits floats per iteration (512 KB at
n_bits=16). Measured at 500k docs / 32 cpus: re-tokenizing every
iteration read 240 s for 12 iterations; featurize-once reads the
tokenize cost once (~17 s) plus ~1-2 s per iteration.

Determinism at any parallelism (CLAUDE.md rule 6): the reduce's
float64 summation order varies with block arrival, so weights are
ROUNDED to 6 decimals each iteration (the kmeans.py trick) — every
downstream scoring pass sees bit-identical weights.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .bytekernels import content_hash64
from .shuffle import group_agg

N_BITS = 16
ITERS = 12
LR = 2.0

_B_GRAD = -1  # sentinel buckets for the scalar partials
_B_LOSS = -2
_B_COUNT = -3


def _doc_features(batch: pa.Table, text_col: str, n_bits: int):
    """Per-batch sparse features: (doc_idx, bucket, x) with x the
    L1-normalized token count, plus per-doc token lengths."""
    split = pc.split_pattern(batch.column(text_col).combine_chunks(), " ")
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    h = content_hash64(pc.list_flatten(split)).view(np.uint64)
    bucket = (h & np.uint64((1 << n_bits) - 1)).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    # collapse repeated (doc, bucket) pairs
    key = doc_idx * (1 << n_bits) + bucket
    uk, cnt = np.unique(key, return_counts=True)
    d = uk >> n_bits
    b = uk & ((1 << n_bits) - 1)
    x = cnt.astype(np.float64) / np.maximum(lens[d], 1)
    return d, b, x, lens


def _scores(d, b, x, n_docs, w, bias):
    # d is ascending (np.unique key order), so per-doc sums are a
    # cumsum gather over contiguous segments — no np.add.at scatter
    v = w[b] * x
    cs = np.concatenate([[0.0], np.cumsum(v)])
    counts = np.bincount(d, minlength=n_docs)
    ends = np.cumsum(counts)
    starts = ends - counts
    return bias + (cs[ends] - cs[starts])


def featurize_ds(
    ds: "ray.data.Dataset", text_col: str, label_col: str, n_bits: int = N_BITS
) -> "ray.data.Dataset":
    """ONE tokenize pass → per-doc sparse features as LIST columns
    (y, fb=bucket ids, fx=L1-normalized counts). A doc's features ride
    one row, so they stay batch-whole at any later re-batching."""

    def featurize(batch: pa.Table) -> pa.Table:
        d, b, x, _lens = _doc_features(batch, text_col, n_bits)
        counts = np.bincount(d, minlength=batch.num_rows)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        return pa.table(
            {
                "y": batch.column(label_col).cast(pa.int64()),
                "fb": pa.ListArray.from_arrays(offsets, pa.array(b, pa.int32())),
                "fx": pa.ListArray.from_arrays(offsets, pa.array(x, pa.float64())),
            }
        )

    return ds.map_batches(featurize, batch_format="pyarrow", zero_copy_batch=True)


def gd_fit(
    feats: "ray.data.Dataset",
    n_bits: int = N_BITS,
    iters: int = ITERS,
    lr: float = LR,
    driver_reduce_max: int = 50_000_000,
    w: "np.ndarray | None" = None,
    bias: float = 0.0,
    losses: "list[float] | None" = None,
    tol: float = 0.0,
) -> dict:
    """The GD loop over an already-featurized (y, fb, fx) dataset;
    ``w``/``bias``/``losses`` seed a resumed run (cli.py train-filter
    checkpoints weights per iteration). ``tol`` > 0 adds a convergence
    early-exit: stop when the round-6-quantized mean log-loss moves by
    ≤ tol between iterations (deterministic at any parallelism — the
    quantized losses are; VERDICT r4 #6). The checkpointed CLI keeps
    tol=0 so resumed runs stay bit-identical to uninterrupted ones."""
    feats = feats.materialize()
    n_total = feats.count()
    dim = 1 << n_bits
    n_partial_rows = feats.num_blocks() * dim  # worst-case partial stream

    w = np.zeros(dim, dtype=np.float64) if w is None else np.asarray(w, np.float64)
    losses = [] if losses is None else list(losses)
    if n_total == 0:
        # empty featurized corpus (rule 21 — an upstream filter can
        # legally drop every doc): zero gradient, weights unchanged —
        # the schemaless partials frame would KeyError and the bias
        # update divide by zero (r5 review)
        return {"w": w, "bias": bias, "n_bits": n_bits, "losses": losses}

    for _ in range(iters):
        ref = ray.put((w, bias))

        def grad_partial(batch: pa.Table) -> pd.DataFrame:
            w_, b_ = ray.get(ref)
            y = batch.column("y").to_numpy(zero_copy_only=False).astype(np.float64)
            fb = batch.column("fb")
            if isinstance(fb, pa.ChunkedArray):
                fb = fb.combine_chunks()
            fx = batch.column("fx")
            if isinstance(fx, pa.ChunkedArray):
                fx = fx.combine_chunks()
            lens = pc.list_value_length(fb).to_numpy(zero_copy_only=False).astype(np.int64)
            b = pc.list_flatten(fb).to_numpy(zero_copy_only=False).astype(np.int64)
            x = pc.list_flatten(fx).to_numpy(zero_copy_only=False)
            d = np.repeat(np.arange(len(y), dtype=np.int64), lens)
            s = _scores(d, b, x, len(y), w_, b_)
            p = 1.0 / (1.0 + np.exp(-s))
            r = p - y
            g = np.bincount(b, weights=r[d] * x, minlength=dim)
            nz = np.nonzero(g)[0]
            eps = 1e-12
            loss = float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum())
            out_b = np.concatenate([nz, [_B_GRAD, _B_LOSS, _B_COUNT]])
            out_g = np.concatenate([g[nz], [float(r.sum()), loss, float(len(y))]])
            return pd.DataFrame({"bucket": out_b.astype(np.int64), "g": out_g})

        partials = feats.map_batches(
            grad_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        if n_partial_rows <= driver_reduce_max:
            # the partial stream is ≤ blocks·2^n_bits rows — below the
            # gate, skip the shuffle and bincount on the driver (a
            # bucketed reduce costs ~2 s of fixed dispatch per
            # iteration, dominating the 12-iteration loop)
            agg = partials.to_pandas()
            buckets = agg["bucket"].to_numpy()
            gs = agg["g"].to_numpy()
            pos = buckets >= 0
            gvec = np.bincount(
                buckets[pos], weights=gs[pos], minlength=dim
            ).astype(np.float64)
            neg = pd.DataFrame({"b": buckets[~pos], "g": gs[~pos]})
            scal = neg.groupby("b")["g"].sum().to_dict()
        else:
            agg = group_agg(partials, ["bucket"], {"g": ("g", "sum")}).to_pandas()
            gvec = np.zeros(dim, dtype=np.float64)
            buckets = agg["bucket"].to_numpy()
            gs = agg["g"].to_numpy()
            pos = buckets >= 0
            gvec[buckets[pos]] = gs[pos]
            scal = dict(zip(buckets[~pos], gs[~pos]))
        w = np.round(w - lr * gvec / n_total, 6)
        bias = round(bias - lr * scal.get(_B_GRAD, 0.0) / n_total, 6)
        losses.append(round(scal.get(_B_LOSS, 0.0) / n_total, 6))
        if tol > 0 and len(losses) >= 2 and abs(losses[-1] - losses[-2]) <= tol:
            break

    return {"w": w, "bias": bias, "n_bits": n_bits, "losses": losses}


def fit_hashed_logistic(
    ds: "ray.data.Dataset",
    text_col: str,
    label_col: str,
    n_bits: int = N_BITS,
    iters: int = ITERS,
    lr: float = LR,
    driver_reduce_max: int = 50_000_000,
    tol: float = 0.0,
) -> dict:
    """Full-batch gradient descent; ``label_col`` is a 0/1 int column.
    Returns {"w": (2^n_bits,) float64, "bias": float, "n_bits": int,
    "losses": [mean log-loss per iteration]}. The gradient reduce
    collects blocks·2^n_bits partial rows to the driver below
    ``driver_reduce_max`` and runs the bucketed shuffle above it
    (equivalence-tested with the gate forced to 0)."""
    feats = featurize_ds(ds, text_col, label_col, n_bits)
    return gd_fit(
        feats,
        n_bits=n_bits,
        iters=iters,
        lr=lr,
        driver_reduce_max=driver_reduce_max,
        tol=tol,
    )


def train_filter_run(
    out_dir: str,
    sf_dir: str,
    target_lang: str = "en",
    iters: int = ITERS,
    n_bits: int = N_BITS,
    lr: float = LR,
) -> dict:
    """Checkpointed, resumable classifier training (the cli.py
    train-filter body): the featurize pass checkpoints as a parquet
    stage (rayrl.checkpoint.Run), weights checkpoint per GD iteration
    (a crash mid-training resumes at the last completed iteration —
    same weights, bit-for-bit, as an uninterrupted run since updates
    are round-6 quantized), and the final scoring pass checkpoints as
    the output stage."""
    import json
    import os

    from .checkpoint import Run, params_hash

    run = Run(out_dir)
    params = {
        "sf_dir": sf_dir,
        "target_lang": target_lang,
        "n_bits": n_bits,
        "lr": lr,
    }

    def build_feats():
        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        )

        def with_label(batch: pa.Table) -> pa.Table:
            y = pc.equal(batch.column("lang"), target_lang)
            return batch.append_column("y", pc.cast(y, pa.int64()))

        labeled = ds.map_batches(with_label, batch_format="pyarrow", zero_copy_batch=True)
        return featurize_ds(labeled, "text", "y", n_bits)

    feats = run.stage("features", params, build_feats)

    # ---- per-iteration weight checkpoints. Crash-safe ordering (r5
    # review: weights.npz + weights.json written back-to-back meant a
    # crash between them resumed iter-(k+1) weights with iters_done=k,
    # re-applying an iteration — silently non-bit-exact): the npz name
    # CARRIES its iteration, the manifest is the single commit point
    # (tmp + os.replace), and resume only loads the npz the manifest
    # names — an orphaned newer npz is never read, and re-running the
    # lost iteration from the manifest's weights is deterministic.
    mpath = os.path.join(out_dir, "weights.json")
    w, bias, losses, done = None, 0.0, [], 0
    if os.path.exists(mpath):
        with open(mpath) as f:
            meta = json.load(f)
        wpath = os.path.join(out_dir, meta.get("weights_file", "weights.npz"))
        if (
            meta.get("params_hash") == params_hash(params)
            and meta["iters_done"] <= iters
            and os.path.exists(wpath)
        ):
            state = np.load(wpath)
            w, bias = state["w"], float(meta["bias"])
            losses, done = list(meta["losses"]), int(meta["iters_done"])

    # materialize once — gd_fit is called per iteration for the weight
    # checkpoint, and must not re-read the parquet stage each time
    feats_mat = feats.materialize()
    for it in range(done, iters):
        res = gd_fit(feats_mat, n_bits=n_bits, iters=1, lr=lr, w=w, bias=bias, losses=losses)
        w, bias, losses = res["w"], res["bias"], res["losses"]
        wname = f"weights_{it + 1}.npz"
        np.savez(os.path.join(out_dir, wname), w=w)
        tmp_m = mpath + ".tmp"
        with open(tmp_m, "w") as f:
            json.dump(
                {
                    "params_hash": params_hash(params),
                    "iters_done": it + 1,
                    "weights_file": wname,
                    "bias": bias,
                    "losses": losses,
                },
                f,
            )
        os.replace(tmp_m, mpath)  # atomic commit of (weights, iter)
        prev = os.path.join(out_dir, f"weights_{it}.npz")
        if it and os.path.exists(prev):
            os.remove(prev)  # keep only the committed iteration

    params_scored = {**params, "iters": iters}
    scored = run.stage(
        "scores",
        params_scored,
        lambda: score_hashed_logistic(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            ),
            {"w": w, "bias": bias, "n_bits": n_bits},
            "doc_id",
            "text",
        ),
    )
    n_docs = scored.count()
    n_kept = scored.filter(expr="pred == 1").count()
    summary = {
        "docs": int(n_docs),
        "kept": int(n_kept),
        "iters": iters,
        "final_loss": losses[-1] if losses else None,
        "resumed_at_iter": done,
    }
    run.write_result("summary", summary)
    return summary


class _ScoreStage:
    """Actor-pool scoring pass: weights fetched once per actor."""

    def __init__(self, params_ref, id_col: str, text_col: str):
        self._w, self._bias, self._n_bits = ray.get(params_ref)
        self._id, self._text = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        d, b, x, lens = _doc_features(batch, self._text, self._n_bits)
        s = _scores(d, b, x, batch.num_rows, self._w, self._bias)
        p = np.round(1.0 / (1.0 + np.exp(-s)), 4)
        return pa.table(
            {
                self._id: batch.column(self._id),
                "prob": pa.array(p, pa.float64()),
                "pred": pa.array((p >= 0.5).astype(np.int64), pa.int64()),
            }
        )


def score_hashed_logistic(
    ds: "ray.data.Dataset", params: dict, id_col: str, text_col: str
) -> "ray.data.Dataset":
    ref = ray.put((params["w"], params["bias"], params["n_bits"]))
    return ds.map_batches(
        _ScoreStage,
        fn_constructor_args=(ref, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def quality_classifier(sf_dir: str, target_lang: str = "en", iters: int = ITERS):
    """Train the hashed-unigram logistic filter to recognize the
    ``lang == target_lang`` slice of the documents table, then score
    every document: (doc_id, prob, pred). The planted-label stand-in
    for "train a fasttext filter on a trusted reference corpus and
    score the crawl"."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def with_label(batch: pa.Table) -> pa.Table:
        y = pc.equal(batch.column("lang"), target_lang)
        return batch.append_column("y", pc.cast(y, pa.int64()))

    labeled = ds.map_batches(with_label, batch_format="pyarrow", zero_copy_batch=True)
    # convergence early-exit: once the quantized mean log-loss plateaus
    # the remaining fixed iterations only burn dispatch time (the r4
    # bench's slowest query was this 12-iteration loop)
    params = fit_hashed_logistic(labeled, "text", "y", iters=iters, tol=2e-4)
    return score_hashed_logistic(labeled, params, "doc_id", "text")


MLFILTER_QUERIES = {"quality_classifier": quality_classifier}
