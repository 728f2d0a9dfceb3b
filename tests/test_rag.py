"""RAG composite (rayrl.rag): hashed random-projection chunk
embeddings + brute retrieval. The property: a query chunk's nearest
neighbour is an overlapping chunk of the SAME document (they share
`overlap` tokens), and retrieval is deterministic at any layout."""

import numpy as np
import pandas as pd

import ray.data

from rayrl.rag import chunk_embeddings, rag_topk


def test_embeddings_unit_norm(ray_session):
    emb = chunk_embeddings("/root/testdata/sf0.001").to_pandas()
    m = np.stack(emb["embedding"].to_numpy())
    norms = np.linalg.norm(m, axis=1)
    assert np.allclose(norms[m.any(axis=1)], 1.0, atol=1e-5)


def test_rag_topk_overlap_property(ray_session, tmp_path):
    """Planted fixture: each doc has its own vocabulary, so a query
    chunk's nearest neighbour must be the overlapping window of the
    SAME document (they share `overlap` tokens; cross-doc cosine ~0)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(31)
    texts = []
    for d in range(10):
        vocab = [f"d{d}w{i}" for i in range(40)]
        texts.append(" ".join(rng.choice(vocab, size=120)))
    t = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "documents.parquet")

    out = rag_topk(str(sf), k=5, n_queries=3)
    assert list(out.columns) == ["query_doc", "rank", "doc_id", "chunk_id", "sim"]
    for qd, g in out.groupby("query_doc"):
        g = g.sort_values("rank")
        # rank-1 neighbour: an overlapping window of the same doc
        assert g.iloc[0]["doc_id"] == qd and g.iloc[0]["chunk_id"] == 1, (qd, g)
        assert g.iloc[0]["sim"] > 0.2
        # every cross-doc chunk scores strictly below the
        # overlapping same-doc window (random-projection noise floor
        # is nonzero at dim=64, so assert ordering, not magnitude)
        other = g[g["doc_id"] != qd]
        assert (other["sim"] < g.iloc[0]["sim"]).all()
    # deterministic rerun
    again = rag_topk(str(sf), k=5, n_queries=3)
    pd.testing.assert_frame_equal(out, again)


def test_contrastive_pairs_semantics(ray_session):
    from rayrl.rag import contrastive_pairs

    out = contrastive_pairs("/root/testdata/sf0.01", n_anchors=16)
    assert len(out) == 16
    # hard negatives are cross-document, positives same-doc by construction
    assert (out["neg_doc"] != out["anchor_doc"]).all()
    assert (out["pos_chunk_id"] == 1).all()
    assert out["neg_sim"].between(-1, 1).all()
    again = contrastive_pairs("/root/testdata/sf0.01", n_anchors=16)
    pd.testing.assert_frame_equal(out, again)
