"""IVF ANN recall contract (SCALE.md 'Similarity search').

Measures q_ann_ivf_topk (the real Spark operator, probes=2/8) against an
independently computed exact top-10 over the same base set (vec_id > 8 —
centroids and the query are excluded from both sides). The fixture
embeddings are isotropic random vectors, so expected recall ≈ the probed
fraction of the data; the assertion pins the measured deterministic value
(0.70 at sf0.001) plus the structural guarantees: every IVF hit must be a
true cosine score from the probed cells, and the top-1 (which almost
always lands in the query's own cell) must match exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _exact_topk(sf_dir: str, k: int = 10) -> list[int]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    q = emb[ids == 0][0]
    m = ids > 8
    bids, bemb = ids[m], emb[m]
    sc = np.round((bemb @ q)
                  / (np.linalg.norm(bemb, axis=1) * np.linalg.norm(q)), 6)
    order = sorted(range(len(bids)), key=lambda i: (-sc[i], bids[i]))
    return [int(bids[i]) for i in order[:k]]


def test_ivf_recall_at_10(spark):
    from axora_spark.queries import q_ann_ivf_topk
    got = q_ann_ivf_topk(spark, SF).collect()
    ivf_ids = [int(r.vec_id) for r in got]
    exact = _exact_topk(SF)
    recall = len(set(ivf_ids) & set(exact)) / 10
    # deterministic fixture → deterministic recall; probes=2/8 probe ~27%
    # of a structureless random corpus (see SCALE.md)
    assert recall == 0.70, (recall, ivf_ids, exact)
    assert ivf_ids[0] == exact[0]  # top-1 found in the probed cells
    # ordered by true cosine desc (re-rank is exact within probed cells)
    scores = [float(r.cos_sim) for r in got]
    assert scores == sorted(scores, reverse=True)


def _exact_l2_topk(sf_dir: str, k: int = 10) -> list[int]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    q = emb[ids == 0][0]
    m = ids > 8
    bids, bemb = ids[m], emb[m]
    d = np.round(((bemb - q) ** 2).sum(axis=1), 6)
    order = sorted(range(len(bids)), key=lambda i: (d[i], bids[i]))
    return [int(bids[i]) for i in order[:k]]


def test_pq_recall_at_10(spark):
    """PQ ADC is a coarse approximation (M=4 subspaces × 8 codewords =
    4096 distinct distances for the whole corpus) — the contract is that
    its top-10 still lands in the exact-L2 neighborhood, measured here as
    the fixed deterministic recall on the fixture, and that ADC distances
    are monotonically ordered."""
    from axora_spark.queries import q_ann_pq_topk
    got = q_ann_pq_topk(spark, SF).collect()
    pq_ids = [int(r.vec_id) for r in got]
    exact = _exact_l2_topk(SF)
    recall = len(set(pq_ids) & set(exact)) / 10
    # deterministic fixture → deterministic recall. 0.2 is the honest
    # number for 8-codeword PQ on ISOTROPIC RANDOM 64-dim vectors (the
    # hardest case — no cluster structure for codewords to exploit;
    # independently computed in numpy: 0.2 at sf0.001, 0.3 at sf0.01);
    # production uses trained codebooks with K=256/subspace + OPQ
    # rotation, or PQ as the coarse pass before exact re-rank (the IVF
    # query shows that re-rank shape).
    assert recall == 0.2, (recall, pq_ids, exact)
    dists = [float(r.pq_dist) for r in got]
    assert dists == sorted(dists)
    # every code is a valid codeword id
    for r in got:
        for m in range(4):
            assert 1 <= r[f"code{m}"] <= 8
