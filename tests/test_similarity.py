"""Similarity-search correctness vs a local numpy reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from doc_quality_check_spark.operators.similarity import (
    cosine_neardup_pairs,
    cosine_topk,
    sign_lsh_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf01_dir):
    return spark.read.parquet(f"{sf01_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def _np_topk(ids, mat, qid, k):
    qi = int(np.where(ids == qid)[0][0])
    q = mat[qi]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    sims = np.round(sims, 6)
    order = sorted(
        [(s, i) for s, i in zip(sims, ids) if i != qid],
        key=lambda t: (-t[0], t[1]),
    )
    return [i for _, i in order[:k]]


def test_cosine_topk_matches_numpy(emb, emb_np):
    ids, mat = emb_np
    out = cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=5).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["rn"], r["neighbor_id"]))
    for qid in (0, 1, 2):
        spark_order = [n for _, n in sorted(got[qid])]
        assert spark_order == _np_topk(ids, mat, qid, 5)


def test_sign_lsh_candidates_share_bucket(emb, emb_np):
    ids, mat = emb_np
    out = sign_lsh_topk(emb, emb.filter(F.col("vec_id") < 3), k=3).collect()
    def bucket(v):
        return sum((1 << i) for i in range(8) if v[i] >= 0)
    id2vec = {i: mat[k] for k, i in enumerate(ids)}
    for r in out:
        assert bucket(id2vec[r["query_id"]]) == bucket(id2vec[r["neighbor_id"]])
        assert r["rn"] <= 3


def test_neardup_pairs_symmetric_bound(emb):
    pairs = cosine_neardup_pairs(emb, threshold=0.3).collect()
    assert all(r["id_a"] < r["id_b"] and r["cosine"] >= 0.3 for r in pairs)


def test_ivf_with_trained_codebook(spark, sf001_dir):
    """MLlib k-means codebook plugs into ivf_topk; trained buckets give
    reasonable recall vs the exact scan."""
    from doc_quality_check_spark.operators.similarity import (
        cosine_topk, ivf_topk, train_codebook,
    )

    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    queries = emb.limit(5)
    codebook = train_codebook(emb, k=4, seed=7, max_iter=5)
    assert codebook.count() == 4

    approx = ivf_topk(emb, queries, codebook, k=3, nprobe=2).collect()
    assert approx and all(-1.0 <= r["cosine"] <= 1.0 for r in approx)
    exact = cosine_topk(emb, queries, k=3).collect()
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # probing half the lists should recover a sizable share of true top-3
    assert len(ex & ap) >= len(ex) // 3


def test_multitable_lsh_recall_scales_with_tables(spark, sf01_dir):
    """Multi-table sign-LSH: recall@10 vs the exact scan grows with the
    number of tables (the 1-(1-p)^L curve); candidates stay equi-join only."""
    from doc_quality_check_spark.operators.similarity import (
        cosine_topk, sign_lsh_multitable_topk, sign_lsh_topk,
    )

    emb = spark.read.parquet(f"{sf01_dir}/embeddings.parquet")
    q = emb.limit(20)
    ex = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, q, k=10).collect()}
    one = {(r["query_id"], r["neighbor_id"])
           for r in sign_lsh_topk(emb, q, k=10, n_bits=8).collect()}
    four = {(r["query_id"], r["neighbor_id"])
            for r in sign_lsh_multitable_topk(emb, q, k=10, n_bits=8, n_tables=4).collect()}
    eight = {(r["query_id"], r["neighbor_id"])
             for r in sign_lsh_multitable_topk(emb, q, k=10, n_bits=8, n_tables=8).collect()}
    r1, r4, r8 = (len(ex & s) / len(ex) for s in (one, four, eight))
    assert r1 <= r4 <= r8          # monotone in tables
    assert r8 > r1                 # and strictly better at the top end
