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
    from doc_quality_check_spark.operators.similarity import hyperplane_coeffs

    ids, mat = emb_np
    out = sign_lsh_topk(emb, emb.filter(F.col("vec_id") < 3), k=3).collect()
    planes = np.array(hyperplane_coeffs(dim=64, n_bits=8), dtype=np.float64)

    def bucket(v):
        proj = planes @ v
        return sum((1 << j) for j in range(8) if proj[j] >= 0)

    id2vec = {i: mat[k] for k, i in enumerate(ids)}
    for r in out:
        assert bucket(id2vec[r["query_id"]]) == bucket(id2vec[r["neighbor_id"]])
        assert r["rn"] <= 3


def test_seeded_projections_beat_axis_aligned_recall(spark):
    """The motivating fixture for the seeded family (VERDICT r2): embeddings
    whose first 8 dimensions are pure ±ε noise and whose remaining 56 carry
    the cluster signal. Axis-aligned sign buckets hash ONLY that noise, so
    near-duplicates of the same item land in different buckets almost
    always; full-dimension random projections are dominated by the shared
    signal and keep the pairs together."""
    import numpy as np

    from doc_quality_check_spark.operators.similarity import (
        axis_sign_bucket_expr, cosine_topk, sign_lsh_topk,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 56))          # 40 items, signal dims
    rows = []
    vid = 0
    for i in range(40):
        for _ in range(3):                    # 3 near-dup variants per item
            noise = rng.normal(scale=0.02, size=8)         # sign-random dims
            signal = base[i] + rng.normal(scale=0.02, size=56)
            rows.append((vid, [float(x) for x in np.concatenate([noise, signal])]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") % 3 == 0).limit(20)

    ex = {(r["query_id"], r["neighbor_id"])
          for r in cosine_topk(df, q, k=2).collect()}     # the 2 true variants
    new = {(r["query_id"], r["neighbor_id"])
           for r in sign_lsh_topk(df, q, k=2, n_bits=8, dim=64).collect()}

    # axis-aligned baseline, same join shape
    from doc_quality_check_spark.operators.similarity import (
        _dot_expr, _topk_per_query, with_norm,
    )
    c = with_norm(df, "embedding").select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_cv"),
        F.col("norm").alias("_cn"),
        axis_sign_bucket_expr("embedding", 0, 8).alias("bucket"))
    qq = with_norm(q, "embedding").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv"),
        F.col("norm").alias("_qn"),
        axis_sign_bucket_expr("embedding", 0, 8).alias("bucket"))
    pairs = c.join(F.broadcast(qq), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id"))
    cos = F.round(F.expr(_dot_expr("_qv", "_cv")) / (F.col("_qn") * F.col("_cn")), 6)
    old = {(r["query_id"], r["neighbor_id"]) for r in _topk_per_query(
        pairs.select("query_id", "neighbor_id", cos.alias("cosine")), 2).collect()}

    recall_new = len(ex & new) / len(ex)
    recall_old = len(ex & old) / len(ex)
    # noise-hashing axis buckets collapse (P[8 noise signs all agree] ≈ 1/256);
    # signal-dominated projections keep near-dups together
    assert recall_old < 0.3
    assert recall_new > 0.7
    assert recall_new > recall_old + 0.4


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
