"""PCA / covariance closed-form contracts (pipeline.similarity)."""
import math

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark):
    # deterministic 3-dim cloud with known covariance structure
    rows = []
    state = 1234567
    for i in range(200):
        v = []
        for _ in range(3):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            v.append(((state >> 20) % 2001 - 1000) / 1000.0)
        # correlate dim2 with dim0 so PCA has a dominant axis
        v[2] = 0.9 * v[0] + 0.1 * v[2]
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_embedding_covariance_matches_numpy(emb):
    from titan_spark.pipeline.similarity import embedding_covariance

    x = np.array([r["embedding"] for r in emb.orderBy("vec_id").collect()])
    ref = np.cov(x, rowvar=False, bias=True)  # population covariance
    got = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(emb).collect()}
    assert len(got) == 6  # upper triangle of 3x3
    for (i, j), v in got.items():
        assert math.isclose(v, round(ref[i, j], 6), abs_tol=2e-6)


def test_pca_components_and_projection_match_numpy(emb):
    from titan_spark.pipeline.similarity import pca_components, pca_project

    comps, means, var = pca_components(emb, k=2)
    x = np.array([r["embedding"] for r in emb.orderBy("vec_id").collect()])
    ref_cov = np.zeros((3, 3))
    # reference eigh over the SAME rounded covariance the engine uses
    from titan_spark.pipeline.similarity import embedding_covariance

    for r in embedding_covariance(emb).collect():
        ref_cov[r["i"], r["j"]] = ref_cov[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(ref_cov)
    order = np.argsort(vals)[::-1][:2]
    assert var[0] >= var[1] > 0
    for k_i, idx in enumerate(order):
        v = vecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        assert np.allclose(comps[k_i], v, atol=1e-9)
        assert math.isclose(var[k_i], vals[idx], rel_tol=1e-9)
    # projection = centered matmul, rounded to 6
    proj = {r["vec_id"]: r["pc"] for r in pca_project(emb, k=2).collect()}
    ref_proj = (x - np.array(means)) @ np.array(comps).T
    for vid, pc in proj.items():
        assert np.allclose(pc, np.round(ref_proj[vid], 6), atol=2e-6)


def test_pca_project_precomputed_axes_skips_fit(emb):
    from titan_spark.pipeline.similarity import pca_project

    comps = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    means = [0.0, 0.0, 0.0]
    out = {
        r["vec_id"]: r["pc"]
        for r in pca_project(emb, k=2, components=comps, means=means).collect()
    }
    first = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    assert out[0][0] == round(first[0], 6) and out[0][1] == round(first[1], 6)


def test_pq_encode_exact_on_codebook_vectors(spark):
    """A vector equal to a centroid in every subspace encodes to those
    codes with zero reconstruction error."""
    from titan_spark.pipeline.similarity import pq_codebooks, pq_encode

    books = pq_codebooks(dim=8, m=2, k=4)
    vec = books[0][2] + books[1][3]  # subspace 0 -> code 2, subspace 1 -> code 3
    df = spark.createDataFrame([(0, [float(x) for x in vec])], ["vec_id", "embedding"])
    row = pq_encode(df, books).collect()[0]
    assert row["codes"] == [2, 3]
    assert row["recon_err"] == 0.0


def test_pq_decode_roundtrip_error_matches(spark):
    from titan_spark.pipeline.similarity import pq_codebooks, pq_decode, pq_encode

    books = pq_codebooks(dim=8, m=2, k=4)
    rows = [(i, [((i * 7 + j * 3) % 11 - 5) / 5.0 for j in range(8)]) for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    enc = pq_encode(df, books)
    dec = {r["vec_id"]: r["approx"] for r in pq_decode(enc, books).collect()}
    err = {r["vec_id"]: r["recon_err"] for r in enc.collect()}
    for i, v in rows:
        e = sum((a - b) ** 2 for a, b in zip(v, dec[i]))
        assert math.isclose(e, err[i], abs_tol=2e-6)


def test_pq_fit_reduces_reconstruction_error(spark):
    from titan_spark.pipeline.similarity import pq_codebooks, pq_encode, pq_fit

    rows = [
        (i, [math.sin(i * 0.7 + j) for j in range(8)]) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    base = pq_codebooks(8, 2, 4)
    fitted = pq_fit(df, m=2, k=4, iterations=3)
    e0 = pq_encode(df, base).agg(F.sum("recon_err")).first()[0]
    e1 = pq_encode(df, fitted).agg(F.sum("recon_err")).first()[0]
    assert e1 < e0


def test_whitening_gives_identity_covariance(emb):
    from titan_spark.pipeline.similarity import whiten_embeddings

    out = whiten_embeddings(emb, eps=1e-9)
    x = np.vstack(
        [r["white"] for r in out.orderBy("vec_id").collect()]
    )
    cov = np.cov(x, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(3), atol=1e-2)


def test_ivfpq_recall_against_exact(spark):
    """ADC ranking over PQ codes approximates exact NN: on a separable
    fixture the true nearest neighbor must appear in the IVF-PQ top-3."""
    from titan_spark.pipeline.similarity import (
        ivf_centroids,
        ivfpq_search,
        pq_codebooks,
    )

    # vectors near 4 distinct corners of the 8-cube
    corners = [
        [1.0] * 8,
        [-1.0] * 8,
        [1.0, -1.0] * 4,
        [-1.0, 1.0] * 4,
    ]
    rows = []
    for i in range(40):
        base = corners[i % 4]
        rows.append((i, [b + ((i * 13 + j) % 7 - 3) / 30.0 for j, b in enumerate(base)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    query = [x + 0.01 for x in rows[0][1]]  # perturbed copy of vec 0
    got = ivfpq_search(
        df,
        query,
        pq_codebooks(8, 2, 8),
        k=3,
        nprobe=4,
        centroids=ivf_centroids(8, 8),
    ).collect()
    assert [r["vec_id"] for r in got][0] in {i for i in range(0, 40, 4)}
    assert 0 in [r["vec_id"] for r in got]
    # adc ascending
    adcs = [r["adc"] for r in got]
    assert adcs == sorted(adcs)


def test_pq_arrow_kernel_matches_fold(spark):
    from titan_spark.pipeline.similarity import pq_codebooks, pq_encode

    rows = [(i, [((i * 7 + j * 3) % 11 - 5) / 5.0 for j in range(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books = pq_codebooks(8, 2, 4)
    fold = {r["vec_id"]: (r["codes"], r["recon_err"]) for r in pq_encode(df, books).collect()}
    arrow = {r["vec_id"]: (r["codes"], r["recon_err"]) for r in pq_encode(df, books, kernel="arrow").collect()}
    assert set(fold) == set(arrow)
    for i in fold:
        assert fold[i][0] == arrow[i][0]
        assert abs(fold[i][1] - arrow[i][1]) <= 2e-6


def test_embed_topk_pairs_arrow_matches_fold(spark, tables):
    """The BLAS kernel of the exact all-pairs baseline must reproduce
    the JVM-fold results (measured 11x faster at sf0.1)."""
    from titan_spark.pipeline.similarity import embedding_topk_pairs

    emb = tables["embeddings"]
    fold = [tuple(r) for r in embedding_topk_pairs(emb, k=10, kernel="fold").collect()]
    arrow = [tuple(r) for r in embedding_topk_pairs(emb, k=10, kernel="arrow").collect()]
    assert fold == arrow


# ------------------------------------------------- random projection (JL)


def test_jl_projection_preserves_distances(spark):
    """JL lemma: pairwise Euclidean distances survive the 64->16
    hash-sign projection within bounded distortion. With k=16 the
    per-pair guarantee is loose, so assert the MEDIAN distortion over
    many pairs is small and every pair stays within a generous band."""
    from titan_spark.pipeline.similarity import random_project

    rows = [
        (i, [((i * 13 + j * 7) % 17 - 8) / 8.0 for j in range(64)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    proj = {r["vec_id"]: r["proj"] for r in random_project(df, out_dim=16).collect()}
    orig = dict(rows)

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    ratios = []
    for i in range(0, 40, 3):
        for j in range(i + 1, 40, 5):
            d0 = dist(orig[i], orig[j])
            if d0 > 1e-9:
                ratios.append(dist(proj[i], proj[j]) / d0)
    ratios.sort()
    assert 0.8 < ratios[len(ratios) // 2] < 1.25, ratios[len(ratios) // 2]
    assert all(0.3 < r < 2.5 for r in ratios), (min(ratios), max(ratios))


def test_jl_projection_deterministic_and_shaped(spark):
    from titan_spark.pipeline.similarity import jl_sign_matrix, random_project

    mat = jl_sign_matrix(8, 4)
    assert mat == jl_sign_matrix(8, 4)
    assert {abs(x) for row in mat for x in row} == {0.5}
    # signs are balanced-ish (md5 low bit), not degenerate
    total = sum(x for row in mat for x in row)
    assert abs(total) < 8 * 4 * 0.5

    df = spark.createDataFrame(
        [(0, [1.0] * 8), (1, [0.0] * 8)], ["vec_id", "embedding"]
    )
    out = {r["vec_id"]: r["proj"] for r in random_project(df, out_dim=4, in_dim=8).collect()}
    assert len(out[0]) == 4
    assert out[1] == [0.0, 0.0, 0.0, 0.0]
    # projecting the all-ones vector gives the column sums of the matrix
    col_sums = [round(sum(mat[i][j] for i in range(8)), 6) for j in range(4)]
    assert out[0] == col_sums
