"""Gram-matrix sufficient statistics and driver-side PCA."""

from __future__ import annotations

import numpy as np
import pytest

from stream_cdc_spark.operators.similarity import fit_pca, gram_matrix, pca_project
from stream_cdc_spark.tables import load
from tests.conftest import SF_SMALL


def _vec_df(spark, X, partitions):
    rows = [(i, [float(v) for v in x]) for i, x in enumerate(X)]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).repartition(partitions)


def test_gram_partition_invariant(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(300, 8)).astype(np.float32)
    a = {(r["i"], r["j"]): r["s_q"] for r in gram_matrix(_vec_df(spark, X, 1)).collect()}
    b = {(r["i"], r["j"]): r["s_q"] for r in gram_matrix(_vec_df(spark, X, 7)).collect()}
    assert a == b
    assert len(a) == 8 * 9 // 2 + 8  # upper triangle + first moments


def test_gram_matches_numpy_reference(spark):
    rng = np.random.default_rng(11)
    X = rng.normal(size=(100, 4)).astype(np.float32)
    got = {(r["i"], r["j"]): r["s_q"] for r in gram_matrix(_vec_df(spark, X, 3)).collect()}
    Xd = X.astype(np.float64)
    Q = 1_000_000_000.0
    want2 = np.floor((Q * Xd)[:, :, None] * Xd[:, None, :]).sum(axis=0)
    want1 = np.floor(Q * Xd).sum(axis=0)
    for i in range(4):
        assert got[(i, -1)] == int(want1[i])
        for j in range(i, 4):
            assert got[(i, j)] == int(want2[i, j])


def test_fit_pca_recovers_dominant_direction(spark):
    rng = np.random.default_rng(3)
    direction = np.array([0.6, 0.8, 0.0, 0.0])
    t = rng.normal(size=(500, 1)) * 5.0
    X = (t * direction + rng.normal(size=(500, 4)) * 0.05).astype(np.float32)
    mean, comps = fit_pca(_vec_df(spark, X, 4), n_components=2)
    # top component aligns with the planted direction (sign fixed)
    assert abs(float(np.dot(comps[0], direction))) > 0.999
    assert comps[0][np.argmax(np.abs(comps[0]))] > 0  # deterministic sign


def test_pca_project_matches_numpy(spark):
    rng = np.random.default_rng(5)
    X = rng.normal(size=(50, 6)).astype(np.float32)
    df = _vec_df(spark, X, 2)
    mean, comps = fit_pca(df, n_components=3)
    got = {
        r["vec_id"]: np.array(r["projection"])
        for r in pca_project(df, mean, comps).collect()
    }
    want = (X.astype(np.float64) - mean) @ comps.T
    for i in range(50):
        assert np.allclose(got[i], want[i], atol=1e-12)


def test_pca_on_corpus_orders_variance(spark):
    e = load(spark, SF_SMALL, "embeddings")
    mean, comps = fit_pca(e, n_components=4)
    proj = pca_project(e, mean, comps)
    P = np.array([r["projection"] for r in proj.collect()])
    var = P.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(3))
    # components are orthonormal
    G = comps @ comps.T
    assert np.allclose(G, np.eye(4), atol=1e-9)
