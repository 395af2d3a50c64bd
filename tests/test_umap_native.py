"""Native UMAP (utils/umap_native.py) — algorithmic and integration tests.

The reference's projector is umap-learn behind a cache wrapper
(reference: dashboard/umap_optimized.py:24-132). These tests pin the
self-contained implementation: fuzzy-set math, curve fit, manifold
quality (cluster structure + trustworthiness), determinism, and the
EmbeddingProjector wiring.
"""

import numpy as np
import pytest

from deepearth_tpu.utils.umap_native import (
    NativeUMAP,
    find_ab_params,
    fuzzy_simplicial_set,
    smooth_knn_dist,
    _knn,
)


def _clustered(n_per=60, d=40, k=3, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, (k, d))
    x = np.concatenate(
        [centers[i] + rng.normal(0, 1.0, (n_per, d)) for i in range(k)]
    ).astype(np.float32)
    labels = np.repeat(np.arange(k), n_per)
    return x, labels


class TestFuzzySet:
    def test_smooth_knn_constraint(self):
        """sigma solves sum_j exp(-max(0, d - rho)/sigma) = log2(k)."""
        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (200, 8)).astype(np.float32)
        idx, dist = _knn(x, 15, "euclidean")
        rho, sigma = smooth_knn_dist(dist, 15.0)
        psum = np.exp(
            -np.maximum(dist - rho[:, None], 0.0) / sigma[:, None]
        ).sum(axis=1)
        assert np.abs(psum - np.log2(15.0)).max() < 1e-3
        # rho is the nearest-distinct-neighbor distance
        assert np.allclose(rho, dist[:, 0])

    def test_symmetrized_graph(self):
        x, _ = _clustered(n_per=40)
        idx, dist = _knn(x, 10, "euclidean")
        g = fuzzy_simplicial_set(idx, dist, x.shape[0]).tocsr()
        # probabilistic t-conorm keeps memberships in (0, 1]
        assert g.data.max() <= 1.0 + 1e-6 and g.data.min() > 0.0
        assert (abs(g - g.T)).max() < 1e-9  # symmetric
        assert g.diagonal().max() < 1e-9  # no self-edges

    def test_ab_params_match_umap_defaults(self):
        """umap-learn's published fit for spread=1.0, min_dist=0.1 is
        a=1.577, b=0.8951."""
        a, b = find_ab_params(1.0, 0.1)
        assert abs(a - 1.577) / 1.577 < 0.05
        assert abs(b - 0.8951) / 0.8951 < 0.05


class TestLayoutQuality:
    @pytest.fixture(scope="class")
    def projected(self):
        x, labels = _clustered()
        emb = NativeUMAP(
            n_components=2, n_epochs=300, random_state=42
        ).fit_transform(x)
        return x, labels, emb

    def test_cluster_structure_preserved(self, projected):
        x, labels, emb = projected
        assert emb.shape == (x.shape[0], 2)
        assert np.isfinite(emb).all()
        # intra-cluster spread << inter-centroid spacing
        cents = np.stack([emb[labels == i].mean(0) for i in range(3)])
        intra = np.mean(
            [
                np.linalg.norm(emb[labels == i] - cents[i], axis=1).mean()
                for i in range(3)
            ]
        )
        inter = np.mean(
            [
                np.linalg.norm(cents[i] - cents[j])
                for i in range(3)
                for j in range(i + 1, 3)
            ]
        )
        assert inter > 2.0 * intra
        # embedding-space nearest neighbors stay within the true cluster
        from sklearn.neighbors import NearestNeighbors

        nn = NearestNeighbors(n_neighbors=6).fit(emb)
        _, nbr = nn.kneighbors(emb)
        purity = (labels[nbr[:, 1:]] == labels[:, None]).mean()
        assert purity > 0.9

    def test_trustworthiness(self, projected):
        from sklearn.manifold import trustworthiness

        x, _, emb = projected
        assert trustworthiness(x, emb, n_neighbors=10) > 0.9

    def test_deterministic(self):
        x, _ = _clustered(n_per=25, d=16)
        m1 = NativeUMAP(n_epochs=50, random_state=7).fit_transform(x)
        m2 = NativeUMAP(n_epochs=50, random_state=7).fit_transform(x)
        np.testing.assert_array_equal(m1, m2)

    def test_cosine_metric_and_3d(self):
        x, _ = _clustered(n_per=25, d=16)
        emb = NativeUMAP(
            n_components=3, metric="cosine", n_epochs=50, random_state=0
        ).fit_transform(x)
        assert emb.shape == (75, 3) and np.isfinite(emb).all()

    def test_tiny_input_fallback(self):
        x = np.random.default_rng(0).normal(0, 1, (3, 12)).astype(np.float32)
        emb = NativeUMAP(n_components=3).fit_transform(x)
        assert emb.shape == (3, 3) and np.isfinite(emb).all()


class TestNNDescent:
    """NN-descent approximate kNN (round-4: umap-learn parity for the 33k
    store; reference dashboard/umap_optimized.py runs pynndescent)."""

    def test_recall_vs_exact_5k(self):
        from deepearth_tpu.utils.umap_native import _knn_exact, _knn_nn_descent

        rng = np.random.default_rng(0)
        # clustered data (the realistic hard case for random-init descent)
        centers = rng.normal(0, 5, (25, 32))
        x = (
            centers[rng.integers(0, 25, 5000)]
            + rng.normal(0, 1.0, (5000, 32))
        ).astype(np.float32)
        k = 15
        idx_e, _ = _knn_exact(x, k, "euclidean")
        idx_a, dist_a = _knn_nn_descent(
            x, k, "euclidean", np.random.default_rng(1)
        )
        hits = sum(
            len(set(idx_e[i]) & set(idx_a[i])) for i in range(5000)
        )
        recall = hits / (5000 * k)
        assert recall >= 0.9, f"nn-descent recall {recall:.3f} < 0.9"
        assert np.isfinite(dist_a).all()
        # distances are sorted ascending per row
        assert (np.diff(dist_a, axis=1) >= 0).all()

    def test_cosine_matches_exact_metric(self):
        from deepearth_tpu.utils.umap_native import _knn_exact, _knn_nn_descent

        rng = np.random.default_rng(2)
        x = rng.normal(0, 1, (1500, 24)).astype(np.float32)
        k = 10
        idx_e, dist_e = _knn_exact(x, k, "cosine")
        idx_a, dist_a = _knn_nn_descent(
            x, k, "cosine", np.random.default_rng(3), n_iters=15
        )
        hits = sum(
            len(set(idx_e[i]) & set(idx_a[i])) for i in range(1500)
        )
        assert hits / (1500 * k) >= 0.9
        # where the neighbor matches, the cosine distance matches too
        match = idx_a[:, 0] == idx_e[:, 0]
        np.testing.assert_allclose(
            dist_a[match, 0], dist_e[match, 0], atol=1e-5
        )

    def test_auto_routing(self):
        from deepearth_tpu.utils import umap_native as un

        x = np.random.default_rng(4).normal(0, 1, (64, 8)).astype(np.float32)
        # small N: auto == exact
        idx_auto, _ = _knn(x, 5, "euclidean", method="auto")
        idx_exact, _ = _knn(x, 5, "euclidean", method="exact")
        np.testing.assert_array_equal(idx_auto, idx_exact)
        # forced nnd works at small N too
        idx_nnd, _ = _knn(x, 5, "euclidean", method="nnd")
        hits = sum(len(set(a) & set(b)) for a, b in zip(idx_nnd, idx_exact))
        assert hits / (64 * 5) >= 0.9


class TestProjectorIntegration:
    def test_auto_resolves_to_umap(self, tmp_path):
        from deepearth_tpu.utils.projection import EmbeddingProjector

        p = EmbeddingProjector(
            n_components=2, method="auto", cache_dir=str(tmp_path)
        )
        assert p._resolve_method() == "umap"
        x, labels = _clustered(n_per=30, d=16)
        out = p.fit_transform(x)
        assert out.shape == (90, 2) and np.isfinite(out).all()
        # cache round-trip returns the identical array
        out2 = p.fit_transform(x)
        np.testing.assert_array_equal(out, out2)
        # structure is better than random: same-cluster pairs are closer
        d01 = np.linalg.norm(
            out[labels == 0].mean(0) - out[labels == 1].mean(0)
        )
        intra = np.linalg.norm(
            out[labels == 0] - out[labels == 0].mean(0), axis=1
        ).mean()
        assert d01 > intra
