"""Hash-encoding tests: shapes, reference parity (nearest mode), interpolation
continuity, gradients into tables."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepearth_tpu.configs import HashEncodingConfig
from deepearth_tpu.ops import (
    HASH_PRIMES,
    HashEncoding,
    hash_encode,
    hash_grid_indices,
    init_hash_tables,
)


def reference_hash_np(coords: np.ndarray, resolution: int, table_size: int) -> np.ndarray:
    """Reference hash in int64, replicating models/hash_encoding.py:47-74."""
    grid = np.floor(coords.astype(np.float64) * resolution).astype(np.int64)
    h = np.zeros(coords.shape[0], dtype=np.int64)
    for d in range(coords.shape[1]):
        h ^= grid[:, d] * np.int64(HASH_PRIMES[d])
    return h % table_size


class TestHashIndices:
    @pytest.mark.parametrize("dim", [1, 2, 3, 4])
    def test_matches_reference_int64_semantics(self, dim):
        rng = np.random.default_rng(0)
        coords = rng.random((256, dim))
        table_size = 2 ** 15
        for res in [16, 512, 2 ** 14]:
            expected = reference_hash_np(coords, res, table_size)
            grid = jnp.floor(jnp.asarray(coords, jnp.float32) * res).astype(jnp.int32)
            got = np.asarray(hash_grid_indices(grid, table_size, dim))
            # float32 scaling can flip a borderline floor cell; require exact
            # match on the overwhelming majority and exact match when grids agree
            grid64 = np.floor(coords * res).astype(np.int64)
            agree = np.all(np.asarray(grid) == grid64, axis=1)
            np.testing.assert_array_equal(got[agree], expected[agree])
            assert agree.mean() > 0.99


class TestHashEncode:
    def _setup(self, interp, dim=3, levels=4):
        cfg = HashEncodingConfig(
            n_levels=levels,
            n_features_per_level=2,
            coords_dim=dim,
            hash_table_size=2 ** 12,
            base_resolution=16,
            interpolation=interp,
        )
        tables = init_hash_tables(jax.random.PRNGKey(0), cfg)
        return cfg, tables

    @pytest.mark.parametrize("interp", ["nearest", "linear"])
    def test_shapes(self, interp):
        cfg, tables = self._setup(interp)
        coords = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
        out = hash_encode(
            coords, tables, jnp.asarray(cfg.resolutions, jnp.float32),
            interpolation=interp, table_size=cfg.hash_table_size,
        )
        assert out.shape == (32, cfg.output_dim)

    def test_nearest_matches_manual_lookup(self):
        cfg, tables = self._setup("nearest")
        coords = np.random.default_rng(2).random((64, 3))
        out = np.asarray(
            hash_encode(
                jnp.asarray(coords, jnp.float32), tables,
                jnp.asarray(cfg.resolutions, jnp.float32),
                interpolation="nearest", table_size=cfg.hash_table_size,
            )
        )
        tables_np = np.asarray(tables)
        for li, res in enumerate(cfg.resolutions):
            grid32 = np.floor((coords.astype(np.float32) * np.float32(res))).astype(np.int64)
            h = np.zeros(64, dtype=np.int64)
            for d in range(3):
                h ^= grid32[:, d] * np.int64(HASH_PRIMES[d])
            idx = h % cfg.hash_table_size
            np.testing.assert_allclose(
                out[:, li * 2 : li * 2 + 2], tables_np[li, idx], rtol=1e-6
            )

    def test_linear_interpolation_is_continuous(self):
        """d-linear output must be continuous across a cell boundary."""
        cfg, tables = self._setup("linear", dim=1, levels=1)
        res = cfg.resolutions[0]
        eps = 1e-5
        boundary = 5.0 / res  # a grid line of level 0
        lo = hash_encode(
            jnp.array([[boundary - eps]]), tables,
            jnp.asarray(cfg.resolutions, jnp.float32),
            interpolation="linear", table_size=cfg.hash_table_size,
        )
        hi = hash_encode(
            jnp.array([[boundary + eps]]), tables,
            jnp.asarray(cfg.resolutions, jnp.float32),
            interpolation="linear", table_size=cfg.hash_table_size,
        )
        np.testing.assert_allclose(np.asarray(lo), np.asarray(hi), atol=1e-6)

    def test_linear_interpolates_between_corners(self):
        """At a cell midpoint the 1D encoding is the mean of corner features."""
        cfg, tables = self._setup("linear", dim=1, levels=1)
        res = cfg.resolutions[0]
        mid = (5.0 + 0.5) / res
        out = np.asarray(
            hash_encode(
                jnp.array([[mid]]), tables,
                jnp.asarray(cfg.resolutions, jnp.float32),
                interpolation="linear", table_size=cfg.hash_table_size,
            )
        )[0]
        t = np.asarray(tables)[0]
        i0 = (5 * HASH_PRIMES[0]) % cfg.hash_table_size
        i1 = (6 * HASH_PRIMES[0]) % cfg.hash_table_size
        np.testing.assert_allclose(out, 0.5 * (t[i0] + t[i1]), rtol=1e-5)

    @pytest.mark.parametrize("interp", ["nearest", "linear"])
    def test_gradients_scatter_into_tables(self, interp):
        cfg, tables = self._setup(interp)
        coords = jax.random.uniform(jax.random.PRNGKey(3), (16, 3))

        def loss(t):
            out = hash_encode(
                coords, t, jnp.asarray(cfg.resolutions, jnp.float32),
                interpolation=interp, table_size=cfg.hash_table_size,
            )
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(tables)
        assert g.shape == tables.shape
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_flax_module(self):
        cfg = HashEncodingConfig(
            n_levels=4, coords_dim=3, hash_table_size=2 ** 12, base_resolution=16
        )
        mod = HashEncoding(cfg)
        coords = jax.random.uniform(jax.random.PRNGKey(4), (8, 3))
        params = mod.init(jax.random.PRNGKey(5), coords)
        out = mod.apply(params, coords)
        assert out.shape == (8, cfg.output_dim)
        tables = params["params"]["tables"]
        assert tables.shape == (4, 2 ** 12, 2)
        a = np.asarray(tables)
        assert np.abs(a).max() <= 1e-4  # uniform(-1e-4, 1e-4) init

    def test_jit_and_batch_shapes(self):
        cfg, tables = self._setup("linear")
        f = jax.jit(
            lambda c: hash_encode(
                c, tables, jnp.asarray(cfg.resolutions, jnp.float32),
                interpolation="linear", table_size=cfg.hash_table_size,
            )
        )
        out = f(jax.random.uniform(jax.random.PRNGKey(6), (2, 5, 3)))
        assert out.shape == (2, 5, cfg.output_dim)


class TestPackedGatherVJP:
    """The F=2 fast path's custom VJP (two scalar f32 scatters instead of
    the complex-gather transpose) must be gradient-identical to autodiff
    of the plain row-gather formulation."""

    def test_gradient_matches_naive_autodiff(self):
        cfg = HashEncodingConfig(
            n_levels=4, coords_dim=3, hash_table_size=2 ** 10, base_resolution=8
        )
        key = jax.random.PRNGKey(0)
        tables = init_hash_tables(key, cfg)
        res = jnp.asarray(cfg.resolutions, jnp.float32)
        coords = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
        target = jax.random.normal(jax.random.PRNGKey(2), (64, cfg.output_dim))

        def loss_fast(t):
            out = hash_encode(
                coords, t, res, interpolation="linear",
                table_size=cfg.hash_table_size,
            )
            return jnp.sum((out - target) ** 2)

        def loss_naive(t):
            # identical math through a plain (LT, F) row gather: autodiff
            # emits the standard scatter-add transpose
            L, T, F = t.shape
            D = coords.shape[-1]
            from deepearth_tpu.ops.hash_encoding import _corner_offsets
            flat = coords.astype(jnp.float32)
            r = res[:, None]
            scaled = [r * flat[:, d][None, :] for d in range(D)]
            grid = [jnp.floor(s).astype(jnp.int32) for s in scaled]
            frac = [s - jnp.floor(s) for s in scaled]
            offs = (jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(T))[:, None]
            tflat = t.reshape(L * T, F)
            acc = jnp.zeros((coords.shape[0], L, F), jnp.float32)
            for bits in _corner_offsets(D):
                h = (grid[0] + bits[0]).astype(jnp.uint32) * jnp.uint32(HASH_PRIMES[0])
                for d in range(1, D):
                    h = h ^ ((grid[d] + bits[d]).astype(jnp.uint32)
                             * jnp.uint32(HASH_PRIMES[d]))
                idx = ((h & jnp.uint32(T - 1)) + offs).astype(jnp.int32)
                w = jnp.ones_like(frac[0])
                for d in range(D):
                    w = w * (frac[d] if bits[d] else 1.0 - frac[d])
                acc = acc + w.T[:, :, None] * tflat[idx].transpose(1, 0, 2)
            out = acc.reshape(coords.shape[0], L * F)
            return jnp.sum((out - target) ** 2)

        v_fast, g_fast = jax.value_and_grad(loss_fast)(tables)
        v_naive, g_naive = jax.value_and_grad(loss_naive)(tables)
        np.testing.assert_allclose(float(v_fast), float(v_naive), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_fast), np.asarray(g_naive), rtol=1e-5, atol=1e-8
        )
        # gradient must be non-trivial (scatters actually accumulated)
        assert np.abs(np.asarray(g_fast)).sum() > 0
