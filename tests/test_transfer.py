"""Int8-compressed host→device transfer (data/transfer.py): round-trip
accuracy, payload shrinkage, prefetch integration, and model-output
equivalence through the dequantized path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepearth_tpu.data import (
    compress_batch,
    decompress_on_device,
    device_prefetch_compressed,
    quantize_rows,
)
from deepearth_tpu.data.transfer import compressed_bytes


def _batch(b=4, s=6, c=32, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "xyzt": rng.random((b, 4)).astype(np.float32),
        "modalities": {
            "species": rng.integers(0, 10, b).astype(np.int32),
            "vision": (rng.standard_normal((b, s, c)) * 3).astype(np.float32),
            "language": rng.standard_normal((b, 16)).astype(np.float32),
        },
    }


class TestQuantizeRows:
    def test_roundtrip_error_bounded(self):
        x = np.random.default_rng(1).standard_normal((8, 64)).astype(np.float32)
        q, scale = quantize_rows(x)
        assert q.dtype == np.int8 and scale.dtype == np.float16
        back = q.astype(np.float32) * scale.astype(np.float32)
        # symmetric per-row int8: error <= scale/2 = max|row|/254 per element
        bound = np.abs(x).max(axis=-1, keepdims=True) / 254 + 1e-6
        assert (np.abs(back - x) <= bound * 1.01).all()

    def test_zero_rows_and_scale_shape(self):
        x = np.zeros((3, 2, 16), np.float32)
        q, scale = quantize_rows(x)
        assert q.shape == x.shape and scale.shape == (3, 2, 1)
        np.testing.assert_array_equal(q, 0)


class TestCompressedBatch:
    def test_payload_halves_vs_float16(self):
        batch = _batch(b=8, s=24, c=1408)
        comp = compress_batch(batch, ("vision", "language"))
        f16 = jax.tree_util.tree_map(
            lambda x: x.astype(np.float16)
            if np.issubdtype(x.dtype, np.floating) else x,
            batch,
        )
        ratio = compressed_bytes(comp) / compressed_bytes(f16)
        assert ratio < 0.52  # int8 + f16 row scales vs f16

    def test_int_and_absent_keys_pass_through(self):
        batch = _batch()
        comp = compress_batch(batch, ("vision", "species", "missing"))
        assert comp["modalities"]["species"].dtype == np.int32
        assert isinstance(comp["modalities"]["vision"], dict)

    def test_decompress_matches_host_dequant(self):
        batch = _batch()
        comp = compress_batch(batch, ("vision", "language"))
        dev = jax.tree_util.tree_map(jnp.asarray, comp)
        out = jax.jit(lambda b: decompress_on_device(b, jnp.float32))(dev)
        vis = np.asarray(out["modalities"]["vision"])
        assert vis.dtype == np.float32
        rel = np.abs(vis - batch["modalities"]["vision"]).max() / np.abs(
            batch["modalities"]["vision"]
        ).max()
        assert rel < 0.01
        # untouched leaves intact
        np.testing.assert_array_equal(
            np.asarray(out["modalities"]["species"]),
            batch["modalities"]["species"],
        )

    def test_prefetch_compressed_iterator(self):
        batches = [_batch(seed=i) for i in range(3)]
        got = list(device_prefetch_compressed(iter(batches), ("vision",)))
        assert len(got) == 3
        for raw, dev in zip(batches, got):
            vis = np.asarray(dev["modalities"]["vision"], np.float32)
            assert (
                np.abs(vis - raw["modalities"]["vision"]).max()
                / np.abs(raw["modalities"]["vision"]).max()
                < 0.01
            )


class TestModelEquivalence:
    def test_forward_close_through_int8_path(self):
        """DeepEarthModel forward over the dequantized batch stays within
        int8 feature-rounding of the float batch (the claim that extractor
        embeddings tolerate 8-bit transfer)."""
        from deepearth_tpu.configs import ModalityConfig, tiny_config
        from deepearth_tpu.models import DeepEarthModel

        cfg = tiny_config()
        cfg.add_modality(
            ModalityConfig(
                name="vision", input_dim=32, n_tokens=2,
                encoder_layers=1, encoder_heads=4,
            )
        )
        model = DeepEarthModel(cfg)
        batch = _batch(b=4, s=4, c=32)
        del batch["modalities"]["language"]
        params = model.init(jax.random.PRNGKey(0), batch)["params"]

        def fwd(b):
            out = model.apply({"params": params}, b, deterministic=True)
            return out["fused_representation"]

        ref = fwd(jax.tree_util.tree_map(jnp.asarray, batch))
        comp = jax.tree_util.tree_map(
            jnp.asarray, compress_batch(batch, ("vision",))
        )
        got = jax.jit(
            lambda b: fwd(decompress_on_device(b, jnp.float32))
        )(comp)
        ref, got = np.asarray(ref, np.float32), np.asarray(got, np.float32)
        denom = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / denom < 0.05
