"""Weight-transplant parity tests vs torch reference math (<1e-4 gate).

Builds torch modules implementing the reference's documented semantics
(independently written, not imported), transplants flax weights into them,
and compares activations end-to-end. Covers the A-stack transformer block
(reference: models/transformers.py:16-161), the Grid4D projection head
(models/encoders.py:47-52), and MLA attention
(encoders/modeling_deepseek.py:627-856).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepearth_tpu.configs import MLAConfig, TransformerConfig
from deepearth_tpu.models import MLAttention, TransformerBlock

torch = pytest.importorskip("torch")

TOL = 1e-4


def t(x):
    return torch.tensor(np.asarray(x, np.float32))


class TorchRefBlock(torch.nn.Module):
    """Pre-norm RoPE transformer block, reference semantics
    (models/transformers.py:16-161), weights injected."""

    def __init__(self, p, hidden, heads):
        super().__init__()
        self.hidden = hidden
        self.heads = heads
        self.hd = hidden // heads
        a = p["attention"]
        self.wq = t(a["q_proj"]["kernel"])
        self.wk = t(a["k_proj"]["kernel"])
        self.wv = t(a["v_proj"]["kernel"])
        self.wo = t(a["out_proj"]["kernel"])
        self.n1_s, self.n1_b = t(p["norm1"]["scale"]), t(p["norm1"]["bias"])
        self.n2_s, self.n2_b = t(p["norm2"]["scale"]), t(p["norm2"]["bias"])
        self.fc1_w, self.fc1_b = t(p["mlp"]["fc1"]["kernel"]), t(p["mlp"]["fc1"]["bias"])
        self.fc2_w, self.fc2_b = t(p["mlp"]["fc2"]["kernel"]), t(p["mlp"]["fc2"]["bias"])

    def _ln(self, x, s, b):
        return torch.nn.functional.layer_norm(x, (self.hidden,), s, b, eps=1e-6)

    def _rope(self, x, n):
        # interleaved complex formulation (models/transformers.py:57-71)
        d = self.hd
        freqs = 1.0 / (10000 ** (torch.arange(0, d, 2).float() / d))
        fr = torch.outer(torch.arange(n).float(), freqs)
        cis = torch.polar(torch.ones_like(fr), fr)
        xc = torch.view_as_complex(x.float().reshape(*x.shape[:-1], -1, 2))
        return torch.view_as_real(xc * cis).reshape(*x.shape)

    def forward(self, x):
        b, n, _ = x.shape
        h = self._ln(x, self.n1_s, self.n1_b)
        q = (h @ self.wq).view(b, n, self.heads, self.hd).transpose(1, 2)
        k = (h @ self.wk).view(b, n, self.heads, self.hd).transpose(1, 2)
        v = (h @ self.wv).view(b, n, self.heads, self.hd).transpose(1, 2)
        q, k = self._rope(q, n), self._rope(k, n)
        scores = q @ k.transpose(-2, -1) * self.hd ** -0.5
        att = torch.softmax(scores, dim=-1)
        out = (att @ v).transpose(1, 2).reshape(b, n, self.hidden) @ self.wo
        x = x + out
        h = self._ln(x, self.n2_s, self.n2_b)
        h = torch.nn.functional.gelu(h @ self.fc1_w + self.fc1_b)
        return x + (h @ self.fc2_w + self.fc2_b)


class TestTransformerBlockParity:
    def test_block_forward_under_1e4(self):
        cfg = TransformerConfig(hidden_dim=64, n_heads=4, n_layers=1)
        mod = TransformerBlock(cfg)
        x = np.random.default_rng(0).standard_normal((2, 6, 64)).astype(np.float32)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
        ref = TorchRefBlock(params, 64, 4)(t(x)).detach().numpy()
        diff = np.abs(ours - ref).max()
        assert diff < TOL, f"divergence {diff:.2e}"


class TorchRefMLA(torch.nn.Module):
    """MLA attention, reference semantics
    (encoders/modeling_deepseek.py:627-856), weights injected."""

    def __init__(self, p, cfg: MLAConfig):
        super().__init__()
        self.cfg = cfg
        self.wq = t(p["q_proj"]["kernel"])
        self.w_kv_a = t(p["kv_a_proj_with_mqa"]["kernel"])
        self.kv_ln = t(p["kv_a_layernorm"]["weight"])
        self.w_kv_b = t(p["kv_b_proj"]["kernel"])
        self.wo = t(p["o_proj"]["kernel"])

    def _rms(self, x, w):
        var = x.pow(2).mean(-1, keepdim=True)
        return x * torch.rsqrt(var + 1e-6) * w

    def _rope_ds(self, x, n, d):
        # deepseek convention: de-interleave then rotate_half
        # (modeling_deepseek.py:360-371)
        b, h, s, _ = x.shape
        x = x.view(b, h, s, d // 2, 2).transpose(4, 3).reshape(b, h, s, d)
        inv = 1.0 / (10000 ** (torch.arange(0, d, 2).float() / d))
        fr = torch.outer(torch.arange(n).float(), inv)
        emb = torch.cat((fr, fr), -1)
        x1, x2 = x[..., : d // 2], x[..., d // 2 :]
        rot = torch.cat((-x2, x1), -1)
        return x * emb.cos() + rot * emb.sin()

    def forward(self, x):
        c = self.cfg
        b, n, _ = x.shape
        H, nope, rd, vh = c.n_heads, c.qk_nope_head_dim, c.qk_rope_head_dim, c.v_head_dim
        qh = nope + rd
        q = (x @ self.wq).view(b, n, H, qh).transpose(1, 2)
        q_nope, q_pe = q[..., :nope], q[..., nope:]
        ckv = x @ self.w_kv_a
        compressed, k_pe = ckv[..., : c.kv_lora_rank], ckv[..., c.kv_lora_rank :]
        k_pe = k_pe.view(b, n, 1, rd).transpose(1, 2)
        kv = (self._rms(compressed, self.kv_ln) @ self.w_kv_b).view(
            b, n, H, nope + vh
        ).transpose(1, 2)
        k_nope, v = kv[..., :nope], kv[..., nope:]
        q_pe = self._rope_ds(q_pe, n, rd)
        k_pe = self._rope_ds(k_pe, n, rd).expand(b, H, n, rd)
        q_full = torch.cat([q_nope, q_pe], -1)
        k_full = torch.cat([k_nope, k_pe], -1)
        att = torch.softmax(
            (q_full @ k_full.transpose(-2, -1)) * qh ** -0.5, dim=-1,
            dtype=torch.float32,
        )
        out = (att @ v).transpose(1, 2).reshape(b, n, H * vh)
        return out @ self.wo


class TestMLAParity:
    def test_mla_forward_under_1e4(self):
        cfg = MLAConfig(
            hidden_dim=64, n_heads=4, q_lora_rank=None, kv_lora_rank=16,
            qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
        )
        mod = MLAttention(cfg)
        x = np.random.default_rng(1).standard_normal((2, 5, 64)).astype(np.float32)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
        ref = TorchRefMLA(params, cfg)(t(x)).detach().numpy()
        diff = np.abs(ours - ref).max()
        assert diff < TOL, f"divergence {diff:.2e}"


class TestHashNearestParity:
    def test_nearest_mode_bitwise_for_pow2_tables(self):
        """nearest-mode indices are bit-identical to the reference's int64
        hash for power-of-two tables (see ops/hash_encoding.py docstring)."""
        from deepearth_tpu.configs import HashEncodingConfig
        from deepearth_tpu.ops import HASH_PRIMES, hash_encode, init_hash_tables

        cfg = HashEncodingConfig(
            n_levels=3, n_features_per_level=2, coords_dim=3,
            hash_table_size=2 ** 12, base_resolution=16,
        )
        tables = init_hash_tables(jax.random.PRNGKey(0), cfg)
        coords = np.random.default_rng(2).random((32, 3)).astype(np.float32)
        ours = np.asarray(
            hash_encode(
                jnp.asarray(coords), tables,
                jnp.asarray(cfg.resolutions, jnp.float32),
                interpolation="nearest", table_size=cfg.hash_table_size,
            )
        )
        tab = torch.tensor(np.asarray(tables))
        feats = []
        for li, res in enumerate(cfg.resolutions):
            grid = torch.floor(torch.tensor(coords) * res).long()
            h = torch.zeros(32, dtype=torch.long)
            for d in range(3):
                h ^= grid[:, d] * HASH_PRIMES[d]
            feats.append(tab[li][h % cfg.hash_table_size])
        ref = torch.cat(feats, -1).numpy()
        np.testing.assert_array_equal(ours, ref)


class TorchRefFusionLayer(torch.nn.Module):
    """Fusion layer with rotate_half RoPE + gated MLP, reference semantics
    (models/cross_modal_fusion.py:167-350), weights injected."""

    def __init__(self, p, dim, heads):
        super().__init__()
        self.dim, self.heads = dim, heads
        self.hd = dim // heads
        a = p["self_attn"]
        self.wq, self.wk = t(a["q_proj"]["kernel"]), t(a["k_proj"]["kernel"])
        self.wv, self.wo = t(a["v_proj"]["kernel"]), t(a["out_proj"]["kernel"])
        self.n1s, self.n1b = t(p["self_attn_norm"]["scale"]), t(p["self_attn_norm"]["bias"])
        self.n2s, self.n2b = t(p["mlp_norm"]["scale"]), t(p["mlp_norm"]["bias"])
        m = p["mlp"]
        self.wg, self.wu = t(m["gate_proj"]["kernel"]), t(m["up_proj"]["kernel"])
        self.wd = t(m["down_proj"]["kernel"])

    def _ln(self, x, s, b):
        return torch.nn.functional.layer_norm(x, (self.dim,), s, b, eps=1e-6)

    def _rope(self, x, n):
        d = self.hd
        inv = 1.0 / (10000 ** (torch.arange(0, d, 2).float() / d))
        fr = torch.outer(torch.arange(n).float(), inv)
        emb = torch.cat((fr, fr), -1)
        x1, x2 = x[..., : d // 2], x[..., d // 2 :]
        rot = torch.cat((-x2, x1), -1)
        return x * emb.cos() + rot * emb.sin()

    def forward(self, x):
        b, n, _ = x.shape
        h = self._ln(x, self.n1s, self.n1b)
        q = (h @ self.wq).view(b, n, self.heads, self.hd).transpose(1, 2)
        k = (h @ self.wk).view(b, n, self.heads, self.hd).transpose(1, 2)
        v = (h @ self.wv).view(b, n, self.heads, self.hd).transpose(1, 2)
        q, k = self._rope(q, n), self._rope(k, n)
        att = torch.softmax(q @ k.transpose(-2, -1) * self.hd ** -0.5, -1)
        x = x + (att @ v).transpose(1, 2).reshape(b, n, self.dim) @ self.wo
        h = self._ln(x, self.n2s, self.n2b)
        gated = torch.nn.functional.silu(h @ self.wg) * (h @ self.wu)
        return x + gated @ self.wd


class TestFusionLayerParity:
    def test_fusion_layer_under_1e4(self):
        from deepearth_tpu.configs import FusionConfig
        from deepearth_tpu.models import FusionLayer

        cfg = FusionConfig(universal_dim=64, num_fusion_layers=1, num_heads=4,
                           cross_attention_freq=100)  # layer 1 → no cross-attn
        mod = FusionLayer(cfg, layer_idx=1)
        x = np.random.default_rng(3).standard_normal((2, 5, 64)).astype(np.float32)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
        ref = TorchRefFusionLayer(params, 64, 4)(t(x)).detach().numpy()
        diff = np.abs(ours - ref).max()
        assert diff < TOL, f"divergence {diff:.2e}"


class TestGrid4DParity:
    def test_grid4d_nearest_under_1e4(self):
        """Full Grid4D forward (nearest mode) vs torch mirror of
        models/encoders.py:12-85 with transplanted weights."""
        import dataclasses

        from deepearth_tpu.configs import Grid4DConfig, HashEncodingConfig
        from deepearth_tpu.models import Grid4DEncoder
        from deepearth_tpu.ops import HASH_PRIMES

        cfg = Grid4DConfig(
            n_spatial_levels=4, n_temporal_levels=2, n_features_per_level=2,
            hash_table_size=2 ** 10,
        )
        cfg.spatial = dataclasses.replace(cfg.spatial, interpolation="nearest")
        cfg.temporal = dataclasses.replace(cfg.temporal, interpolation="nearest")
        mod = Grid4DEncoder(cfg, hidden_dim=32)
        xyzt = np.random.default_rng(0).random((8, 4)).astype(np.float32)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(xyzt))["params"]
        ours = np.asarray(mod.apply({"params": params}, jnp.asarray(xyzt)))

        def torch_hash_feats(tables, coords, resolutions, table_size):
            feats = []
            tab = torch.tensor(np.asarray(tables))
            c = torch.tensor(coords)
            for li, res in enumerate(resolutions):
                grid = torch.floor(c * res).long()
                h = torch.zeros(len(coords), dtype=torch.long)
                for d in range(c.shape[1]):
                    h ^= grid[:, d] * HASH_PRIMES[d]
                feats.append(tab[li][h % table_size])
            return torch.cat(feats, -1)

        sp = torch_hash_feats(
            params["spatial"]["tables"], xyzt[:, :3],
            cfg.spatial.resolutions, cfg.spatial.hash_table_size,
        )
        tm = torch_hash_feats(
            params["temporal"]["tables"], xyzt[:, 3:4],
            cfg.temporal.resolutions, cfg.temporal.hash_table_size,
        )
        combined = torch.cat([sp, tm], -1)
        # projection: Dense → LayerNorm → GELU → Dense (models/encoders.py:47-52)
        h = combined @ t(params["proj_in"]["kernel"]) + t(params["proj_in"]["bias"])
        h = torch.nn.functional.layer_norm(
            h, (32,), t(params["proj_norm"]["scale"]),
            t(params["proj_norm"]["bias"]), eps=1e-6,
        )
        h = torch.nn.functional.gelu(h)
        ref = (h @ t(params["proj_out"]["kernel"]) + t(params["proj_out"]["bias"]))
        diff = np.abs(ours - ref.numpy()).max()
        assert diff < TOL, f"divergence {diff:.2e}"
