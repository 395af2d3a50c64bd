"""Grid4D spacetime encoder.

Combines the A-stack split (xyz + t hash encoders, reference:
models/encoders.py:12-85) with the spec-stack Grid4D decomposition
(xyz + xyt/yzt/xzt, reference: SPECIFICATIONS.MD:1068-1200) behind one config
flag. Masking is multiplicative on features, matching the reference's quirky
semantics (models/encoders.py:73-79) — masked coordinates contribute zero
features rather than being attention-masked.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..configs import Grid4DConfig
from ..ops.hash_encoding import HashEncoding

# Coordinate index triples for the spacetime decompositions.
_DECOMPOSITIONS = {"xyt": (0, 1, 3), "yzt": (1, 2, 3), "xzt": (0, 2, 3)}


class Grid4DEncoder(nn.Module):
    """(x, y, z, t) → hidden_dim embedding via multi-resolution hash grids."""

    cfg: Grid4DConfig
    hidden_dim: int
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyzt: jnp.ndarray,
        spatial_mask: Optional[jnp.ndarray] = None,
        temporal_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Args:
            xyzt: (B, 4) normalized coordinates in [0, 1].
            spatial_mask: (B,) bool — False zeroes the spatial features.
            temporal_mask: (B,) bool — False zeroes the temporal features.
        Returns:
            (B, hidden_dim)
        """
        cfg = self.cfg
        if cfg.encoding_mode == "sincos":
            return self._sincos(xyzt, spatial_mask, temporal_mask)
        xyz = xyzt[:, :3]
        t = xyzt[:, 3:4]

        spatial = HashEncoding(cfg.spatial, self.param_dtype, name="spatial")(xyz)
        if spatial_mask is not None:
            spatial = spatial * spatial_mask[:, None].astype(spatial.dtype)

        temporal = HashEncoding(cfg.temporal, self.param_dtype, name="temporal")(t)
        if temporal_mask is not None:
            temporal = temporal * temporal_mask[:, None].astype(temporal.dtype)

        feats = [spatial, temporal]
        if cfg.use_decompositions:
            both = None
            if spatial_mask is not None or temporal_mask is not None:
                sm = (
                    spatial_mask
                    if spatial_mask is not None
                    else jnp.ones(xyzt.shape[0], bool)
                )
                tm = (
                    temporal_mask
                    if temporal_mask is not None
                    else jnp.ones(xyzt.shape[0], bool)
                )
                both = (sm & tm)[:, None]
            for name, idx in _DECOMPOSITIONS.items():
                f = HashEncoding(cfg.decomposition, self.param_dtype, name=name)(
                    xyzt[:, list(idx)]
                )
                if both is not None:
                    f = f * both.astype(f.dtype)
                feats.append(f)

        combined = jnp.concatenate(feats, axis=-1).astype(self.compute_dtype)

        # Projection MLP (reference: models/encoders.py:47-52).
        h = nn.Dense(
            self.hidden_dim, dtype=self.compute_dtype, param_dtype=self.param_dtype,
            name="proj_in",
        )(combined)
        # epsilon matches torch's nn.LayerNorm default (1e-5): the reference
        # uses a plain LayerNorm here (models/encoders.py:49) and hash
        # features initialize at ~1e-4 scale, so var ≪ eps and the epsilon
        # CHOICE sets the output scale (3.2× at init between 1e-5 and 1e-6
        # — caught by tests/test_parity_reference.py against the reference's
        # actual module)
        h = nn.LayerNorm(
            epsilon=1e-5, dtype=self.compute_dtype, param_dtype=self.param_dtype,
            name="proj_norm",
        )(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(
            self.hidden_dim, dtype=self.compute_dtype, param_dtype=self.param_dtype,
            name="proj_out",
        )(h)
        return h

    def _sincos(self, xyzt, spatial_mask, temporal_mask):
        """Periodic-time + multi-scale-space variant
        (reference: training/vjepa2_integration.py:32-80): hour/day/year
        sin-cos features and xyz at 10/100/1000 m scales, each through a
        linear layer, concatenated into a fusion MLP. Table-free — every op
        is a dense matmul, the most MXU-friendly Grid4D option."""
        cfg = self.cfg
        cd, pd = self.compute_dtype, self.param_dtype
        two_pi = 2.0 * jnp.pi

        seconds = xyzt[:, 3] * cfg.time_span_seconds
        hours = (seconds / 3600.0) % 24.0
        days = (seconds / 86400.0) % 365.0
        years = seconds / (86400.0 * 365.0)
        periodic = {
            "hourly": jnp.stack(
                [jnp.sin(two_pi * hours / 24.0), jnp.cos(two_pi * hours / 24.0)], -1
            ),
            "daily": jnp.stack(
                [jnp.sin(two_pi * days / 365.0), jnp.cos(two_pi * days / 365.0)], -1
            ),
            "yearly": jnp.stack(
                [jnp.sin(two_pi * years), jnp.cos(two_pi * years)], -1
            ),
        }
        feats = []
        for name, v in periodic.items():
            f = nn.Dense(
                cfg.sincos_feat_dim, dtype=cd, param_dtype=pd,
                name=f"temporal_{name}",
            )(v.astype(cd))
            if temporal_mask is not None:
                f = f * temporal_mask[:, None].astype(f.dtype)
            feats.append(f)

        xyz_m = xyzt[:, :3] * cfg.spatial_span_meters
        for i, scale in enumerate(cfg.spatial_scales_m):
            f = nn.Dense(
                cfg.sincos_feat_dim, dtype=cd, param_dtype=pd,
                name=f"spatial_scale{i}",
            )((xyz_m / scale).astype(cd))
            if spatial_mask is not None:
                f = f * spatial_mask[:, None].astype(f.dtype)
            feats.append(f)

        h = jnp.concatenate(feats, axis=-1)
        h = nn.Dense(
            cfg.sincos_mlp_dim, dtype=cd, param_dtype=pd, name="fusion_in"
        )(h)
        h = nn.relu(h)
        h = nn.Dense(
            self.hidden_dim, dtype=cd, param_dtype=pd, name="fusion_out"
        )(h)
        return h
