"""Masked multimodal reconstruction losses.

One coherent loss replacing the reference's scattered variants:
weighted sum of masked spatial/temporal MSE + per-modality masked MSE /
cross-entropy + CLIP-style contrastive alignment
(reference: training/train_deepearth2.py:74-234, C-stack masked MSE
training/deepearth_multimodal_training.py:465-476, species-aware contrastive
training/multimodal_autoencoder.py:362-395).

Masked-row convention: losses average over rows whose mask is False
(the model had to reconstruct them), mirroring the C-stack trainer's
"loss only where mask=True(masked)" semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..configs import DeepEarthConfig


@dataclass
class LossWeights:
    spatial: float = 1.0
    temporal: float = 1.0
    modality: float = 1.0  # scaled further by ModalityConfig.loss_weight
    contrastive: float = 0.1
    # species-aware supervised contrastive on the fused representation
    # (reference: training/multimodal_autoencoder.py:362-395); needs a
    # categorical 'species' modality in the batch
    species_contrastive: float = 0.0
    moe_aux: float = 0.0
    contrastive_temperature: float = 0.07  # reference: train_deepearth2.py


def _masked_row_mean(per_row: jnp.ndarray, masked_rows: jnp.ndarray) -> jnp.ndarray:
    """Mean of per_row over rows where masked_rows is True (i.e. hidden)."""
    w = masked_rows.astype(per_row.dtype)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def clip_contrastive_loss(
    a: jnp.ndarray, b: jnp.ndarray, temperature: float
) -> jnp.ndarray:
    """Symmetric InfoNCE between two (B, D) embedding sets
    (reference: train_deepearth2.py CLIP losses, temperature 0.07)."""
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
    b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
    logits = (a @ b.T) / temperature
    labels = jnp.arange(a.shape[0])
    l_a = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    l_b = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return 0.5 * (l_a + l_b)


def species_contrastive_loss(
    emb: jnp.ndarray, labels: jnp.ndarray, temperature: float
) -> jnp.ndarray:
    """Species-aware supervised contrastive: all same-species pairs are
    positives (reference: training/multimodal_autoencoder.py:362-395)."""
    z = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
    sim = (z @ z.T) / temperature
    n = emb.shape[0]
    eye = jnp.eye(n, dtype=bool)
    pos = (labels[:, None] == labels[None, :]) & ~eye
    logits = jnp.where(eye, -1e30, sim)
    log_prob = logits - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    pos_count = pos.sum(axis=-1)
    per_anchor = jnp.where(
        pos_count > 0,
        -(log_prob * pos).sum(axis=-1) / jnp.maximum(pos_count, 1),
        0.0,
    )
    denom = jnp.maximum((pos_count > 0).sum(), 1)
    return per_anchor.sum() / denom


def deepearth_loss(
    outputs: Dict[str, Any],
    batch: Dict[str, Any],
    config: DeepEarthConfig,
    weights: Optional[LossWeights] = None,
    intermediates: Optional[Dict[str, Any]] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Compute the total loss and a metric dict.

    Targets come from the unmasked batch; masks say which rows were hidden
    from the model (mask False → hidden → contributes to loss).
    """
    w = weights or LossWeights()
    recon = outputs["reconstructions"]
    metrics: Dict[str, jnp.ndarray] = {}
    total = jnp.float32(0.0)

    # -- spatial / temporal ------------------------------------------------- #
    xyzt = batch["xyzt"].astype(jnp.float32)
    sp_mask = batch.get("spatial_mask")
    hidden_sp = (
        ~sp_mask if sp_mask is not None else jnp.ones(xyzt.shape[0], bool)
    )
    per_row = jnp.mean(
        (recon["spatial"].astype(jnp.float32) - xyzt[:, :3]) ** 2, axis=-1
    )
    l_sp = _masked_row_mean(per_row, hidden_sp)
    metrics["loss/spatial"] = l_sp
    total = total + w.spatial * l_sp

    t_mask = batch.get("temporal_mask")
    hidden_t = ~t_mask if t_mask is not None else jnp.ones(xyzt.shape[0], bool)
    per_row = jnp.mean(
        (recon["temporal"].astype(jnp.float32) - xyzt[:, 3:4]) ** 2, axis=-1
    )
    l_t = _masked_row_mean(per_row, hidden_t)
    metrics["loss/temporal"] = l_t
    total = total + w.temporal * l_t

    # -- per modality ------------------------------------------------------- #
    masks = batch.get("modality_masks", {})
    for name, m in config.modalities.items():
        if name not in recon or name not in batch.get("modalities", {}):
            continue
        target = batch["modalities"][name]
        hidden = (
            ~masks[name] if name in masks else jnp.ones(xyzt.shape[0], bool)
        )
        pred = recon[name].astype(jnp.float32)
        if m.encoding_type == "token_sequence":
            # MLM: per-token CE over hidden positions
            # (reference: train_deepearth2.py language CE)
            per_tok = optax.softmax_cross_entropy_with_integer_labels(
                pred, target.astype(jnp.int32)
            )  # (B, S)
            tok_mask = batch.get("modality_patch_masks", {}).get(name)
            hidden_tok = (
                ~tok_mask if tok_mask is not None
                else jnp.ones_like(per_tok, bool)
            )
            hidden_tok = hidden_tok | hidden[:, None]
            w_tok = hidden_tok.astype(jnp.float32)
            l_m = jnp.sum(per_tok * w_tok) / jnp.maximum(jnp.sum(w_tok), 1.0)
            acc_tok = (jnp.argmax(pred, -1) == target).astype(jnp.float32)
            metrics[f"acc/{name}"] = jnp.sum(acc_tok * w_tok) / jnp.maximum(
                jnp.sum(w_tok), 1.0
            )
            metrics[f"loss/{name}"] = l_m
            total = total + w.modality * m.loss_weight * l_m
            continue
        if m.encoding_type == "learned_embedding":
            per_row = optax.softmax_cross_entropy_with_integer_labels(
                pred, target.astype(jnp.int32)
            )
            acc_row = (jnp.argmax(pred, -1) == target).astype(jnp.float32)
            metrics[f"acc/{name}"] = _masked_row_mean(acc_row, hidden)
        elif m.decode_sequence and target.ndim == 3:
            # MAE: per-patch MSE over hidden patches (reference objective:
            # train_deepearth2.py vision MAE-style MSE)
            t = target.astype(jnp.float32)
            per_patch = jnp.mean((pred - t) ** 2, axis=-1)  # (B, S)
            patch_mask = batch.get("modality_patch_masks", {}).get(name)
            hidden_patch = (
                ~patch_mask if patch_mask is not None
                else jnp.ones_like(per_patch, bool)
            )
            hidden_patch = hidden_patch | hidden[:, None]
            w_p = hidden_patch.astype(jnp.float32)
            l_m = jnp.sum(per_patch * w_p) / jnp.maximum(jnp.sum(w_p), 1.0)
            metrics[f"loss/{name}"] = l_m
            total = total + w.modality * m.loss_weight * l_m
            continue
        else:
            t = target.astype(jnp.float32)
            if t.ndim == 3:  # (B, S, D) native sequence → pooled target
                t = t.mean(axis=1)
            per_row = jnp.mean((pred - t) ** 2, axis=-1)
        l_m = _masked_row_mean(per_row, hidden)
        metrics[f"loss/{name}"] = l_m
        total = total + w.modality * m.loss_weight * l_m

    # -- contrastive alignment across modalities ---------------------------- #
    if w.contrastive > 0:
        mt = outputs["modality_tokens"]
        names = [n for n in sorted(config.modalities) if n in mt]
        pooled = {n: mt[n].mean(axis=1) for n in names}
        if "spacetime" in mt:
            pooled["spacetime"] = mt["spacetime"].mean(axis=1)
        keys = sorted(pooled)
        n_pairs = 0
        l_c = jnp.float32(0.0)
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                l_c = l_c + clip_contrastive_loss(
                    pooled[keys[i]], pooled[keys[j]], w.contrastive_temperature
                )
                n_pairs += 1
        if n_pairs:
            l_c = l_c / n_pairs
            metrics["loss/contrastive"] = l_c
            total = total + w.contrastive * l_c

    # -- species-aware contrastive ------------------------------------------- #
    if (
        w.species_contrastive > 0
        and "species" in batch.get("modalities", {})
        and "fused_representation" in outputs
    ):
        l_sc = species_contrastive_loss(
            outputs["fused_representation"].astype(jnp.float32),
            batch["modalities"]["species"].astype(jnp.int32),
            w.contrastive_temperature,
        )
        metrics["loss/species_contrastive"] = l_sc
        total = total + w.species_contrastive * l_sc

    # -- MoE aux ------------------------------------------------------------- #
    if w.moe_aux > 0 and intermediates:
        aux_terms = [
            jnp.asarray(v).mean()
            for path, v in jax.tree_util.tree_leaves_with_path(intermediates)
            if any("moe_aux_loss" in str(p) for p in path)
        ]
        if aux_terms:
            l_aux = sum(aux_terms) / len(aux_terms)
            metrics["loss/moe_aux"] = l_aux
            total = total + w.moe_aux * l_aux

    # -- human-unit error metrics (reference: SPECIFICATIONS.MD:1811-1878) --- #
    if "spatial_span_m" in batch:
        from .metrics import coordinate_error_meters

        metrics["err/xyz_m"] = coordinate_error_meters(
            recon["spatial"], xyzt[:, :3], batch["spatial_span_m"]
        )
    if "temporal_span_h" in batch:
        from .metrics import time_error_hours

        metrics["err/t_h"] = time_error_hours(
            recon["temporal"], xyzt[:, 3:4], batch["temporal_span_h"]
        )

    metrics["loss/total"] = total
    return total, metrics
