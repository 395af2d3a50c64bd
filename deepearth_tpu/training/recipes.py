"""Named training recipes reproducing the reference's specialised trainers.

* bidirectional reconstruction (reference:
  training/bidirectional_reconstruction.py)
* multimodal autoencoder with species-aware contrastive (reference:
  training/multimodal_autoencoder.py:959+, contrastive :362-395)
* vision-decoder finetune: freeze everything except the language→vision
  decoder (reference: training/train_vision_decoder.py:23-60)
* classifier baselines: embedding→species probes (reference:
  training/train_classifier.py)

Each recipe returns a jit-able ``step(state, batch, rng) -> (state, metrics)``.
Freezing is done with optax.multi_transform masks — the TPU-native analogue
of requires_grad=False.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from ..configs import OptimizerConfig
from ..models.bidirectional import BidirectionalReconstructor, MultimodalAutoencoder
from .losses import species_contrastive_loss
from .trainer import TrainState, create_optimizer


def frozen_optimizer(
    cfg: OptimizerConfig, params, trainable_predicate: Callable[[str], bool]
) -> optax.GradientTransformation:
    """Optimizer that freezes params whose flattened path fails the predicate
    (requires_grad=False equivalent)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    labels = traverse_util.unflatten_dict(
        {
            tuple(k.split("/")): ("train" if trainable_predicate(k) else "freeze")
            for k in flat
        }
    )
    return optax.multi_transform(
        {"train": create_optimizer(cfg), "freeze": optax.set_to_zero()},
        labels,
    )


def make_bidirectional_step(
    model: BidirectionalReconstructor,
) -> Callable:
    """vision↔language cross-reconstruction step. batch:
    {'vision': (B,S,Dv)|(B,Dv), 'language': (B,Dl)}."""

    def step(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        def loss_fn(params):
            out = model.apply(
                {"params": params},
                vision=batch["vision"],
                language=batch["language"],
                deterministic=False,
                rngs={"dropout": rng},
            )
            v_target = batch["vision"].astype(jnp.float32)
            if v_target.ndim == 3 and out["vision_from_language"].ndim == 2:
                v_target = v_target.mean(axis=1)
            l_v = jnp.mean(
                (out["vision_from_language"].astype(jnp.float32) - v_target) ** 2
            )
            l_l = jnp.mean(
                (
                    out["language_from_vision"].astype(jnp.float32)
                    - batch["language"].astype(jnp.float32)
                )
                ** 2
            )
            total = l_v + l_l
            return total, {
                "loss/vision_from_language": l_v,
                "loss/language_from_vision": l_l,
                "loss/total": total,
            }

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads=grads), metrics

    return step


def make_autoencoder_step(
    model: MultimodalAutoencoder,
    contrastive_weight: float = 0.1,
    classifier_weight: float = 1.0,
    temperature: float = 0.07,
) -> Callable:
    """Fusion-bottleneck AE + classifier + species-aware contrastive
    (reference: training/multimodal_autoencoder.py:362-395, 959+). batch:
    {'vision', 'language', 'species'}."""

    def step(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        def loss_fn(params):
            out = model.apply(
                {"params": params},
                vision=batch["vision"],
                language=batch["language"],
                deterministic=False,
                rngs={"dropout": rng},
            )
            v = batch["vision"].astype(jnp.float32)
            if v.ndim == 3:
                v = v.mean(axis=1)
            l_vrec = jnp.mean((out["vision_recon"].astype(jnp.float32) - v) ** 2)
            l_lrec = jnp.mean(
                (
                    out["language_recon"].astype(jnp.float32)
                    - batch["language"].astype(jnp.float32)
                )
                ** 2
            )
            l_cls = optax.softmax_cross_entropy_with_integer_labels(
                out["species_logits"].astype(jnp.float32), batch["species"]
            ).mean()
            l_con = species_contrastive_loss(
                out["embedding"].astype(jnp.float32), batch["species"], temperature
            )
            total = (
                l_vrec + l_lrec + classifier_weight * l_cls
                + contrastive_weight * l_con
            )
            acc = (
                jnp.argmax(out["species_logits"], -1) == batch["species"]
            ).mean()
            return total, {
                "loss/vision_recon": l_vrec,
                "loss/language_recon": l_lrec,
                "loss/classifier": l_cls,
                "loss/contrastive": l_con,
                "loss/total": total,
                "acc/species": acc,
            }

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads=grads), metrics

    return step


def create_vision_decoder_finetune_state(
    model: BidirectionalReconstructor,
    params,
    opt_cfg: Optional[OptimizerConfig] = None,
) -> TrainState:
    """Freeze all but the language→vision decoder
    (reference: training/train_vision_decoder.py:23-60)."""
    opt_cfg = opt_cfg or OptimizerConfig()
    tx = frozen_optimizer(
        opt_cfg, params, lambda path: "language_to_vision" in path
    )
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)
