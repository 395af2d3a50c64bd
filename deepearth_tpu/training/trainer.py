"""Training harness: optimizer, jit train/eval steps, checkpointing.

Replaces the reference's per-stack trainers with one jit-compiled step
(reference call stack: training/deepearth_multimodal_training.py:325-538,
hpc/train_distrbuted.py:216-441). Checkpointing reproduces the reference's
latest/best/keep-3 rotation semantics (reference:
hpc/train_distrbuted.py:613-641) via orbax.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import optax
from flax.training import train_state

from ..configs import DeepEarthConfig, OptimizerConfig
from .losses import LossWeights, deepearth_loss
from .masking import mae_patch_mask, mlm_token_mask, sample_masks
from .metrics import MetricAccumulator, format_epoch_line

logger = logging.getLogger("DeepEarth.Trainer")


class TrainState(train_state.TrainState):
    """Standard flax TrainState; kept as a named subclass for checkpoints."""


def create_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    if cfg.schedule == "cosine":
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.total_steps, cfg.warmup_steps + 1),
        )
    elif cfg.schedule == "onecycle":
        # Reference uses OneCycle (models/deepearth_integrated.py OneCycleLR).
        schedule = optax.cosine_onecycle_schedule(
            transition_steps=cfg.total_steps, peak_value=cfg.learning_rate
        )
    else:
        schedule = cfg.learning_rate
    import jax.numpy as jnp

    mu_dtype = jnp.bfloat16 if cfg.moment_dtype == "bfloat16" else None
    if getattr(cfg, "fused", True):
        from .optimizers import fused_adamw

        tx = fused_adamw(
            schedule, b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.weight_decay,
            clip_norm=cfg.grad_clip_norm, mu_dtype=mu_dtype,
            second_moment=getattr(cfg, "second_moment", "float32"),
        )
    else:
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.adamw(
                schedule, b1=cfg.b1, b2=cfg.b2,
                weight_decay=cfg.weight_decay, mu_dtype=mu_dtype,
            ),
        )
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


def make_train_step(
    model,
    config: DeepEarthConfig,
    loss_weights: Optional[LossWeights] = None,
    apply_masking: bool = True,
    microbatch_steps: int = 1,
    grad_accum_shardings: Any = None,
) -> Callable:
    """Build the jit-able train step: sample masks → forward → loss → update.

    ``microbatch_steps=k`` splits the batch into k equal microbatches and
    accumulates gradients over a ``lax.scan`` INSIDE the compiled step, so
    per-step activation/remat temporaries scale with the microbatch (O(B/k))
    while the optimizer update still sees the full-batch mean gradient. This
    is the activation-memory lever for the multi-chip flagship gate
    (tools/multichip_flagship.py): grad accumulation across *separate* step
    calls (optax.MultiSteps) never shrinks the per-call activation peak.
    With masking disabled and no dropout the accumulated gradient equals the
    full-batch gradient exactly (mean of equal-sized microbatch means);
    with masking enabled each microbatch draws its own masks, which only
    changes WHICH rows are hidden, not the objective's distribution.
    """
    weights = loss_weights or LossWeights()
    modality_names = tuple(sorted(config.modalities))
    modality_probs = {
        name: m.mask_prob for name, m in config.modalities.items()
    }

    def mask_batch(batch: Dict[str, Any], rng_mask, rng_patch):
        masks = sample_masks(
            rng_mask,
            batch["xyzt"].shape[0],
            modality_names,
            config.masking,
            modality_probs,
        )
        batch = {**batch, **masks}
        # per-patch / per-token masking (reference: train_deepearth2.py
        # 75% MAE vision patches, 15% MLM language tokens)
        patch_masks = dict(batch.get("modality_patch_masks", {}))
        pkeys = jax.random.split(rng_patch, max(len(modality_names), 1))
        for i, name in enumerate(modality_names):
            if name in patch_masks or name not in batch.get("modalities", {}):
                continue
            x = batch["modalities"][name]
            m = config.modalities[name]
            if m.encoding_type == "token_sequence" and x.ndim == 2:
                patch_masks[name] = mlm_token_mask(
                    pkeys[i], x.shape[0], x.shape[1],
                    config.masking.language_token_mask_prob,
                )
            elif m.encoding_type == "continuous_values" and x.ndim == 3:
                patch_masks[name] = mae_patch_mask(
                    pkeys[i], x.shape[0], x.shape[1],
                    config.masking.vision_patch_mask_prob,
                )
        if patch_masks:
            batch = {**batch, "modality_patch_masks": patch_masks}
        return batch

    def grads_fn(params, batch: Dict[str, Any], rng: jax.Array):
        rng_mask, rng_patch, rng_drop = jax.random.split(rng, 3)
        if apply_masking:
            batch = mask_batch(batch, rng_mask, rng_patch)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params},
                batch,
                deterministic=False,
                rngs={"dropout": rng_drop},
                mutable=["intermediates"],
            )
            loss, metrics = deepearth_loss(
                out, batch, config, weights, mut.get("intermediates")
            )
            return loss, metrics

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def train_step(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        (loss, metrics), grads = grads_fn(state.params, batch, rng)
        state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return state, metrics

    if microbatch_steps <= 1:
        return train_step

    k = int(microbatch_steps)

    def train_step_mb(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        import jax.numpy as jnp

        B = batch["xyzt"].shape[0]
        if B % k:
            raise ValueError(f"batch {B} not divisible by microbatch_steps {k}")

        # Record which leaves actually got split so take_mb never indexes a
        # non-batched leaf whose leading dim coincidentally equals k
        # (ADVICE r4: re-inferring from shape[0]==k silently fed each
        # microbatch a different slice of a replicated leaf).
        split_flags = jax.tree_util.tree_map(
            lambda x: bool(
                hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == B
            ),
            batch,
        )
        mb_batch = jax.tree_util.tree_map(
            lambda x, s: x.reshape((k, B // k) + x.shape[1:]) if s else x,
            batch, split_flags,
        )
        rngs = jax.random.split(rng, k)

        def take_mb(i):
            return jax.tree_util.tree_map(
                lambda x, s: x[i] if s else x, mb_batch, split_flags
            )

        # carry structure from an abstract pass (no FLOPs, no memory)
        out_shape = jax.eval_shape(
            grads_fn, state.params, take_mb(0), rngs[0]
        )
        carry0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), out_shape
        )

        def constrain_grads(carry):
            # Pin the gradient accumulator to the caller's (FSDP storage)
            # layout. Without this, GSPMD keeps the scan carry at the
            # COMPUTE replication — two param-sized trees at ~3x the storage
            # footprint on the flagship mesh (measured: 12.7 GB of the
            # per-device temps, tools/multichip_flagship.py). Constraining
            # here makes each microbatch reduce-scatter its gradients into
            # the sharded carry instead.
            if grad_accum_shardings is None:
                return carry
            lm, grads = carry
            grads = jax.tree_util.tree_map(
                jax.lax.with_sharding_constraint, grads, grad_accum_shardings
            )
            return (lm, grads)

        carry0 = constrain_grads(carry0)

        def body(carry, xs):
            i = xs
            out = grads_fn(state.params, take_mb(i), rngs[i])
            carry = jax.tree_util.tree_map(jnp.add, carry, out)
            return constrain_grads(carry), None

        carry, _ = jax.lax.scan(body, carry0, jnp.arange(k))
        (loss_sum, metrics_sum), grad_sum = carry
        inv = 1.0 / k
        grads = jax.tree_util.tree_map(
            lambda g: (g * jnp.asarray(inv, g.dtype)), grad_sum
        )
        metrics = jax.tree_util.tree_map(lambda m: m * inv, metrics_sum)
        state = state.apply_gradients(grads=grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return state, metrics

    return train_step_mb


def make_eval_step(
    model,
    config: DeepEarthConfig,
    loss_weights: Optional[LossWeights] = None,
    apply_masking: bool = True,
) -> Callable:
    """Eval step with DETERMINISTIC masking: validation must hide the same
    entries every pass, or masked-reconstruction val losses are trivially
    zero on fully-visible batches (reference: SPECIFICATIONS.MD targeted-mask
    validation).

    Masks are keyed by ``batch_index`` so each validation batch hides a
    different set of rows (no positional correlation across the val set)
    while staying identical across epochs."""
    weights = loss_weights or LossWeights()
    modality_names = tuple(sorted(config.modalities))
    modality_probs = {
        name: m.mask_prob for name, m in config.modalities.items()
    }

    def eval_step(state: TrainState, batch: Dict[str, Any], batch_index=0):
        if apply_masking and "spatial_mask" not in batch:
            masks = sample_masks(
                # deterministic across epochs, distinct per batch
                jax.random.fold_in(jax.random.PRNGKey(0), batch_index),
                batch["xyzt"].shape[0],
                modality_names,
                config.masking,
                modality_probs,
            )
            batch = {**batch, **masks}
        out = model.apply({"params": state.params}, batch, deterministic=True)
        _, metrics = deepearth_loss(out, batch, config, weights)
        return metrics

    return eval_step


class Trainer:
    """Host-side training loop with orbax checkpoint rotation.

    Checkpoint semantics mirror the reference
    (hpc/train_distrbuted.py:613-641): rolling 'latest' saves with
    max_to_keep=3 plus best-by-validation tracking.
    """

    def __init__(
        self,
        model,
        config: DeepEarthConfig,
        loss_weights: Optional[LossWeights] = None,
        checkpoint_dir: Optional[str] = None,
        seed: int = 0,
        microbatch_steps: int = 1,
    ):
        self.model = model
        self.config = config
        self.loss_weights = loss_weights or LossWeights()
        self.rng = jax.random.PRNGKey(seed)
        self.train_step = jax.jit(
            make_train_step(
                model, config, self.loss_weights,
                microbatch_steps=microbatch_steps,
            )
        )
        self.eval_step = jax.jit(make_eval_step(model, config, self.loss_weights))
        self.best_val = float("inf")
        self._ckpt_mgr = None
        if checkpoint_dir:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(checkpoint_dir),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=3, create=True
                ),
            )
            # persist the config next to the checkpoints for reproducibility
            try:
                from ..configs import config_to_json

                config_to_json(
                    config, os.path.join(checkpoint_dir, "config.json")
                )
            except Exception as e:
                logger.warning(f"could not persist config: {e}")

    # -- state ----------------------------------------------------------------- #

    def init_state(self, sample_batch: Dict[str, Any]) -> TrainState:
        self.rng, init_rng = jax.random.split(self.rng)
        params = self.model.init(init_rng, sample_batch)["params"]
        tx = create_optimizer(self.config.optimizer)
        return TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx
        )

    def save(self, state: TrainState, step: int, metrics=None) -> None:
        if self._ckpt_mgr is None:
            return
        # best-val and periodic saves can coincide on the same step; orbax
        # raises StepAlreadyExistsError on duplicates
        if self._ckpt_mgr.latest_step() == step:
            return
        import orbax.checkpoint as ocp

        self._ckpt_mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(
                    {"params": state.params, "opt_state": state.opt_state,
                     "step": state.step}
                )
            ),
            metrics=metrics,
        )
        self._ckpt_mgr.wait_until_finished()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        """Resume from latest (or given) checkpoint, reference
        --resume_from_checkpoint semantics (hpc/train_distrbuted.py:556-571)."""
        if self._ckpt_mgr is None:
            raise ValueError("no checkpoint_dir configured")
        import orbax.checkpoint as ocp

        step = step if step is not None else self._ckpt_mgr.latest_step()
        target = {"params": state.params, "opt_state": state.opt_state,
                  "step": state.step}
        restored = self._ckpt_mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore(target))
        )["state"]
        return state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    # -- loops ------------------------------------------------------------------ #

    def fit(
        self,
        state: TrainState,
        train_batches: Iterable[Dict[str, Any]],
        num_steps: int,
        eval_batches: Optional[Callable[[], Iterable[Dict[str, Any]]]] = None,
        eval_every: int = 0,
        log_every: int = 50,
        save_every: int = 0,
        metric_sink=None,
        echo_factor: int = 1,
    ) -> Tuple[TrainState, Dict[str, float]]:
        """``metric_sink``: optional object with ``log(metrics, step=)`` —
        e.g. :class:`deepearth_tpu.utils.WandbSink` (wandb-format logging,
        reference: train_deepearth.py:21,231).

        ``echo_factor``: run each batch through this many optimizer steps
        (data echoing — each step draws a fresh masking rng). Use when the
        host→device link, not the chip, bounds throughput; pair with
        device-side batches (``device_prefetch``) so repeats are free
        (see ``data.batches.echo_on_device``).
        """
        acc = MetricAccumulator()
        it = iter(train_batches)
        if echo_factor > 1:
            from ..data.batches import echo_on_device

            it = echo_on_device(it, echo_factor)
        t0 = time.time()
        last_metrics: Dict[str, float] = {}
        for step in range(1, num_steps + 1):
            batch = next(it)
            self.rng, step_rng = jax.random.split(self.rng)
            state, metrics = self.train_step(state, batch, step_rng)
            acc.update(metrics)
            if log_every and step % log_every == 0:
                last_metrics = acc.result()
                rate = log_every * batch["xyzt"].shape[0] / (time.time() - t0)
                logger.info(
                    format_epoch_line(step, last_metrics, {"obs/s": rate})
                )
                if metric_sink is not None:
                    metric_sink.log(
                        {**last_metrics, "obs_per_s": rate}, step=step
                    )
                acc.reset()
                t0 = time.time()
            if eval_every and eval_batches is not None and step % eval_every == 0:
                val = self.evaluate(state, eval_batches())
                val_loss = val.get("loss/total", float("inf"))
                if val_loss < self.best_val:
                    self.best_val = val_loss
                    self.save(state, step, metrics={"val_loss": val_loss})
            if save_every and step % save_every == 0:
                self.save(state, step)
        return state, (last_metrics or acc.result())

    def evaluate(
        self, state: TrainState, batches: Iterable[Dict[str, Any]]
    ) -> Dict[str, float]:
        acc = MetricAccumulator()
        for i, batch in enumerate(batches):
            acc.update(self.eval_step(state, batch, i))
        return acc.result()


def partial_load_params(init_params, loaded_params):
    """Shape-matching partial parameter load for model extension
    (reference: training/bidirectional_reconstruction.py:161-191): leaves
    whose path exists in both trees AND shapes match are taken from the
    checkpoint; everything else keeps its fresh initialization.

    Returns (merged_params, n_loaded, n_skipped).
    """
    from flax import traverse_util

    flat_init = traverse_util.flatten_dict(init_params)
    flat_loaded = traverse_util.flatten_dict(loaded_params)
    merged = {}
    n_loaded = n_skipped = 0
    for k, v in flat_init.items():
        lv = flat_loaded.get(k)
        if lv is not None and tuple(getattr(lv, "shape", ())) == tuple(
            getattr(v, "shape", ())
        ):
            merged[k] = lv
            n_loaded += 1
        else:
            merged[k] = v
            if lv is not None:
                n_skipped += 1
    return traverse_util.unflatten_dict(merged), n_loaded, n_skipped
