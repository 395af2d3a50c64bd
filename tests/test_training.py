"""Training-layer tests: masking, losses, a real train run whose loss must
decrease, and checkpoint save/restore round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepearth_tpu.configs import MaskingConfig, ModalityConfig, tiny_config
from deepearth_tpu.data import SyntheticConfig, SyntheticEarthDataGenerator
from deepearth_tpu.models import DeepEarthModel
from deepearth_tpu.training import (
    LossWeights,
    MetricAccumulator,
    Trainer,
    clip_contrastive_loss,
    deepearth_loss,
    format_epoch_line,
    sample_masks,
    species_contrastive_loss,
)


class TestMasking:
    def test_sample_masks_shapes_and_rates(self):
        cfg = MaskingConfig(spatial_mask_prob=0.5, modality_mask_prob=0.25)
        masks = sample_masks(
            jax.random.PRNGKey(0), 4000, ("species", "vision"), cfg
        )
        assert masks["spatial_mask"].shape == (4000,)
        rate = 1.0 - np.asarray(masks["spatial_mask"]).mean()
        assert 0.45 < rate < 0.55
        rate_m = 1.0 - np.asarray(masks["modality_masks"]["species"]).mean()
        assert 0.2 < rate_m < 0.3

    def test_per_modality_probs(self):
        cfg = MaskingConfig()
        masks = sample_masks(
            jax.random.PRNGKey(1), 4000, ("a", "b"), cfg, {"a": 0.9, "b": 0.0}
        )
        assert (1 - np.asarray(masks["modality_masks"]["a"]).mean()) > 0.85
        assert np.asarray(masks["modality_masks"]["b"]).all()


class TestLosses:
    def test_contrastive_identical_embeddings(self):
        a = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
        # identical pairs → low loss; random pairs → higher
        l_same = float(clip_contrastive_loss(a, a, 0.07))
        b = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
        l_rand = float(clip_contrastive_loss(a, b, 0.07))
        assert l_same < l_rand

    def test_species_contrastive(self):
        emb = jax.random.normal(jax.random.PRNGKey(0), (12, 8))
        labels = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5])
        l = float(species_contrastive_loss(emb, labels, 0.07))
        assert np.isfinite(l) and l > 0
        # clustering same-species embeddings tightly lowers the loss
        proto = jax.random.normal(jax.random.PRNGKey(1), (6, 8))
        emb2 = proto[labels] + 0.01 * emb
        l2 = float(species_contrastive_loss(emb2, labels, 0.07))
        assert l2 < l

    def test_loss_only_on_masked_rows(self):
        """Rows the model could see must not contribute to the loss."""
        cfg = tiny_config()
        model = DeepEarthModel(cfg)
        b = 4
        batch = {
            "xyzt": jax.random.uniform(jax.random.PRNGKey(0), (b, 4)),
            "modalities": {"species": jnp.array([1, 2, 3, 4])},
            "modality_masks": {"species": jnp.array([True] * b)},  # all visible
            "spatial_mask": jnp.array([True] * b),
            "temporal_mask": jnp.array([True] * b),
        }
        params = model.init(jax.random.PRNGKey(1), batch)
        out = model.apply(params, batch)
        w = LossWeights(contrastive=0.0)
        total, metrics = deepearth_loss(out, batch, cfg, w)
        # nothing hidden → all masked-row means are zero
        assert float(metrics["loss/spatial"]) == 0.0
        assert float(metrics["loss/species"]) == 0.0


def make_iter(gen, cfg, batch_size, steps=None):
    return gen.batch_iterator(batch_size, modalities=("species",), steps=steps)


class TestTrainer:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_config()
        cfg.optimizer.learning_rate = 3e-3
        cfg.optimizer.warmup_steps = 5
        cfg.optimizer.total_steps = 100
        model = DeepEarthModel(cfg)
        gen = SyntheticEarthDataGenerator(SyntheticConfig())
        trainer = Trainer(model, cfg, LossWeights(contrastive=0.01))
        state = trainer.init_state(next(make_iter(gen, cfg, 8, 1)))
        return cfg, model, gen, trainer, state

    def test_loss_decreases(self, setup):
        cfg, model, gen, trainer, state = setup
        it = make_iter(gen, cfg, 16)
        first_batch = next(it)
        self_rng = jax.random.PRNGKey(99)
        _, m0 = trainer.train_step(state, first_batch, self_rng)
        state2, last = trainer.fit(state, it, num_steps=40, log_every=20)
        _, m1 = trainer.train_step(state2, first_batch, self_rng)
        assert float(m1["loss/total"]) < float(m0["loss/total"]), (
            f"loss did not decrease: {float(m0['loss/total'])} → "
            f"{float(m1['loss/total'])}"
        )

    def test_checkpoint_roundtrip(self, setup, tmp_path):
        cfg, model, gen, _, _ = setup
        trainer = Trainer(model, cfg, checkpoint_dir=str(tmp_path / "ckpt"))
        state = trainer.init_state(next(make_iter(gen, cfg, 4, 1)))
        it = make_iter(gen, cfg, 4)
        state, _ = trainer.fit(state, it, num_steps=3, log_every=0)
        trainer.save(state, 3)

        fresh = trainer.init_state(next(make_iter(gen, cfg, 4, 1)))
        restored = trainer.restore(fresh)
        # parameters match the trained state, not the fresh one
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))
        assert int(restored.step) == 3

    def test_evaluate(self, setup):
        cfg, model, gen, trainer, state = setup
        metrics = trainer.evaluate(state, make_iter(gen, cfg, 8, steps=2))
        assert "loss/total" in metrics

    def test_grad_accumulation(self):
        """grad_accum_steps=k holds params fixed for k-1 micro-steps, then
        applies the averaged update (optax.MultiSteps semantics — the
        reference's Lambda-trainer accumulation, SURVEY §2.5)."""
        import copy

        cfg = tiny_config()
        cfg.optimizer.grad_accum_steps = 2
        cfg.optimizer.warmup_steps = 0
        cfg.optimizer.schedule = "constant"
        model = DeepEarthModel(cfg)
        gen = SyntheticEarthDataGenerator(SyntheticConfig())
        trainer = Trainer(model, cfg, LossWeights(contrastive=0.0))
        state = trainer.init_state(next(make_iter(gen, cfg, 4, 1)))
        p0 = jax.tree_util.tree_leaves(state.params)

        batch = next(make_iter(gen, cfg, 4, 1))
        rng = jax.random.PRNGKey(0)
        state1, _ = trainer.train_step(state, batch, rng)
        p1 = jax.tree_util.tree_leaves(state1.params)
        # first micro-step: gradients accumulated, params unchanged
        for a, b in zip(p0, p1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        state2, _ = trainer.train_step(state1, batch, rng)
        p2 = jax.tree_util.tree_leaves(state2.params)
        # second micro-step applies the averaged update
        changed = sum(
            float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
            for a, b in zip(p1, p2)
        )
        assert changed > len(p2) // 2, "accumulated update never applied"


class TestMicrobatchedStep:
    def test_matches_full_batch_gradient(self):
        """microbatch_steps=k inside one compiled step must produce the same
        update as the full-batch step when the per-row losses are uniform
        across microbatches: masks are supplied (all rows hidden, so every
        microbatch averages over all its rows), contrastive off (a batch-
        global term is by construction per-microbatch under accumulation),
        dropout 0. Mean of equal-sized microbatch means == full-batch mean,
        so grads — and the params after one fused-AdamW update — match."""
        from deepearth_tpu.training import create_optimizer, make_train_step
        from deepearth_tpu.training.trainer import TrainState

        # fp32 compute: bf16 forward noise (~0.4% rel) would swamp the
        # exact mean-of-means identity this test pins
        cfg = tiny_config(compute_dtype=jnp.float32)
        cfg.optimizer.warmup_steps = 0
        cfg.optimizer.schedule = "constant"
        model = DeepEarthModel(cfg)
        gen = SyntheticEarthDataGenerator(SyntheticConfig())
        batch = next(make_iter(gen, cfg, 8, 1))
        B = batch["xyzt"].shape[0]
        names = tuple(sorted(cfg.modalities))
        batch = {
            **batch,
            "spatial_mask": jnp.zeros((B,), bool),
            "temporal_mask": jnp.zeros((B,), bool),
            "modality_masks": {
                n: jnp.zeros((B,), bool)
                for n in names if n in batch.get("modalities", {})
            },
        }

        import optax

        def init_state():
            # plain SGD: params_after = params - lr*grads, so the params
            # comparison below IS a gradient comparison (Adam's first-step
            # sign-like update would amplify fp32 summation-order noise and
            # is scale-invariant, hiding 1/k bugs)
            params = model.init(jax.random.PRNGKey(0), batch)["params"]
            return TrainState.create(
                apply_fn=model.apply, params=params, tx=optax.sgd(1.0),
            )

        lw = LossWeights(contrastive=0.0)
        rng = jax.random.PRNGKey(7)
        step_full = jax.jit(
            make_train_step(model, cfg, lw, apply_masking=False)
        )
        step_mb = jax.jit(
            make_train_step(
                model, cfg, lw, apply_masking=False, microbatch_steps=4
            )
        )
        s_full, m_full = step_full(init_state(), batch, rng)
        s_mb, m_mb = step_mb(init_state(), batch, rng)

        np.testing.assert_allclose(
            float(m_mb["loss/total"]), float(m_full["loss/total"]),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            float(m_mb["grad_norm"]), float(m_full["grad_norm"]), rtol=1e-4
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(s_full.params),
            jax.tree_util.tree_leaves(s_mb.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_rejects_indivisible_batch(self):
        from deepearth_tpu.training import make_train_step
        from deepearth_tpu.training.trainer import TrainState
        from deepearth_tpu.training import create_optimizer

        cfg = tiny_config()
        model = DeepEarthModel(cfg)
        gen = SyntheticEarthDataGenerator(SyntheticConfig())
        batch = next(make_iter(gen, cfg, 6, 1))
        step = make_train_step(model, cfg, microbatch_steps=4)
        params = model.init(jax.random.PRNGKey(0), batch)["params"]
        state = TrainState.create(
            apply_fn=model.apply, params=params,
            tx=create_optimizer(cfg.optimizer),
        )
        with pytest.raises(ValueError, match="divisible"):
            step(state, batch, jax.random.PRNGKey(0))


class TestMetrics:
    def test_accumulator_and_format(self):
        acc = MetricAccumulator()
        acc.update({"loss/total": jnp.asarray(1.0), "loss/spatial": jnp.asarray(0.5)})
        acc.update({"loss/total": jnp.asarray(3.0), "loss/spatial": jnp.asarray(1.5)})
        res = acc.result()
        assert res["loss/total"] == 2.0
        line = format_epoch_line(42, res, {"obs/s": 123.4})
        assert line.startswith("E042")
        assert "L:2.0000" in line and "obs/s:123.4" in line


class TestSpeciesContrastiveInMainLoss:
    def test_weight_enables_term(self):
        cfg = tiny_config()
        model = DeepEarthModel(cfg)
        batch = {
            "xyzt": jax.random.uniform(jax.random.PRNGKey(0), (8, 4)),
            "modalities": {"species": jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3])},
        }
        params = model.init(jax.random.PRNGKey(1), batch)
        out = model.apply(params, batch)
        _, m0 = deepearth_loss(out, batch, cfg, LossWeights(contrastive=0.0))
        assert "loss/species_contrastive" not in m0
        total, m1 = deepearth_loss(
            out, batch, cfg,
            LossWeights(contrastive=0.0, species_contrastive=0.5),
        )
        assert "loss/species_contrastive" in m1
        assert np.isfinite(float(total))


class TestEvalMasking:
    def test_eval_step_masks_deterministically(self):
        from deepearth_tpu.training import make_eval_step
        from deepearth_tpu.training.trainer import TrainState, create_optimizer

        cfg = tiny_config()
        model = DeepEarthModel(cfg)
        gen = SyntheticEarthDataGenerator(SyntheticConfig())
        batch = next(gen.batch_iterator(64, modalities=("species",), steps=1))
        params = model.init(jax.random.PRNGKey(0), batch)["params"]
        state = TrainState.create(
            apply_fn=model.apply, params=params,
            tx=create_optimizer(cfg.optimizer),
        )
        step = jax.jit(make_eval_step(model, cfg))
        m1 = step(state, batch)
        m2 = step(state, batch)
        # masked val loss is nonzero and reproducible
        assert float(m1["loss/species"]) > 0
        assert float(m1["loss/total"]) == float(m2["loss/total"])
        # different batch indices hide different rows (no positional
        # correlation across the val set) but each index is stable
        m_b1 = step(state, batch, 1)
        m_b1_again = step(state, batch, 1)
        assert float(m_b1["loss/total"]) == float(m_b1_again["loss/total"])
        assert float(m_b1["loss/total"]) != float(m1["loss/total"])


class TestFusedAdamW:
    """training/optimizers.py — the single-sweep optimizer (VERDICT r3 #1b)."""

    def _tree(self, seed=0):
        rng = np.random.default_rng(seed)
        params = {
            "dense": {"kernel": jnp.asarray(rng.standard_normal((256, 192)),
                                            jnp.float32),
                      "bias": jnp.asarray(rng.standard_normal(192), jnp.float32)},
            "emb": jnp.asarray(rng.standard_normal((192, 256)), jnp.float32),
        }
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                np.random.default_rng(seed + 1).standard_normal(p.shape) * 3.0,
                jnp.float32,
            ),
            params,
        )
        return params, grads

    def test_matches_optax_chain_exactly(self):
        """fp32 fused path == optax.chain(clip_by_global_norm, adamw) to
        float tolerance, including the clipping branch (grads scaled to
        exceed the norm) and bias correction over several steps."""
        import optax

        from deepearth_tpu.training.optimizers import fused_adamw

        params, grads = self._tree()
        lr, wd, clip = 3e-3, 0.02, 1.0
        ref_tx = optax.chain(
            optax.clip_by_global_norm(clip),
            optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=wd),
        )
        new_tx = fused_adamw(lr, b1=0.9, b2=0.999, weight_decay=wd,
                             clip_norm=clip)
        p_ref, p_new = params, params
        s_ref = ref_tx.init(p_ref)
        s_new = new_tx.init(p_new)
        for step in range(5):
            g = jax.tree_util.tree_map(lambda x: x * (0.2 + step), grads)
            u_ref, s_ref = ref_tx.update(g, s_ref, p_ref)
            p_ref = optax.apply_updates(p_ref, u_ref)
            u_new, s_new = new_tx.update(g, s_new, p_new)
            p_new = optax.apply_updates(p_new, u_new)
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_new)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=2e-7)

    def test_matches_optax_under_schedule(self):
        """Schedules must be evaluated at the PRE-increment count like
        optax.scale_by_schedule: the first update of a 0-init warmup uses
        lr=schedule(0)=0 (regression test for a one-step schedule shift)."""
        import optax

        from deepearth_tpu.training.optimizers import fused_adamw

        params, grads = self._tree()
        sched = optax.linear_schedule(0.0, 1e-2, 10)
        ref_tx = optax.adamw(sched, b1=0.9, b2=0.999, weight_decay=0.01)
        new_tx = fused_adamw(sched, b1=0.9, b2=0.999, weight_decay=0.01)
        p_ref, p_new = params, params
        s_ref, s_new = ref_tx.init(p_ref), new_tx.init(p_new)
        for _ in range(4):
            u_ref, s_ref = ref_tx.update(grads, s_ref, p_ref)
            p_ref = optax.apply_updates(p_ref, u_ref)
            u_new, s_new = new_tx.update(grads, s_new, p_new)
            p_new = optax.apply_updates(p_new, u_new)
        # first step has lr=0 -> params unchanged in BOTH
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_new)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=2e-7)

    def test_factored_memory_and_convergence(self):
        """Factored second moment: row/col fp32 factors for big matrices,
        exact nu for small leaves; loss decreases on a quadratic."""
        import optax

        from deepearth_tpu.training.optimizers import (
            _FactoredNu,
            fused_adamw,
            optimizer_state_bytes,
        )

        params, _ = self._tree()
        tx = fused_adamw(5e-2, clip_norm=1.0, second_moment="factored")
        state = tx.init(params)
        # big matrices factored; 1-D bias exact
        assert isinstance(state.nu["dense"]["kernel"], _FactoredNu)
        assert isinstance(state.nu["emb"], _FactoredNu)
        assert not isinstance(state.nu["dense"]["bias"], _FactoredNu)
        assert state.nu["dense"]["kernel"].row.shape == (256,)
        assert state.nu["dense"]["kernel"].col.shape == (192,)

        # footprint accounting: factored ≪ exact
        exact_b = optimizer_state_bytes(params, "float32")
        fact_b = optimizer_state_bytes(params, "factored")
        n = sum(p.size for p in jax.tree_util.tree_leaves(params))
        assert exact_b == 8 * n
        assert fact_b < 4.1 * n  # mu fp32 + tiny factors

        target = jax.tree_util.tree_map(jnp.ones_like, params)

        @jax.jit
        def step(p, s):
            def loss(p):
                return sum(
                    ((a - b) ** 2).mean()
                    for a, b in zip(jax.tree_util.tree_leaves(p),
                                    jax.tree_util.tree_leaves(target))
                )

            l, g = jax.value_and_grad(loss)(p)
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        losses = []
        p = params
        for _ in range(120):
            p, state, l = step(p, state)
            losses.append(float(l))
        assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])

    def test_create_optimizer_wires_fused(self):
        from deepearth_tpu.configs import OptimizerConfig
        from deepearth_tpu.training import create_optimizer
        from deepearth_tpu.training.optimizers import FusedAdamWState

        cfg = OptimizerConfig(schedule="constant", second_moment="factored")
        tx = create_optimizer(cfg)
        params = {"w": jnp.ones((130, 130))}
        st = tx.init(params)
        assert isinstance(st, FusedAdamWState)
        g = {"w": jnp.full((130, 130), 0.1)}
        u, st2 = tx.update(g, st, params)
        assert np.isfinite(np.asarray(u["w"])).all()
        # legacy path still available
        cfg2 = OptimizerConfig(schedule="constant", fused=False)
        tx2 = create_optimizer(cfg2)
        assert not isinstance(tx2.init(params), FusedAdamWState)


class TestWandbSink:
    """utils/wandb_sink.py — wandb-format metric emission with JSONL
    fallback (reference: train_deepearth.py:21,231)."""

    def test_jsonl_fallback_history_schema(self, tmp_path):
        import json

        from deepearth_tpu.utils import WandbSink

        d = str(tmp_path / "run")
        with WandbSink(project="deepearth", name="t", config={"lr": 1e-3},
                       dir=d, mode="offline") as sink:
            sink.log({"loss/total": 1.5, "obs_per_s": 10.0}, step=1)
            sink.log({"loss/total": jnp.asarray(0.7)}, step=2)
        meta = json.load(open(tmp_path / "run" / "wandb-metadata.json"))
        assert meta["project"] == "deepearth" and meta["config"]["lr"] == 1e-3
        rows = [json.loads(l) for l in open(tmp_path / "run" / "wandb-history.jsonl")]
        assert rows[0]["_step"] == 1 and rows[0]["loss/total"] == 1.5
        assert rows[1]["loss/total"] == pytest.approx(0.7)
        assert "_runtime" in rows[0]

    def test_trainer_fit_feeds_sink(self, tmp_path):
        from deepearth_tpu.utils import WandbSink

        cfg = tiny_config()
        model = DeepEarthModel(cfg)
        gen = SyntheticEarthDataGenerator(SyntheticConfig())
        trainer = Trainer(model, cfg, LossWeights(contrastive=0.0))
        state = trainer.init_state(next(make_iter(gen, cfg, 4, 1)))
        sink = WandbSink(name="fit", dir=str(tmp_path / "r"), mode="offline")
        trainer.fit(state, make_iter(gen, cfg, 4), num_steps=4,
                    log_every=2, metric_sink=sink)
        sink.finish()
        rows = open(tmp_path / "r" / "wandb-history.jsonl").read().splitlines()
        assert len(rows) == 2  # steps 2 and 4
