"""Canonical minimal forward pass (reference: examples/quick_test.py:22).

Exercises every core component at tiny scale: Grid4D hash encoding, a
modality encoder, the fusion transformer, and the reconstruction decoders —
then a few training steps on synthetic data to confirm the loss moves.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from deepearth_tpu.configs import ModalityConfig, tiny_config
    from deepearth_tpu.data import SyntheticConfig, SyntheticEarthDataGenerator
    from deepearth_tpu.models import DeepEarthModel
    from deepearth_tpu.training import LossWeights, Trainer

    print(f"devices: {jax.devices()}")

    cfg = tiny_config()
    cfg.add_modality(
        ModalityConfig(name="weather", input_dim=5, n_tokens=1,
                       encoder_layers=1, encoder_heads=2)
    )
    model = DeepEarthModel(cfg)

    gen = SyntheticEarthDataGenerator(SyntheticConfig())
    batch = next(gen.batch_iterator(8, modalities=("species", "weather"), steps=1))

    print("\n=== component shapes ===")
    params = model.init(jax.random.PRNGKey(0), batch)
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)
    )
    print(f"parameters: {n_params / 1e6:.2f}M")

    out = model.apply(params, batch)
    print(f"fused representation: {out['fused_representation'].shape}")
    for k, v in out["reconstructions"].items():
        print(f"reconstruction[{k}]: {v.shape}")

    sp = np.asarray(out["reconstructions"]["spatial"])
    assert 0.0 <= sp.min() and sp.max() <= 1.0, "spatial decode out of [0,1]"

    print("\n=== short training run ===")
    cfg.optimizer.learning_rate = 3e-3
    cfg.optimizer.warmup_steps = 5
    cfg.optimizer.total_steps = 60
    trainer = Trainer(model, cfg, LossWeights(contrastive=0.01))
    state = trainer.init_state(batch)
    t0 = time.time()
    state, metrics = trainer.fit(
        state,
        gen.batch_iterator(16, modalities=("species", "weather")),
        num_steps=60,
        log_every=20,
    )
    print(f"final loss: {metrics['loss/total']:.4f}  ({time.time()-t0:.1f}s)")
    print("\nquick test passed ✓")


if __name__ == "__main__":
    main()
