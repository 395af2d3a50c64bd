"""Grid4D + MLP density-field regression (BASELINE.json config #2:
"Grid4D spacetime encoder + MLP decoder only: species-occurrence density
regression over (x,y,z,t) grid").

Trains the hash-grid encoder to regress a synthetic species-occurrence
density over space-time, then evaluates on a dense grid — the NeRF-style
field-query workload.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def true_density(xyzt):
    """Synthetic ground-truth density: localized blooms drifting over time."""
    x, y, t = xyzt[:, 0], xyzt[:, 1], xyzt[:, 3]
    cx = 0.3 + 0.3 * t
    cy = 0.6 - 0.2 * t
    d1 = jnp.exp(-((x - cx) ** 2 + (y - cy) ** 2) / 0.02)
    d2 = jnp.exp(-((x - 0.75) ** 2 + (y - 0.25) ** 2) / 0.01) * (1 - t)
    return (d1 + d2)[:, None]


def main():
    from flax import linen as nn

    from deepearth_tpu.configs import Grid4DConfig
    from deepearth_tpu.models import Grid4DEncoder

    class DensityField(nn.Module):
        @nn.compact
        def __call__(self, xyzt):
            h = Grid4DEncoder(
                Grid4DConfig(
                    n_spatial_levels=12, n_temporal_levels=6,
                    hash_table_size=2 ** 16,
                ),
                hidden_dim=64,
                name="grid4d",
            )(xyzt)
            h = nn.gelu(nn.Dense(64)(h))
            return nn.softplus(nn.Dense(1)(h))

    model = DensityField()
    rng = jax.random.PRNGKey(0)
    xyzt0 = jax.random.uniform(rng, (1024, 4))
    params = model.init(jax.random.PRNGKey(1), xyzt0)
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        xyzt = jax.random.uniform(key, (4096, 4))
        target = true_density(xyzt)

        def loss_fn(p):
            return jnp.mean((model.apply(p, xyzt) - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for i in range(300):
        params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(i))
        if i % 100 == 0:
            print(f"step {i:4d}  loss {float(loss):.5f}")
    print(f"trained in {time.time() - t0:.1f}s, final loss {float(loss):.5f}")

    # dense grid evaluation at t=0.5
    g = jnp.linspace(0, 1, 64)
    gx, gy = jnp.meshgrid(g, g)
    grid = jnp.stack(
        [gx.ravel(), gy.ravel(), jnp.full(64 * 64, 0.1),
         jnp.full(64 * 64, 0.5)], axis=-1,
    )
    pred = model.apply(params, grid)
    truth = true_density(grid)
    rmse = float(jnp.sqrt(jnp.mean((pred - truth) ** 2)))
    corr = float(jnp.corrcoef(pred.ravel(), truth.ravel())[0, 1])
    print(f"dense-grid eval: rmse={rmse:.4f}  corr={corr:.3f}")
    assert corr > 0.9, "field regression failed to fit"
    print("density field example passed ✓")


if __name__ == "__main__":
    main()
