"""Gaussian-splat rasterizer benchmark: dense vs tiled on the real chip.

The reference trains 3DGS through gsplat's CUDA tile rasterizer
(reference: reconstruction/gaussian_splat.py:44-60). This framework has two
TPU rasterizers: the dense O(pixels·G) compositor and the static-shape tile
rasterizer (render_tiled). This tool measures both across scene sizes at a
render resolution, recording where the tile path takes over and the
training-step (fwd+bwd) rate, in BENCH_SPLAT.json.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_splat.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_SPLAT.json",
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(OUT), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from deepearth_tpu.reconstruction import init_scene, render, render_tiled
    from deepearth_tpu.reconstruction.gaussian_splat import Camera

    log(f"devices: {jax.devices()}")
    H = W = 256
    cam = Camera(
        rotation=jnp.eye(3), translation=jnp.asarray([0.0, 0.0, 2.5]),
        fx=220.0, fy=220.0, cx=W / 2, cy=H / 2, width=W, height=H,
    )

    def timed(f, scene, reps=6):
        # distinct inputs per rep (nudged means): identical-args calls can
        # be served from the execution relay's cache (CLAUDE.md)
        variants = [
            scene._replace(means=scene.means + 1e-4 * (i + 1))
            for i in range(reps)
        ]
        float(np.asarray(f(scene).sum()))  # compile + warm
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(variants[i]).sum()))
            ts.append(time.perf_counter() - t0)
        return float(np.median(sorted(ts)[: max(reps // 2, 1)]))

    results = {"resolution": [H, W], "scenes": {}}
    for g in (2_000, 16_000, 65_536, 262_144):
        scene = init_scene(jax.random.PRNGKey(0), g, extent=1.0)
        row = {}
        if g <= 16_000:  # dense materializes (H*W, G): 65536*G floats
            dense = jax.jit(lambda s: render(s, cam))
            row["dense_ms"] = round(timed(dense, scene) * 1e3, 2)
        k = min(512, g)
        tiled = jax.jit(
            lambda s: render_tiled(s, cam, tile_size=16, max_per_tile=k)
        )
        row["tiled_ms"] = round(timed(tiled, scene) * 1e3, 2)

        # training step: grad wrt the scene through the tiled renderer
        target = jnp.zeros((H, W, 3))

        @jax.jit
        def step(s):
            return jax.grad(
                lambda s: jnp.mean(
                    (render_tiled(s, cam, tile_size=16, max_per_tile=k)
                     - target) ** 2
                )
            )(s).means
        float(np.asarray(step(scene).sum()))
        t0 = time.perf_counter()
        reps = 4
        for i in range(reps):
            float(np.asarray(step(
                scene._replace(means=scene.means + 1e-4 * (i + 1))
            ).sum()))
        row["tiled_fwdbwd_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 2)
        results["scenes"][str(g)] = row
        log(f"G={g}: {row}")

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {OUT}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
