"""Differentiable 3D Gaussian splatting in pure JAX.

TPU-native replacement for the reference's CUDA gsplat trainer
(reference: reconstruction/gaussian_splat.py:44-60 — gsplat rasterizer,
30k iters, densify/prune). The CUDA tile rasterizer doesn't exist on TPU;
instead the renderer evaluates every Gaussian densely against every pixel
with depth-sorted alpha compositing — O(P·G) einsum/VPU work that XLA maps
cleanly onto the chip. Practical for scenes up to ~10-50k Gaussians per
render tile; everything is differentiable, so scenes are trained with optax
end-to-end.

Conventions: row-vector camera, OpenCV pinhole intrinsics, quaternions wxyz.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class GaussianScene(NamedTuple):
    """Trainable scene parameters (a pytree)."""

    means: jnp.ndarray  # (G, 3) world positions
    log_scales: jnp.ndarray  # (G, 3)
    quats: jnp.ndarray  # (G, 4) wxyz, normalized at use
    colors: jnp.ndarray  # (G, 3) pre-sigmoid rgb
    opacity_logits: jnp.ndarray  # (G,)


class Camera(NamedTuple):
    rotation: jnp.ndarray  # (3, 3) world→camera
    translation: jnp.ndarray  # (3,) world→camera: x_cam = R @ x + t
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int


def init_scene(key: jax.Array, n_gaussians: int, extent: float = 1.0) -> GaussianScene:
    k1, k2, k3 = jax.random.split(key, 3)
    return GaussianScene(
        means=jax.random.uniform(
            k1, (n_gaussians, 3), minval=-extent, maxval=extent
        ),
        log_scales=jnp.full((n_gaussians, 3), jnp.log(0.1 * extent)),
        quats=jnp.tile(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (n_gaussians, 1)),
        colors=jax.random.normal(k2, (n_gaussians, 3)) * 0.1,
        opacity_logits=jnp.full((n_gaussians,), -1.0),
    )


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz → (..., 3, 3)."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                       2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                       2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                       1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def covariance_3d(scene: GaussianScene) -> jnp.ndarray:
    """(G, 3, 3) Σ = R S S Rᵀ."""
    R = quat_to_rotmat(scene.quats)
    S = jnp.exp(scene.log_scales)
    RS = R * S[:, None, :]
    return RS @ jnp.swapaxes(RS, -1, -2)


def project_gaussians(
    scene: GaussianScene, cam: Camera, eps: float = 1e-6
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project to image space.

    Returns:
        xy: (G, 2) pixel means
        cov2d: (G, 2, 2) image-space covariances (+0.3px blur, gsplat default)
        depth: (G,) camera-space z
    """
    p_cam = scene.means @ cam.rotation.T + cam.translation
    z = jnp.maximum(p_cam[:, 2], eps)
    x, y = p_cam[:, 0], p_cam[:, 1]
    xy = jnp.stack([cam.fx * x / z + cam.cx, cam.fy * y / z + cam.cy], -1)

    # Jacobian of the perspective projection (G, 2, 3)
    zero = jnp.zeros_like(z)
    J = jnp.stack(
        [
            jnp.stack([cam.fx / z, zero, -cam.fx * x / (z * z)], -1),
            jnp.stack([zero, cam.fy / z, -cam.fy * y / (z * z)], -1),
        ],
        axis=-2,
    )
    W = cam.rotation  # (3, 3)
    cov3d = covariance_3d(scene)
    cov_cam = W @ cov3d @ W.T  # (G, 3, 3) via broadcasting
    cov2d = J @ cov_cam @ jnp.swapaxes(J, -1, -2)
    cov2d = cov2d + 0.3 * jnp.eye(2)
    return xy, cov2d, p_cam[:, 2]


def render(
    scene: GaussianScene,
    cam: Camera,
    background: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Render (H, W, 3) with depth-sorted alpha compositing.

    Dense evaluation: every Gaussian contributes to every pixel — the TPU
    trades the CUDA tile rasterizer's sparsity for big regular einsums.
    Right choice up to ~10-50k Gaussians; beyond that use
    :func:`render_tiled`, which recovers tile sparsity with static shapes.
    """
    xy, cov2d, depth = project_gaussians(scene, cam)
    g = scene.means.shape[0]

    # depth sort (far Gaussians composite last → order front-to-back)
    order = jnp.argsort(depth)
    xy, depth = xy[order], depth[order]
    cov2d = cov2d[order]
    colors = jax.nn.sigmoid(scene.colors[order])
    opac = jax.nn.sigmoid(scene.opacity_logits[order])
    behind = depth <= 1e-4  # cull Gaussians behind the camera

    inv, _ = _inverse_cov2d(cov2d)

    ys = jnp.arange(cam.height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(cam.width, dtype=jnp.float32) + 0.5
    px = jnp.stack(jnp.meshgrid(xs, ys), -1).reshape(-1, 2)  # (P, 2)

    d = px[:, None, :] - xy[None, :, :]  # (P, G, 2)
    # Mahalanobis distance via einsum — the hot op
    maha = jnp.einsum("pgi,gij,pgj->pg", d, inv, d)
    alpha = opac[None, :] * jnp.exp(-0.5 * maha)  # (P, G)
    alpha = jnp.where(behind[None, :], 0.0, jnp.clip(alpha, 0.0, 0.995))

    # front-to-back "over" compositing: T_g = prod_{g'<g} (1 - a_g')
    transmittance = jnp.cumprod(1.0 - alpha, axis=1)
    t_before = jnp.concatenate(
        [jnp.ones((alpha.shape[0], 1)), transmittance[:, :-1]], axis=1
    )
    w = alpha * t_before  # (P, G)
    img = w @ colors  # (P, 3)
    if background is not None:
        img = img + transmittance[:, -1:] * background[None, :]
    return img.reshape(cam.height, cam.width, 3)


def _inverse_cov2d(cov2d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form 2x2 inverse. Returns (inv, det)."""
    det = cov2d[:, 0, 0] * cov2d[:, 1, 1] - cov2d[:, 0, 1] * cov2d[:, 1, 0]
    det = jnp.maximum(det, 1e-9)
    inv = (
        jnp.stack(
            [
                jnp.stack([cov2d[:, 1, 1], -cov2d[:, 0, 1]], -1),
                jnp.stack([-cov2d[:, 1, 0], cov2d[:, 0, 0]], -1),
            ],
            axis=-2,
        )
        / det[:, None, None]
    )
    return inv, det


def render_tiled(
    scene: GaussianScene,
    cam: Camera,
    background: Optional[jnp.ndarray] = None,
    *,
    tile_size: int = 16,
    max_per_tile: int = 512,
    radius_sigma: float = 3.5,
    tile_chunk: int = 32,
) -> jnp.ndarray:
    """Tile-based rasterizer: the TPU analogue of the reference's CUDA tile
    pipeline (reference: reconstruction/gaussian_splat.py:44-60 — gsplat).

    The dense :func:`render` evaluates every Gaussian at every pixel, which
    caps scenes at ~10-50k Gaussians. This version keeps every shape static
    (jit-stable) while recovering the sparsity of a tile rasterizer:

    1. one global front-to-back depth sort of all ``G`` Gaussians;
    2. per image tile, a conservative intersection test against each
       Gaussian's ``radius_sigma``·σ bounding box — O(T·G) compares, no
       transcendentals;
    3. ``lax.top_k`` over ``where(hit, -depth_rank, -inf)`` picks the
       ``max_per_tile`` nearest intersecting Gaussians per tile in depth
       order (static K, unfilled slots masked to α=0);
    4. per-tile alpha compositing over K instead of G — the hot loop is
       O(pixels·K), so total work scales with *coverage*, not scene size.

    Tiles are processed in chunks of ``tile_chunk`` under ``lax.map`` to
    bound the live (chunk, pixels, K) intermediate. Fully differentiable:
    gradients flow through the per-tile gathers; selection indices are
    stop-gradient by construction (argsort/top_k), exactly as the depth
    sort already is in :func:`render`.

    Gaussians contribute nothing beyond ``radius_sigma`` standard
    deviations (exp(-0.5·3.5²) ≈ 2e-3 of peak alpha), matching gsplat's
    cutoff semantics; results differ from :func:`render` by at most that
    tail.
    """
    H, W = cam.height, cam.width
    ts = tile_size
    if H % ts or W % ts:
        raise ValueError(f"image {H}x{W} not divisible by tile_size={ts}")
    nty, ntx = H // ts, W // ts
    n_tiles = nty * ntx
    if n_tiles % tile_chunk:
        # shrink the chunk to a divisor so lax.map sees equal-size chunks
        while n_tiles % tile_chunk:
            tile_chunk -= 1

    xy, cov2d, depth = project_gaussians(scene, cam)
    g = xy.shape[0]
    order = jnp.argsort(depth)
    xy, depth, cov2d = xy[order], depth[order], cov2d[order]
    colors = jax.nn.sigmoid(scene.colors[order])
    opac = jax.nn.sigmoid(scene.opacity_logits[order])
    inv, _ = _inverse_cov2d(cov2d)

    # conservative screen-space radius from the largest eigenvalue of cov2d
    a, b, c = cov2d[:, 0, 0], cov2d[:, 0, 1], cov2d[:, 1, 1]
    lam_max = 0.5 * (a + c) + jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0))
    radius = radius_sigma * jnp.sqrt(jnp.maximum(lam_max, 0.0))
    valid = depth > 1e-4

    k = min(max_per_tile, g)
    tile_iy, tile_ix = jnp.divmod(jnp.arange(n_tiles), ntx)
    centers = jnp.stack(
        [tile_ix * ts + ts / 2.0, tile_iy * ts + ts / 2.0], axis=-1
    )  # (T, 2) pixel-space tile centers
    half = ts / 2.0
    # local pixel grid within a tile, (ts*ts, 2) offsets from the tile origin
    lys = jnp.arange(ts, dtype=jnp.float32) + 0.5
    lxs = jnp.arange(ts, dtype=jnp.float32) + 0.5
    local = jnp.stack(jnp.meshgrid(lxs, lys), -1).reshape(-1, 2)  # (tp, 2) xy
    rank = jnp.arange(g, dtype=jnp.int32)

    def chunk_render(chunk):
        ctr, origin = chunk  # (C, 2), (C, 2)
        dxy = jnp.abs(xy[None] - ctr[:, None, :])  # (C, G, 2)
        hit = valid[None] & jnp.all(dxy <= half + radius[None, :, None], axis=-1)
        key = jnp.where(hit, -rank[None, :], -(g + 1))  # (C, G) int32
        kv, kidx = jax.lax.top_k(key, k)  # front-to-back: -rank descending
        ok = kv > -(g + 1)  # (C, K)

        xyk = xy[kidx]  # (C, K, 2)
        invk = inv[kidx]  # (C, K, 2, 2)
        opk = jnp.where(ok, opac[kidx], 0.0)  # (C, K)
        colk = colors[kidx]  # (C, K, 3)

        px = origin[:, None, :] + local[None, :, :]  # (C, tp, 2)
        dx = px[:, :, None, 0] - xyk[:, None, :, 0]
        dy = px[:, :, None, 1] - xyk[:, None, :, 1]
        maha = (
            invk[:, None, :, 0, 0] * dx * dx
            + 2.0 * invk[:, None, :, 0, 1] * dx * dy
            + invk[:, None, :, 1, 1] * dy * dy
        )  # (C, tp, K)
        alpha = jnp.clip(opk[:, None, :] * jnp.exp(-0.5 * maha), 0.0, 0.995)
        transmittance = jnp.cumprod(1.0 - alpha, axis=-1)
        t_before = jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), transmittance[..., :-1]], axis=-1
        )
        w = alpha * t_before  # (C, tp, K)
        img = jnp.einsum("ctk,ckd->ctd", w, colk)  # (C, tp, 3)
        if background is not None:
            img = img + transmittance[..., -1:] * background[None, None, :]
        return img

    origins = jnp.stack(
        [tile_ix * ts, tile_iy * ts], axis=-1
    ).astype(jnp.float32)
    n_chunks = n_tiles // tile_chunk
    tiles = jax.lax.map(
        chunk_render,
        (
            centers.reshape(n_chunks, tile_chunk, 2),
            origins.reshape(n_chunks, tile_chunk, 2),
        ),
    ).reshape(n_tiles, ts, ts, 3)
    return (
        tiles.reshape(nty, ntx, ts, ts, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(H, W, 3)
    )


def prune_scene(scene: GaussianScene, min_opacity: float = 0.01) -> GaussianScene:
    """Soft prune: collapse low-opacity Gaussians (static shapes: opacity→-inf
    rather than removing rows; the reference densify/prune loop resizes,
    which jit cannot — resizing happens between jit boundaries if desired)."""
    keep = jax.nn.sigmoid(scene.opacity_logits) >= min_opacity
    return scene._replace(
        opacity_logits=jnp.where(keep, scene.opacity_logits, -1e4)
    )


def make_train_step(cam: Camera, lr: float = 1e-2, renderer: str = "dense"):
    """Photometric training step: MSE to a target image.

    ``renderer='tiled'`` swaps in :func:`render_tiled` for large scenes.
    """
    import optax

    tx = optax.adam(lr)
    render_fn = render if renderer == "dense" else render_tiled

    def init(scene: GaussianScene):
        return tx.init(scene)

    @jax.jit
    def step(scene: GaussianScene, opt_state, target: jnp.ndarray):
        def loss_fn(s):
            img = render_fn(s, cam)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(scene)
        updates, opt_state = tx.update(grads, opt_state)
        scene = optax.apply_updates(scene, updates)
        return scene, opt_state, loss

    return init, step


def fit_scene(
    target: jnp.ndarray,
    cam: Camera,
    n_gaussians: int = 256,
    steps: int = 300,
    lr: float = 2e-2,
    seed: int = 0,
    extent: float = 1.0,
    renderer: str = "dense",
) -> Tuple[GaussianScene, float]:
    """Fit a scene to one target image; returns (scene, final_loss)."""
    scene = init_scene(jax.random.PRNGKey(seed), n_gaussians, extent)
    init, step = make_train_step(cam, lr, renderer=renderer)
    opt_state = init(scene)
    loss = jnp.inf
    for _ in range(steps):
        scene, opt_state, loss = step(scene, opt_state, target)
    return scene, float(loss)


# --------------------------------------------------------------------------- #
# Adaptive density control (reference: reconstruction/gaussian_splat.py:44-60
# — the gsplat trainer's densify/prune loop). TPU design: shapes are STATIC
# inside each jit phase; densification resizes the scene between phases
# (each new Gaussian count re-traces once, and counts are capped).
# --------------------------------------------------------------------------- #


def densify_and_prune(
    scene: GaussianScene,
    grad_avg: jnp.ndarray,
    key: jax.Array,
    *,
    grad_threshold: float = 5e-4,
    split_scale: float = 0.05,
    split_factor: float = 1.6,
    min_opacity: float = 0.01,
    max_gaussians: int = 50_000,
):
    """Host-side adaptive density control.

    * prune: drop Gaussians with opacity < ``min_opacity``
    * clone: duplicate small high-gradient Gaussians in place
    * split: replace large high-gradient Gaussians with two children
      sampled from the parent, scales divided by ``split_factor``

    Args:
        grad_avg: (G,) mean position-gradient norms since the last call.

    Returns:
        (new_scene, src_rows): ``src_rows[i]`` is the parent row of new row
        ``i`` — use it to remap optimizer moments across the resize.
    """
    import numpy as np

    g = scene.means.shape[0]
    opac = np.asarray(jax.nn.sigmoid(scene.opacity_logits))
    grad_avg = np.asarray(grad_avg)
    scales = np.asarray(jnp.exp(scene.log_scales)).max(-1)

    keep = opac >= min_opacity
    high = grad_avg > grad_threshold
    clone = keep & high & (scales <= split_scale)
    split = keep & high & (scales > split_scale)
    stay = keep & ~split

    idx = np.arange(g)
    src_rows = np.concatenate(
        [idx[stay], idx[clone], np.repeat(idx[split], 2)]
    )
    if len(src_rows) > max_gaussians:
        src_rows = src_rows[:max_gaussians]
    is_split_child = np.zeros(len(src_rows), bool)
    n_stay_clone = int(stay.sum() + clone.sum())
    is_split_child[n_stay_clone:] = True

    take = lambda a: jnp.asarray(np.asarray(a)[src_rows])  # noqa: E731
    new = GaussianScene(
        means=take(scene.means),
        log_scales=take(scene.log_scales),
        quats=take(scene.quats),
        colors=take(scene.colors),
        opacity_logits=take(scene.opacity_logits),
    )

    if is_split_child.any():
        # sample child means from the parent Gaussian; shrink scales
        child = jnp.asarray(is_split_child)
        eps = jax.random.normal(key, new.means.shape)
        R = quat_to_rotmat(new.quats)
        offs = jnp.einsum(
            "gij,gj->gi", R, eps * jnp.exp(new.log_scales)
        )
        new = new._replace(
            means=jnp.where(child[:, None], new.means + offs, new.means),
            log_scales=jnp.where(
                child[:, None],
                new.log_scales - jnp.log(split_factor),
                new.log_scales,
            ),
        )
    return new, src_rows


def reset_opacity(scene: GaussianScene, value: float = 0.01) -> GaussianScene:
    """Periodic opacity reset (gsplat behaviour): clamp opacity down so
    pruning can reconsider every Gaussian."""
    cap = jnp.log(value / (1 - value))
    return scene._replace(
        opacity_logits=jnp.minimum(scene.opacity_logits, cap)
    )


def make_train_step_with_stats(cam: Camera, lr: float = 1e-2, renderer: str = "dense"):
    """Like :func:`make_train_step` but also returns per-Gaussian position
    gradient norms (drives densification)."""
    import optax

    tx = optax.adam(lr)
    render_fn = render if renderer == "dense" else render_tiled

    @jax.jit
    def step(scene: GaussianScene, opt_state, target: jnp.ndarray):
        def loss_fn(s):
            img = render_fn(s, cam)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(scene)
        gnorm = jnp.linalg.norm(grads.means, axis=-1)
        updates, opt_state = tx.update(grads, opt_state)
        scene = optax.apply_updates(scene, updates)
        return scene, opt_state, loss, gnorm

    return tx, step


def fit_scene_adaptive(
    target: jnp.ndarray,
    cam: Camera,
    n_init: int = 64,
    steps: int = 600,
    densify_every: int = 150,
    densify_until: Optional[int] = None,
    lr: float = 2e-2,
    seed: int = 0,
    extent: float = 1.0,
    max_gaussians: int = 50_000,
    renderer: str = "dense",
    **densify_kw,
) -> Tuple[GaussianScene, float]:
    """Fit with adaptive density control: train → densify/prune → re-jit.

    Starts from few Gaussians and grows capacity where the photometric
    gradient concentrates, matching the reference trainer's behaviour
    (reference: reconstruction/gaussian_splat.py:44-60) without dynamic
    shapes inside jit.
    """
    import numpy as np
    import optax

    densify_until = densify_until or (steps * 2) // 3
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    scene = init_scene(k0, n_init, extent)
    tx, step = make_train_step_with_stats(cam, lr, renderer=renderer)
    opt_state = tx.init(scene)

    grad_accum = jnp.zeros(n_init)
    n_since = 0
    loss = jnp.inf
    for i in range(steps):
        scene, opt_state, loss, gnorm = step(scene, opt_state, target)
        grad_accum = grad_accum + gnorm
        n_since += 1
        if i < densify_until and (i + 1) % densify_every == 0:
            key, kd = jax.random.split(key)
            scene, src = densify_and_prune(
                scene, grad_accum / max(n_since, 1), kd,
                max_gaussians=max_gaussians, **densify_kw,
            )
            # remap adam moments to the new rows (children inherit parents)
            def remap(t):
                t = np.asarray(t)
                if t.ndim and t.shape[0] == len(grad_accum):
                    return jnp.asarray(t[src])
                return jnp.asarray(t)

            opt_state = jax.tree_util.tree_map(remap, opt_state)
            grad_accum = jnp.zeros(scene.means.shape[0])
            n_since = 0
    return scene, float(loss)
