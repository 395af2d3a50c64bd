"""Learning-evidence artifact (round-4 verdict item 3).

Round 3's e2e artifact proved PLUMBING, not learning: its synthetic data
planted no recoverable spatiotemporal structure, so masked-coordinate
reconstruction could not beat the mean predictor (xyz_error_m = 37 km on a
~100 km bbox — chance). This tool plants the structure the real Central
Florida data has (reference: dashboard/dataset_config.json statistics,
SPECIFICATIONS.MD:1811-1878 human-unit metrics):

  * species ↔ region: each species draws from a tight spatial cluster
    (σ ≈ 3 km) around its own center — species identity carries location;
  * seasonal signature: each species has a peak season — species carries
    time-of-year;
  * embeddings ↔ location/time: the (frozen-backbone proxy) language and
    vision embeddings contain a linear projection of (x, y, z, t) plus the
    species prototype — exactly the property real V-JEPA2/DeepSeek
    embeddings of geotagged imagery have (sun angle, vegetation, phenology).

Then trains the masked multimodal objective ON-CHIP at ≥5k observations to
convergence and reports, on a held-out split, each metric AGAINST the
best-constant/mean-predictor baseline computed on the same data:

  * masked-coordinate xyz error (spatial_mask=False everywhere) vs
    predicting the train-mean location — must beat it ≥5×;
  * masked-time error vs train-mean time;
  * masked-modality (language/vision hidden) reconstruction MSE vs
    predicting the train-mean embedding;
  * species linear-probe accuracy on the fused representation vs chance.

Writes LEARNING_EVIDENCE.json and merges a `learning_evidence` (v2) section
into REFERENCE_E2E.json.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/learning_evidence.py
     (add --cpu --n-obs 600 --steps 120 for a quick CPU smoke)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BOUNDS = {"north": 28.978, "south": 28.033, "east": -80.902, "west": -81.934}
YEARS = (2010, 2025)
LANGUAGE_DIM = 7168
VISION_DIM = 1408  # pooled V-JEPA2 patch dim (full rows pool to this)
SPAN_M = (
    (BOUNDS["north"] - BOUNDS["south"]) * 111_000.0,
    (BOUNDS["east"] - BOUNDS["west"]) * 111_000.0 * np.cos(np.deg2rad(28.5)),
    1000.0,
)
SPAN_H = (YEARS[1] - YEARS[0] + 1) * 365.25 * 24


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def generate(n_obs: int, n_species: int, seed: int = 7):
    """Reference-statistics synthetic set with RECOVERABLE structure."""
    rng = np.random.default_rng(seed)
    sp = rng.integers(0, n_species, n_obs)

    # species ↔ region (σ ≈ 3 km ≈ 0.03 of the ~100 km bbox)
    centers = rng.uniform(0.12, 0.88, (n_species, 2))
    xy = np.clip(
        centers[sp] + 0.03 * rng.standard_normal((n_obs, 2)), 0.0, 1.0
    )
    z = np.clip(
        0.3 + 0.15 * rng.standard_normal(n_obs)
        + 0.2 * (xy[:, 0] - 0.5), 0.0, 1.0
    )
    # seasonal signature: per-species peak day-of-year (σ 25 days) + year
    peak = rng.uniform(0.1, 0.9, n_species)
    doy = np.clip(peak[sp] + 0.07 * rng.standard_normal(n_obs), 0, 1)
    year = rng.integers(YEARS[0], YEARS[1] + 1, n_obs)
    t = ((year - YEARS[0]) + doy) / (YEARS[1] - YEARS[0] + 1)
    xyzt = np.stack([xy[:, 0], xy[:, 1], z, t], 1).astype(np.float32)

    # embeddings: NONLINEAR in the coordinates (round-4 verdict item 8 —
    # the linear `xyzt @ P` map was trivially invertible). The coordinate
    # code is a random 2-layer tanh MLP of xyzt, modulated by a per-species
    # seasonal phase (species × time interaction) and a per-species random
    # gain on every feature (species × coordinate interaction) — the
    # qualitative structure real V-JEPA2/DeepSeek embeddings of geotagged
    # imagery carry (sun angle, vegetation, phenology).
    phase = rng.uniform(0, 1, n_species)

    def embed(dim, scale_proto, scale_coord, noise, key):
        r = np.random.default_rng(key)
        proto = r.standard_normal((n_species, dim)).astype(np.float32)
        w1 = (r.standard_normal((4, 64)) * 1.5).astype(np.float32)
        b1 = r.standard_normal(64).astype(np.float32)
        w2 = (r.standard_normal((64, dim)) / 8.0).astype(np.float32)
        coord_code = np.tanh(xyzt @ w1 + b1) @ w2  # nonlinear xyzt code
        season = 1.0 + 0.4 * np.sin(
            2 * np.pi * (doy + phase[sp])
        ).astype(np.float32)[:, None]
        gain = (1.0 + 0.5 * r.standard_normal((n_species, dim))).astype(
            np.float32
        )
        e = (
            scale_proto * proto[sp]
            + scale_coord * gain[sp] * coord_code * season
            + noise * r.standard_normal((n_obs, dim)).astype(np.float32)
        )
        return e.astype(np.float32)

    lang = embed(LANGUAGE_DIM, 1.0, 2.0, 0.3, seed + 1)
    vis = embed(VISION_DIM, 1.0, 2.0, 0.3, seed + 2)
    return xyzt, sp.astype(np.int32), lang, vis


def build_config(n_species: int):
    import jax.numpy as jnp

    from deepearth_tpu.configs import (
        DeepEarthConfig, Grid4DConfig, ModalityConfig, TransformerConfig,
    )

    cfg = DeepEarthConfig(
        hidden_dim=256,
        n_heads=8,
        n_layers=4,
        grid4d=Grid4DConfig(
            n_spatial_levels=12, n_temporal_levels=6,
            n_features_per_level=2, hash_table_size=2 ** 16,
        ),
        modality_encoder=TransformerConfig(
            hidden_dim=256, n_heads=8, n_layers=2
        ),
        compute_dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
    )
    cfg.fusion.universal_dim = 256
    cfg.fusion.num_fusion_layers = 4
    cfg.fusion.num_heads = 8
    cfg.add_modality(ModalityConfig(
        name="species", encoding_type="learned_embedding",
        input_type="categorical", vocab_size=n_species, mask_prob=0.3,
    ))
    cfg.add_modality(ModalityConfig(
        name="language", input_dim=LANGUAGE_DIM, n_tokens=1,
        encoder_layers=2, encoder_heads=8, mask_prob=0.3,
    ))
    cfg.add_modality(ModalityConfig(
        name="vision", input_dim=VISION_DIM, n_tokens=1,
        encoder_layers=2, encoder_heads=8, mask_prob=0.3,
    ))
    # the objective that matters here: hidden coordinates reconstructed
    # from the visible modalities (reference: SPECIFICATIONS.MD:256-261)
    cfg.masking.spatial_mask_prob = 0.5
    cfg.masking.temporal_mask_prob = 0.5
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-obs", type=int, default=6000)
    ap.add_argument("--n-species", type=int, default=32)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "LEARNING_EVIDENCE.json"))
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepearth_tpu.evaluation import DeepEarthEvaluator
    from deepearth_tpu.models import DeepEarthModel
    from deepearth_tpu.training import LossWeights, Trainer
    from deepearth_tpu.training.metrics import (
        coordinate_error_meters, time_error_hours,
    )

    log(f"devices: {jax.devices()}")
    xyzt, sp, lang, vis = generate(args.n_obs, args.n_species)
    n_test = max(args.n_obs // 5, 64)
    perm = np.random.default_rng(0).permutation(args.n_obs)
    test_idx, train_idx = perm[:n_test], perm[n_test:]

    cfg = build_config(args.n_species)
    cfg.optimizer.learning_rate = args.lr
    cfg.optimizer.warmup_steps = max(args.steps // 20, 10)
    cfg.optimizer.total_steps = args.steps
    model = DeepEarthModel(cfg)
    trainer = Trainer(model, cfg, LossWeights(contrastive=0.02))

    rng = np.random.default_rng(1)

    def make_batch(sel):
        return {
            "xyzt": jnp.asarray(xyzt[sel]),
            "modalities": {
                "species": jnp.asarray(sp[sel]),
                "language": jnp.asarray(lang[sel]),
                "vision": jnp.asarray(vis[sel]),
            },
        }

    def batches():
        while True:
            yield make_batch(rng.choice(train_idx, args.batch, replace=False))

    t0 = time.time()
    state = trainer.init_state(make_batch(train_idx[: args.batch]))
    n_params = sum(
        int(np.prod(l.shape))
        for l in jax.tree_util.tree_leaves(state.params)
    )
    log(f"params: {n_params/1e6:.1f}M, training {args.steps} steps "
        f"@ batch {args.batch} on {jax.default_backend()}")
    loss_curve = []

    class _CurveSink:
        def log(self, metrics, step=None):
            if "loss/total" in metrics:
                loss_curve.append(
                    [int(step), round(float(metrics["loss/total"]), 4)]
                )

    state, metrics = trainer.fit(
        state, batches(), num_steps=args.steps,
        log_every=max(args.steps // 40, 1),
        metric_sink=_CurveSink(),
    )
    train_s = time.time() - t0
    log(f"trained in {train_s:.1f}s, final loss "
        f"{float(metrics['loss/total']):.4f}")

    # ---- targeted-mask evaluation on the held-out split ------------------- #
    test_batch = make_batch(test_idx)
    B = len(test_idx)
    apply = jax.jit(
        lambda p, b: model.apply({"params": p}, b, deterministic=True)
    )

    def masked_eval(**mask_kw):
        b = dict(test_batch)
        if mask_kw.get("coords"):
            b["spatial_mask"] = jnp.zeros((B,), bool)
            b["temporal_mask"] = jnp.zeros((B,), bool)
        hidden = mask_kw.get("modality")
        if hidden:
            b["modality_masks"] = {
                m: jnp.full((B,), m != hidden)
                for m in ("species", "language", "vision")
            }
        return apply(state.params, b)

    # 1) coordinates fully hidden → reconstruct from modalities
    out_c = masked_eval(coords=True)
    xyz_m = float(coordinate_error_meters(
        out_c["reconstructions"]["spatial"], test_batch["xyzt"][:, :3], SPAN_M
    ))
    t_h = float(time_error_hours(
        out_c["reconstructions"]["temporal"][:, 0], test_batch["xyzt"][:, 3],
        SPAN_H,
    ))
    # mean-predictor baselines (train mean, evaluated on test)
    mean_xyz = xyzt[train_idx, :3].mean(0)
    base_xyz_m = float(coordinate_error_meters(
        jnp.broadcast_to(jnp.asarray(mean_xyz), (B, 3)),
        test_batch["xyzt"][:, :3], SPAN_M,
    ))
    mean_t = xyzt[train_idx, 3].mean()
    base_t_h = float(time_error_hours(
        jnp.full((B,), mean_t), test_batch["xyzt"][:, 3], SPAN_H
    ))

    # 2) masked-modality reconstruction vs train-mean embedding
    mod_rows = {}
    for name, data in (("language", lang), ("vision", vis)):
        out_m = masked_eval(modality=name)
        pred = np.asarray(out_m["reconstructions"][name], np.float32)
        truth = data[test_idx]
        mse = float(np.mean((pred - truth) ** 2))
        base = float(np.mean((data[train_idx].mean(0) - truth) ** 2))
        mod_rows[name] = {
            "masked_mse": mse, "mean_predictor_mse": base,
            "improvement_x": round(base / max(mse, 1e-12), 2),
        }

    # 3) species probe on the fused representation (all visible)
    out_f = masked_eval()
    feats = np.asarray(out_f["fused_representation"], np.float32)
    ev = DeepEarthEvaluator(lambda b: feats)
    probe = ev.evaluate_classification(
        feats, sp[test_idx], n_classes=args.n_species, steps=300
    )

    artifact = {
        "generator": {
            "n_obs": args.n_obs, "n_species": args.n_species,
            "structure": [
                "species-region clusters sigma~3km",
                "per-species seasonal peak sigma~25d",
                "embeddings = proto[sp] + 2*gain[sp] * "
                "(tanh(xyzt@W1+b1)@W2) * (1+0.4 sin(2pi(doy+phase[sp]))) "
                "+ 0.3*noise  (nonlinear coordinate code, species x coord "
                "and species x season interactions — verdict r4 item 8)",
            ],
            "bbox": BOUNDS, "years": list(YEARS),
        },
        "training": {
            "backend": jax.default_backend(),
            "params_m": round(n_params / 1e6, 2),
            "steps": args.steps, "batch": args.batch,
            "final_loss": float(metrics["loss/total"]),
            "wall_s": round(train_s, 1),
            "loss_curve_step_loss": loss_curve,
        },
        "held_out": {
            "n_test": int(B),
            "masked_coordinates": {
                "xyz_error_m": round(xyz_m, 1),
                "baseline_mean_predictor_m": round(base_xyz_m, 1),
                "improvement_x": round(base_xyz_m / max(xyz_m, 1e-9), 2),
            },
            "masked_time": {
                "t_error_h": round(t_h, 1),
                "baseline_mean_predictor_h": round(base_t_h, 1),
                "improvement_x": round(base_t_h / max(t_h, 1e-9), 2),
            },
            "masked_modalities": mod_rows,
            "species_probe": {
                "accuracy": float(probe.metrics["accuracy"]),
                "chance": 1.0 / args.n_species,
            },
        },
    }
    from deepearth_tpu.utils.artifacts import round_stamp

    artifact.update(round_stamp())
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    # merge the v2 section into REFERENCE_E2E.json (verdict item 3's "done");
    # only for the real (default-path) run, never for --out smoke runs
    ref_path = os.path.join(REPO, "REFERENCE_E2E.json")
    if os.path.exists(ref_path) and os.path.abspath(args.out) == os.path.abspath(
        os.path.join(REPO, "LEARNING_EVIDENCE.json")
    ):
        with open(ref_path) as f:
            ref = json.load(f)
        ref["learning_evidence"] = artifact
        with open(ref_path, "w") as f:
            json.dump(ref, f, indent=2)
    print(json.dumps(artifact))
    imp = artifact["held_out"]["masked_coordinates"]["improvement_x"]
    assert imp >= 5.0, (
        f"masked-coordinate error only {imp}x better than mean predictor"
    )
    log(f"OK: masked-coordinate {imp}x over baseline")


if __name__ == "__main__":
    main()
