"""CLI: convert an HF DeepSeek checkpoint to native flax params.

Wraps deepearth_tpu.models.hf_convert (reference capability:
encoders/modeling_deepseek.py + HF from_pretrained). Output is a directory
with `params.msgpack` (flax serialization) + `config.json` (block config +
vocab), loadable by `load_converted()` below, the language server, and
`generate()`.

Usage:
  python scripts/convert_checkpoint.py /path/to/hf_ckpt out_dir [--verify]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _honor_jax_platforms_env() -> None:
    """The axon sitecustomize sets jax_platforms programmatically, which
    silently overrides the JAX_PLATFORMS env var — re-assert the user's
    choice before the backend initializes."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        try:
            import jax

            jax.config.update("jax_platforms", want)
        except Exception:
            pass


def save_converted(out_dir: str, params, cfg, vocab_size: int) -> None:
    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "params.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(
            {"block_config": dataclasses.asdict(cfg), "vocab_size": vocab_size},
            f, indent=2, default=str,
        )


def load_converted(out_dir: str):
    """Returns (params, DeepSeekBlockConfig, vocab_size)."""
    from flax import serialization

    from deepearth_tpu.configs import (
        DeepSeekBlockConfig, MLAConfig, MoEConfig, RopeScalingConfig,
    )

    with open(os.path.join(out_dir, "params.msgpack"), "rb") as f:
        params = serialization.msgpack_restore(f.read())
    with open(os.path.join(out_dir, "config.json")) as f:
        meta = json.load(f)
    bc = dict(meta["block_config"])
    mla = dict(bc.pop("mla"))
    scaling = mla.pop("rope_scaling", None)
    if isinstance(scaling, dict):
        mla["rope_scaling"] = RopeScalingConfig(**scaling)
    moe = bc.pop("moe", None)
    cfg = DeepSeekBlockConfig(
        mla=MLAConfig(**mla),
        moe=MoEConfig(**moe) if isinstance(moe, dict) else None,
        **bc,
    )
    return params, cfg, int(meta["vocab_size"])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="HF checkpoint dir (or torch state file)")
    ap.add_argument("out_dir")
    ap.add_argument("--config", help="config.json path when checkpoint is a bare state file")
    ap.add_argument("--verify", action="store_true",
                    help="run a forward through the converted params")
    args = ap.parse_args()
    _honor_jax_platforms_env()

    from deepearth_tpu.models.hf_convert import load_hf_checkpoint

    hf_cfg = None
    if args.config:
        with open(args.config) as f:
            hf_cfg = json.load(f)
    params, cfg, vocab = load_hf_checkpoint(args.checkpoint, hf_cfg)
    save_converted(args.out_dir, params, cfg, vocab)
    n = sum(
        int(p.size) for p in __import__("jax").tree_util.tree_leaves(params)
    )
    print(f"converted {n/1e6:.1f}M params → {args.out_dir}")

    if args.verify:
        import jax
        import jax.numpy as jnp

        from deepearth_tpu.models import DeepSeekForCausalLM

        p2, cfg2, vocab2 = load_converted(args.out_dir)
        model = DeepSeekForCausalLM(cfg2, vocab_size=vocab2)
        ids = jnp.zeros((1, 4), jnp.int32)
        logits = model.apply({"params": jax.tree.map(jnp.asarray, p2)}, ids)
        assert logits.shape == (1, 4, vocab2)
        print(f"verify OK: logits {logits.shape}, finite="
              f"{bool(jnp.isfinite(logits).all())}")


if __name__ == "__main__":
    main()
