"""CLI: decode from a converted DeepSeek checkpoint via the compressed cache.

Usage:
  python scripts/generate_cli.py converted_dir --prompt "live oak" \
      [--tokenizer hf_name_or_path] [--max-new-tokens 64] [--temperature 0.8]

Without --tokenizer, the prompt is hashed to stable token ids (air-gapped
default, matching the language service) and the output is printed as ids;
with an HF tokenizer, text in → text out.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("converted_dir", help="output of scripts/convert_checkpoint.py")
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--tokenizer", help="HF tokenizer name/path (optional)")
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from convert_checkpoint import _honor_jax_platforms_env, load_converted

    _honor_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    from deepearth_tpu.models.generation import generate

    params, cfg, vocab = load_converted(args.converted_dir)

    tok = None
    if args.tokenizer:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.tokenizer)
        ids = tok(args.prompt)["input_ids"]
    else:
        from deepearth_tpu.serving.language_server import HashEmbedder

        ids = [t % vocab for t in HashEmbedder().tokenize(args.prompt)] or [0]

    out = generate(
        params, cfg, jnp.asarray([ids], jnp.int32),
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature,
        top_k=args.top_k or None,
        rng=jax.random.PRNGKey(args.seed),
    )
    toks = out[0].tolist()
    if tok is not None:
        print(tok.decode(toks))
    else:
        print(" ".join(map(str, toks)))


if __name__ == "__main__":
    main()
