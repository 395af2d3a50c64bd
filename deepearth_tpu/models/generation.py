"""Autoregressive generation for DeepSeekForCausalLM with compressed KV cache.

The reference relied on HF ``generate`` over the vendored module
(reference: encoders/modeling_deepseek.py:1514-1730); here decoding is built
on MLA projection absorption (:mod:`deepearth_tpu.models.mla_decode`), so the
per-token cache is ``kv_lora_rank + qk_rope_head_dim`` floats — ~57× smaller
than full per-head K/V at DeepSeek-V3 dims — during *real* decode, not just
on paper.

Everything is static-shape: caches are pre-allocated to ``max_len`` and both
prefill and sampling run under ``lax.scan``, so one compilation serves any
prompt/generation length up to the cap.
"""

from __future__ import annotations

import math
from collections import OrderedDict
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import DeepSeekBlockConfig
from ..ops.quant import expert_ffn_q, linear_p
from .mla_decode import MLACache, decode_step, init_cache


def _rms(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (weight * (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)).astype(
        x.dtype
    )


def _swiglu_apply(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    # linear_p routes through the Pallas fused-dequant kernel when the
    # params were converted by ops.quant.quantize_decoder_params
    gate = linear_p(p["gate_proj"], x)
    up = linear_p(p["up_proj"], x)
    return linear_p(p["down_proj"], jax.nn.silu(gate) * up)


def _moe_apply(p: Dict[str, Any], cfg, x: jnp.ndarray) -> jnp.ndarray:
    """Pure-param MoE forward (same math as models.deepseek.MoELayer)."""
    from ..ops.moe import expert_ffn, make_dispatch_combine, moe_gate

    shape = x.shape
    xf = x.reshape(-1, shape[-1])
    s = xf.shape[0]
    e, k = cfg.n_routed_experts, cfg.num_experts_per_tok
    logits = jnp.einsum(
        "sd,ed->se", xf.astype(jnp.float32), p["router_weight"],
        preferred_element_type=jnp.float32,
    )
    gate = moe_gate(
        logits, p["e_score_correction_bias"],
        top_k=k, n_group=cfg.n_group, topk_group=cfg.topk_group,
        norm_topk_prob=cfg.norm_topk_prob,
        routed_scaling_factor=cfg.routed_scaling_factor,
    )
    if cfg.capacity_factor is None:  # drop-free
        capacity = s * k
    else:
        capacity = max(k, int(math.ceil(s * k / e * cfg.capacity_factor)))
    dispatch, combine, _ = make_dispatch_combine(
        gate.topk_idx, gate.topk_weight, n_experts=e, capacity=capacity
    )
    expert_in = jnp.einsum("sec,sd->ecd", dispatch.astype(xf.dtype), xf)
    if "w_gate_q" in p or "w_gate_q4" in p:  # quantized experts (ops.quant)
        expert_out = expert_ffn_q(p, expert_in)
    else:
        expert_out = expert_ffn(expert_in, p["w_gate"], p["w_up"], p["w_down"])
    y = jnp.einsum("sec,ecd->sd", combine.astype(xf.dtype), expert_out)
    if cfg.n_shared_experts:
        y = y + _swiglu_apply(p["shared_experts"], xf)
    return y.reshape(shape).astype(x.dtype)


def _is_moe_layer(cfg: DeepSeekBlockConfig, i: int) -> bool:
    return (
        cfg.moe is not None
        and i >= cfg.first_k_dense_replace
        and i % cfg.moe_layer_freq == 0
    )


def causal_lm_decode_step(
    params: Dict[str, Any],
    cfg: DeepSeekBlockConfig,
    caches: Tuple[MLACache, ...],
    token_ids: jnp.ndarray,
    max_len: int,
) -> Tuple[jnp.ndarray, Tuple[MLACache, ...]]:
    """One decode step through every layer of a DeepSeekForCausalLM.

    Args:
        params: flax params of DeepSeekForCausalLM (converted or trained).
        caches: one MLACache per layer.
        token_ids: (B,) int32 current tokens.

    Returns:
        (B, vocab) float32 logits for the next token + updated caches.
    """
    emb = params["embed_tokens"]["embedding"]
    h = emb[token_ids][:, None, :]  # (B, 1, D)
    mp = params["model"]
    new_caches = []
    for i in range(cfg.n_layers):
        lp = mp[f"layer_{i}"]
        hn = _rms(h, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)
        attn, c = decode_step(lp["self_attn"], cfg.mla, caches[i], hn, max_len)
        new_caches.append(c)
        h = h + attn
        hn = _rms(h, lp["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
        if _is_moe_layer(cfg, i):
            h = h + _moe_apply(lp["moe"], cfg.moe, hn)
        else:
            h = h + _swiglu_apply(lp["mlp"], hn)
    h = _rms(h, mp["norm"]["weight"], cfg.rms_norm_eps)
    if "lm_head" in params:
        logits = linear_p(params["lm_head"], h)
    else:  # tied embeddings
        logits = h @ emb.T
    return logits[:, 0].astype(jnp.float32), tuple(new_caches)


def _sample(logits, rng, temperature, top_k: Optional[int]):
    """Sample with a RUNTIME temperature (traced scalar; 0.0 → greedy).

    Temperature used to be a static jit key — every distinct client value
    triggered a 20-60 s remote recompile (ADVICE r2). Both branches are
    computed and selected with ``where``; top_k stays static (lax.top_k
    needs a static k) but servers clamp it to a small set.
    """
    if top_k is not None:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    t = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)
    sampled = jax.random.categorical(rng, logits / t, axis=-1).astype(jnp.int32)
    return jnp.where(jnp.asarray(temperature, jnp.float32) > 0.0, sampled, greedy)


def generate(
    params: Dict[str, Any],
    cfg: DeepSeekBlockConfig,
    input_ids: jnp.ndarray,
    max_new_tokens: int,
    *,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    rng: Optional[jax.Array] = None,
    max_len: Optional[int] = None,
    cache_dtype=jnp.float32,
    prompt_len: Optional[int] = None,
) -> jnp.ndarray:
    """Greedy/temperature sampling loop over the compressed-cache decoder.

    Args:
        input_ids: (B, S) int32 prompt (optionally right-padded; see
            ``prompt_len``).
        max_new_tokens: number of tokens to sample.
        temperature: 0.0 → greedy; >0 → softmax sampling (optionally top-k
            filtered). Runtime argument — does NOT key compilation.
        prompt_len: number of VALID leading prompt tokens (default: S).
            Lets servers pad prompts to bucketed lengths: pad tokens are
            prefetched through the model but their cache slots are
            overwritten during decode and never attended to (the cache's
            ``length`` is reset to ``prompt_len`` after prefill, and
            decode_step masks slots ``>= length``).

    Returns:
        (B, max_new_tokens) int32 sampled tokens.
    """
    B, S = input_ids.shape
    max_len = max_len or (S + max_new_tokens)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if prompt_len is None:
        prompt_len = S
    # converted checkpoints arrive as numpy — device arrays required under jit
    params = jax.tree.map(jnp.asarray, params)
    run = _get_run(cfg, max_new_tokens, max_len, top_k,
                   jnp.dtype(cache_dtype).name)
    return run(
        params, input_ids, jnp.asarray(prompt_len, jnp.int32), rng,
        jnp.asarray(temperature, jnp.float32),
    )


def _get_run(cfg, max_new_tokens, max_len, top_k, cache_dtype_name):
    """Jitted decode loop, cached per static configuration.

    Defining the jitted closure inside :func:`generate` would retrace the
    whole n_layers × lax.scan program on EVERY call (jax.jit caches by
    function identity); serving calls generate repeatedly, so the compiled
    run is memoized on the static decode parameters instead. Caches are
    created inside jit — their shapes depend only on (B, max_len), which
    jit already keys on through input_ids.

    The cache is a bounded LRU (size ``_RUN_CACHE_MAX``): each compiled
    program holds a live XLA executable, and the static key space
    (max_new_tokens × max_len × top_k) is client-influenced in serving —
    unbounded growth was ADVICE r2's memory-leak finding.
    """
    import dataclasses
    import json as _json

    key = (
        _json.dumps(dataclasses.asdict(cfg), sort_keys=True, default=str),
        max_new_tokens, max_len, top_k, cache_dtype_name,
    )
    cached = _RUN_CACHE.get(key)
    if cached is not None:
        _RUN_CACHE.move_to_end(key)
        return cached

    cache_dtype = jnp.dtype(cache_dtype_name)

    def prefill_body(params):
        def body(caches, tok):
            logits, caches = causal_lm_decode_step(
                params, cfg, caches, tok, max_len
            )
            return caches, logits
        return body

    def sample_body(params, temperature):
        def body(state, rng_t):
            caches, tok = state
            logits, caches = causal_lm_decode_step(
                params, cfg, caches, tok, max_len
            )
            nxt = _sample(logits, rng_t, temperature, top_k)
            return (caches, nxt), nxt
        return body

    @jax.jit
    def run(params, input_ids, prompt_len, rng, temperature):
        b = input_ids.shape[0]
        caches = tuple(
            init_cache(cfg.mla, b, max_len, cache_dtype)
            for _ in range(cfg.n_layers)
        )
        caches_out, logits_seq = jax.lax.scan(
            prefill_body(params), caches, input_ids.T.astype(jnp.int32)
        )
        # Right-pad-aware: sample from the logits of the last VALID prompt
        # token, and reset cache lengths so decode overwrites (and the
        # attention mask excludes) any pad slots written during prefill.
        last_logits = jax.lax.dynamic_slice_in_dim(
            logits_seq, prompt_len - 1, 1, axis=0
        )[0]
        caches_out = tuple(
            c._replace(length=prompt_len) for c in caches_out
        )
        first = _sample(last_logits, rng, temperature, top_k)
        rngs = jax.random.split(rng, max_new_tokens)
        (_, _), toks = jax.lax.scan(
            sample_body(params, temperature),
            (caches_out, first), rngs[: max_new_tokens - 1]
        )
        return jnp.concatenate([first[None], toks], axis=0).T  # (B, T)

    _RUN_CACHE[key] = run
    while len(_RUN_CACHE) > _RUN_CACHE_MAX:
        _RUN_CACHE.popitem(last=False)
    return run


_RUN_CACHE: "OrderedDict[Any, Any]" = OrderedDict()
_RUN_CACHE_MAX = 8
