"""Language embedding service: /embed, /tokenize, /generate, /health
(reference: encoders/language/server.py:31-50 + client.py:14).

The reference serves DeepSeek-V3 embeddings (7168-d) from a llama.cpp GGUF
build needing 300-400 GB RAM (reference: encoders/language/README.md:18-31).
Here the embedder is pluggable:

* :class:`HFEmbedder` — any HF transformers checkpoint (token embeddings +
  masked-mean pooling, matching LanguageModelExtractor semantics,
  reference: encoders/modality_infrastructure.py:192-308).
* :class:`HashEmbedder` — deterministic hash-based embedding for tests and
  air-gapped environments: stable across processes, unit-norm, any dim.

Requests are serialized with a model lock, matching the reference server's
concurrency discipline (reference: encoders/language/server.py:27).
"""

from __future__ import annotations

import functools
import hashlib
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

from ..utils.logging import get_logger

logger = get_logger("LanguageServer")


class HashEmbedder:
    """Deterministic text → unit-norm embedding; same text → same vector."""

    def __init__(self, dim: int = 7168):
        self.dim = dim

    def tokenize(self, text: str) -> List[int]:
        return [
            int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=4).digest(), "little"
            )
            % 50_000
            for w in text.split()
        ]

    def embed(self, text: str) -> np.ndarray:
        seed = int.from_bytes(
            hashlib.blake2b(text.encode(), digest_size=8).digest(), "little"
        )
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(self.dim).astype(np.float32)
        return v / (np.linalg.norm(v) + 1e-8)


class HFEmbedder:
    """Frozen HF LM embeddings with masked-mean pooling
    (reference: encoders/modality_infrastructure.py:192-308)."""

    def __init__(self, model_name: str, device: str = "cpu"):
        import torch
        from transformers import AutoModel, AutoTokenizer

        self._torch = torch
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModel.from_pretrained(model_name).to(device).eval()
        self.device = device
        self.dim = self.model.config.hidden_size

    def tokenize(self, text: str) -> List[int]:
        return self.tokenizer(text)["input_ids"]

    def embed(self, text: str) -> np.ndarray:
        torch = self._torch
        with torch.no_grad():
            enc = self.tokenizer(
                text, return_tensors="pt", truncation=True, max_length=2048
            ).to(self.device)
            out = self.model(**enc).last_hidden_state  # (1, S, H)
            mask = enc["attention_mask"][..., None].float()
            pooled = (out * mask).sum(1) / mask.sum(1).clamp(min=1)
        return pooled[0].cpu().numpy().astype(np.float32)


class DeepSeekFlaxEmbedder:
    """TPU-side real-weight embedder: serve embeddings (and generation) from
    a converted DeepSeek checkpoint through the flax stack.

    Replaces the reference's llama.cpp GGUF server (300-400 GB host RAM,
    reference: encoders/language/README.md:18-31) with the jit-compiled
    MLA/MoE model on the accelerator; weights arrive via
    :func:`deepearth_tpu.models.hf_convert.load_hf_checkpoint` or any torch
    state_dict.

    Embedding = masked-mean of final hidden states (the reference server's
    ``embedding=True`` semantics).
    """

    def __init__(self, params, cfg, vocab_size: int, tokenizer=None,
                 quantize_int8: bool = False, quant_min_dim: int = 256,
                 quant_bits: int = 8):
        import jax
        import jax.numpy as jnp

        from ..models.deepseek import DeepSeekTransformer

        self.cfg = cfg
        self.vocab_size = vocab_size
        self.dim = cfg.hidden_dim
        self.params = jax.tree_util.tree_map(np.asarray, params)
        self.tokenizer = tokenizer or HashEmbedder(dim=cfg.hidden_dim)
        # int8/int4 weight-only decode (serving parity with the reference's
        # quantized llama.cpp service): generation runs over a second,
        # quantized tree through the Pallas fused-dequant kernels — int8
        # measured 1.29-1.41× decode (BENCH_DECODE.json) at ~0.5× weight
        # bytes; quant_bits=4 packs two nibbles per byte (~0.25×).
        # The embed path keeps the bf16 tree (flax apply needs it), so
        # enabling this costs ~1.5× total weight memory.
        self.gen_params = self.params
        if quantize_int8:
            from ..ops.quant import quantize_decoder_params

            self.gen_params = jax.jit(
                functools.partial(quantize_decoder_params,
                                  min_dim=quant_min_dim, bits=quant_bits)
            )(self.params)

        def hidden(p, ids, mask):
            emb = p["embed_tokens"]["embedding"][ids]
            h = DeepSeekTransformer(cfg).apply(
                {"params": p["model"]}, emb, key_mask=mask, is_causal=True
            )
            w = mask[..., None].astype(h.dtype)
            return (h * w).sum(1) / jnp.maximum(w.sum(1), 1.0)

        self._hidden = jax.jit(hidden)

    @classmethod
    def from_checkpoint(cls, path: str, hf_config=None, tokenizer=None,
                        quantize_int8: bool = False):
        from ..models.hf_convert import load_hf_checkpoint

        params, cfg, vocab = load_hf_checkpoint(path, hf_config)
        return cls(params, cfg, vocab, tokenizer,
                   quantize_int8=quantize_int8)

    def tokenize(self, text: str) -> List[int]:
        if hasattr(self.tokenizer, "tokenize"):
            toks = self.tokenizer.tokenize(text)
            return [t % self.vocab_size for t in toks]
        return [t % self.vocab_size for t in self.tokenizer(text)["input_ids"]]

    # Static jit keys are bucketed so hostile/varied clients cannot force a
    # 20-60 s remote compile per request while holding the service lock
    # (ADVICE r2). Temperature is a runtime argument (no compile impact);
    # max_new_tokens and the prompt length snap to these FINITE bucket
    # sets, so at most len(PROMPT_BUCKETS)·len(GEN_TOKEN_BUCKETS) decode
    # programs (+len(PROMPT_BUCKETS) embed programs) ever compile.
    # Over-long prompts are truncated (most recent tokens kept), never a
    # new shape: a single multi-100k-token request must not key an
    # O(prompt) KV cache or compile into jit.
    GEN_TOKEN_BUCKETS = (16, 32, 64, 128, 256)
    PROMPT_BUCKETS = (64, 128, 256, 512, 1024, 2048)

    def _max_prompt(self) -> int:
        mpe = int(getattr(self.cfg, "max_position_embeddings", 0) or 0)
        limit = mpe - self.GEN_TOKEN_BUCKETS[-1]
        cap = self.PROMPT_BUCKETS[-1]
        if limit > 0:
            return max(self.PROMPT_BUCKETS[0], min(cap, limit))
        # Tiny position table (mpe <= the largest gen bucket): never hand
        # back the service cap — clamp to the model, reserving at least the
        # smallest decode bucket, so prompt + decode positions cannot index
        # past the RoPE/position range.
        return max(1, min(cap, mpe - self.GEN_TOKEN_BUCKETS[0])) if mpe else cap

    def _bucket_prompt(self, ids: List[int]) -> tuple:
        """(padded ids, true length): snap to PROMPT_BUCKETS, truncate to
        the model/service cap keeping the most recent tokens."""
        max_prompt = self._max_prompt()
        if len(ids) > max_prompt:
            ids = ids[-max_prompt:]
        prompt_len = len(ids)
        pad_to = next(
            (b for b in self.PROMPT_BUCKETS
             if b >= prompt_len and b <= max_prompt),
            max_prompt,
        )
        return ids + [0] * (pad_to - prompt_len), prompt_len

    def embed(self, text: str) -> np.ndarray:
        import jax.numpy as jnp

        ids, prompt_len = self._bucket_prompt(self.tokenize(text) or [0])
        ids_arr = jnp.asarray([ids], jnp.int32)
        mask = jnp.arange(len(ids))[None, :] < prompt_len
        out = self._hidden(self.params, ids_arr, mask)
        return np.asarray(out[0], np.float32)

    def generate(self, text: str, max_new_tokens: int = 32,
                 temperature: float = 0.0,
                 rng: Optional[np.ndarray] = None) -> List[int]:
        import jax
        import jax.numpy as jnp

        from ..models.generation import generate as _generate

        n_req = max(1, min(int(max_new_tokens), self.GEN_TOKEN_BUCKETS[-1]))
        n_bucket = next(b for b in self.GEN_TOKEN_BUCKETS if b >= n_req)
        temperature = float(min(max(float(temperature), 0.0), 4.0))

        ids, prompt_len = self._bucket_prompt(self.tokenize(text) or [0])
        pad_to = len(ids)
        ids_arr = jnp.asarray([ids], jnp.int32)

        if rng is None:
            # per-request entropy: with temperature > 0, two identical
            # requests must not return the identical sample (ADVICE r2)
            seed = int.from_bytes(os.urandom(4), "little")
            rng = jax.random.PRNGKey(seed)
        toks = _generate(
            self.gen_params, self.cfg, ids_arr, n_bucket,
            temperature=temperature, rng=rng,
            max_len=pad_to + n_bucket, prompt_len=prompt_len,
        )
        return np.asarray(toks[0, :n_req]).tolist()


class LanguageEmbeddingService:
    def __init__(self, embedder=None):
        self.embedder = embedder or HashEmbedder()
        self._lock = threading.Lock()  # serialize model access
        self.request_count = 0

    def embed(self, texts: List[str]) -> np.ndarray:
        with self._lock:
            return np.stack([self.embedder.embed(t) for t in texts])

    def tokenize(self, text: str) -> List[int]:
        with self._lock:
            return self.embedder.tokenize(text)

    def generate(self, text: str, max_new_tokens: int = 32,
                 temperature: float = 0.0) -> List[int]:
        if not hasattr(self.embedder, "generate"):
            raise ValueError(
                f"{type(self.embedder).__name__} backend cannot generate"
            )
        with self._lock:
            return self.embedder.generate(
                text, max_new_tokens=max_new_tokens, temperature=temperature
            )

    def health(self) -> Dict:
        return {
            "status": "healthy",
            "dim": self.embedder.dim,
            "backend": type(self.embedder).__name__,
            "requests": self.request_count,
        }


def make_handler(service: LanguageEmbeddingService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.debug(fmt % args)

        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            service.request_count += 1
            if self.path == "/health":
                return self._send(200, service.health())
            return self._send(404, {"error": "unknown route"})

        def do_POST(self):
            service.request_count += 1
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/embed":
                    texts = payload.get("texts") or [payload["text"]]
                    emb = service.embed(texts)
                    return self._send(
                        200, {"embeddings": emb.tolist(), "dim": emb.shape[-1]}
                    )
                if self.path == "/tokenize":
                    return self._send(
                        200, {"tokens": service.tokenize(payload["text"])}
                    )
                if self.path == "/generate":
                    # decode via the memoized compressed-cache loop
                    # (models/generation.py); DeepSeekFlaxEmbedder only
                    toks = service.generate(
                        payload["text"],
                        max_new_tokens=int(payload.get("max_new_tokens", 32)),
                        temperature=float(payload.get("temperature", 0.0)),
                    )
                    return self._send(200, {"tokens": toks})
                return self._send(404, {"error": "unknown route"})
            except KeyError as e:
                return self._send(400, {"error": f"missing field {e}"})
            except ValueError as e:
                return self._send(400, {"error": str(e)})
            except Exception as e:
                return self._send(500, {"error": str(e)})

    return Handler


class LanguageServer:
    def __init__(self, service=None, host: str = "127.0.0.1", port: int = 0):
        self.service = service or LanguageEmbeddingService()
        self._httpd = ThreadingHTTPServer((host, port), make_handler(self.service))
        self.host, self.port = self._httpd.server_address
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "LanguageServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


class LanguageClient:
    """Client (reference: encoders/language/client.py:14)."""

    def __init__(self, base_url: str, timeout: float = 60.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _post(self, path, payload):
        import urllib.request

        req = urllib.request.Request(
            self.base_url + path,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    def embed(self, text_or_texts) -> np.ndarray:
        if isinstance(text_or_texts, str):
            out = self._post("/embed", {"text": text_or_texts})
            return np.asarray(out["embeddings"][0], np.float32)
        out = self._post("/embed", {"texts": list(text_or_texts)})
        return np.asarray(out["embeddings"], np.float32)

    def tokenize(self, text: str) -> List[int]:
        return self._post("/tokenize", {"text": text})["tokens"]

    def generate(self, text: str, max_new_tokens: int = 32,
                 temperature: float = 0.0) -> List[int]:
        return self._post(
            "/generate",
            {"text": text, "max_new_tokens": max_new_tokens,
             "temperature": temperature},
        )["tokens"]

    def health(self) -> Dict:
        import urllib.request

        with urllib.request.urlopen(
            self.base_url + "/health", timeout=self.timeout
        ) as r:
            return json.loads(r.read())
