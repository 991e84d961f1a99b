"""Functional JAX implementation of the Llama 3.2 decoder (tied embeddings).

TPU-first design, not a torchtune port (ref architecture: SURVEY.md §2.1 "Model
factory"/"Model config", ssi/model.py:18-39, ssi/llama_configs.py:127-140):

- Parameters are a plain pytree with **layer-stacked** weights; the decoder runs as a
  single ``lax.scan`` over layers → one compiled block regardless of depth.
- Weights are kept in the HF rotate-half RoPE convention so HF checkpoints load and
  save without the q/k permutations torchtune needs.
- Linear weights are stored ``[in, out]`` so the forward pass is plain ``x @ W``.
- ``forward`` returns final-norm hidden states; the tied logits projection lives in
  the fused cross-entropy op (training) or ``logits()`` (inference), so training
  never materializes the full-vocab logits tensor.
- Optional ``jax.checkpoint`` rematerialization per layer for HBM savings.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ssi_tpu.models.configs import ConfigLlama3_2
from ssi_tpu.models.rope import apply_rope, rope_cos_sin
from ssi_tpu.ops.attention import xla_attention

Params = dict[str, Any]


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    normed = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def _block(
    h: jnp.ndarray,
    layer: Params,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cfg: ConfigLlama3_2,
    attn_impl: str,
    segment_ids: jnp.ndarray | None,
) -> jnp.ndarray:
    b, s, d = h.shape
    hd = cfg.head_dim

    x = rms_norm(h, layer["attn_norm"], cfg.norm_eps)
    q = (x @ layer["wq"]).reshape(b, s, cfg.num_heads, hd)
    k = (x @ layer["wk"]).reshape(b, s, cfg.num_kv_heads, hd)
    v = (x @ layer["wv"]).reshape(b, s, cfg.num_kv_heads, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    from ssi_tpu.ops.attention import AUTO_PALLAS_MIN_SEQ

    use_pallas = attn_impl == "pallas" or (attn_impl == "auto" and s >= AUTO_PALLAS_MIN_SEQ)
    if use_pallas:
        from ssi_tpu.ops.flash_attention import flash_attention

        attn = flash_attention(q, k, v, causal=True, segment_ids=segment_ids)
    else:
        attn = xla_attention(q, k, v, causal=True, segment_ids=segment_ids)
    h = h + attn.reshape(b, s, cfg.num_heads * hd) @ layer["wo"]

    x = rms_norm(h, layer["mlp_norm"], cfg.norm_eps)
    gate = jax.nn.silu(x @ layer["w_gate"])
    up = x @ layer["w_up"]
    h = h + (gate * up) @ layer["w_down"]
    return h


def forward(
    params: Params,
    tokens: jnp.ndarray,
    cfg: ConfigLlama3_2,
    *,
    positions: jnp.ndarray | None = None,
    segment_ids: jnp.ndarray | None = None,
    attn_impl: str = "xla",
    remat: bool = True,
) -> jnp.ndarray:
    """Run the decoder; returns final-normed hidden states ``[B, S, D]``.

    Args:
        params: pytree from :func:`init_params` / checkpoint load.
        tokens: ``[B, S]`` int32 token IDs.
        positions: optional ``[B, S]`` positions (defaults to 0..S-1 per row).
        segment_ids: optional ``[B, S]`` for packed sequences.
    """
    b, s = tokens.shape
    h = params["embed"][tokens]  # gather; [B, S, D]
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
    cos, sin = rope_cos_sin(
        positions,
        cfg.head_dim,
        rope_base=cfg.rope_base,
        scale_factor=cfg.scale_factor,
        low_freq_factor=cfg.rope_low_freq_factor,
        high_freq_factor=cfg.rope_high_freq_factor,
        original_max_seq_len=cfg.rope_original_max_seq_len,
    )

    block = functools.partial(_block, cos=cos, sin=sin, cfg=cfg, attn_impl=attn_impl, segment_ids=segment_ids)
    if remat:
        block = jax.checkpoint(block, prevent_cse=False)

    def scan_body(h, layer):
        return block(h, layer), None

    h, _ = jax.lax.scan(scan_body, h, params["layers"])
    return rms_norm(h, params["final_norm"], cfg.norm_eps)


def logits(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """Tied-embedding output projection (fp32 logits)."""
    return jnp.dot(hidden, params["embed"].T, preferred_element_type=jnp.float32)


# ----------------------------------------------------------------------------------
# KV-cache decode path (single-token steps for generation)
# ----------------------------------------------------------------------------------


def init_kv_cache(cfg: ConfigLlama3_2, batch: int, max_len: int, dtype=jnp.bfloat16) -> Params:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def forward_with_cache(
    params: Params,
    tokens: jnp.ndarray,
    cfg: ConfigLlama3_2,
    cache: Params,
    cache_positions: jnp.ndarray,
    *,
    attn_impl: str = "xla",
) -> tuple[jnp.ndarray, Params]:
    """Decoder forward writing new K/V into the cache at ``cache_positions``.

    Args:
        tokens: ``[B, T]`` (T = prompt length at prefill, 1 at decode).
        cache: dict of ``k``/``v`` ``[L, B, M, Hkv, Hd]``.
        cache_positions: ``[B]`` int32 — index of the first new token per row (each
            row's tokens occupy ``[pos, pos + T)``).

    Returns:
        (hidden ``[B, T, D]`` final-normed, updated cache).
    """
    b, t = tokens.shape
    m = cache["k"].shape[2]
    h = params["embed"][tokens]
    positions = cache_positions[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]  # [B, T]
    cos, sin = rope_cos_sin(
        positions,
        cfg.head_dim,
        rope_base=cfg.rope_base,
        scale_factor=cfg.scale_factor,
        low_freq_factor=cfg.rope_low_freq_factor,
        high_freq_factor=cfg.rope_high_freq_factor,
        original_max_seq_len=cfg.rope_original_max_seq_len,
    )

    kv_pos = jnp.arange(m, dtype=jnp.int32)[None, :]  # [1, M]
    # key j visible to query at abs position p iff j <= p
    visible = kv_pos[None, :, :] <= positions[:, :, None]  # [B, T, M]

    def scan_body(carry, xs):
        h, cache_k, cache_v = carry  # h: [B,T,D]; caches: [B,M,Hkv,Hd]
        layer = xs
        x = rms_norm(h, layer["attn_norm"], cfg.norm_eps)
        q = (x @ layer["wq"]).reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = (x @ layer["wk"]).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = (x @ layer["wv"]).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        # Scatter new k/v into the cache at [pos, pos+T) per row.
        t_idx = jnp.arange(t, dtype=jnp.int32)
        rows = jnp.arange(b, dtype=jnp.int32)[:, None]
        cols = cache_positions[:, None] + t_idx[None, :]
        cache_k = cache_k.at[rows, cols].set(k.astype(cache_k.dtype))
        cache_v = cache_v.at[rows, cols].set(v.astype(cache_v.dtype))

        # Attention over the full cache with visibility mask.
        n_rep = cfg.num_heads // cfg.num_kv_heads
        k_all = jnp.repeat(cache_k, n_rep, axis=2)  # [B, M, Hq, Hd]
        v_all = jnp.repeat(cache_v, n_rep, axis=2)
        scale = 1.0 / (cfg.head_dim**0.5)
        logits_qk = jnp.einsum("bthd,bmhd->bhtm", q, k_all.astype(q.dtype), preferred_element_type=jnp.float32)
        logits_qk = logits_qk * scale
        logits_qk = jnp.where(visible[:, None, :, :], logits_qk, -2.0e38)
        probs = jax.nn.softmax(logits_qk, axis=-1)
        attn = jnp.einsum("bhtm,bmhd->bthd", probs.astype(v_all.dtype), v_all)
        h = h + attn.reshape(b, t, cfg.num_heads * cfg.head_dim).astype(h.dtype) @ layer["wo"]

        x = rms_norm(h, layer["mlp_norm"], cfg.norm_eps)
        gate = jax.nn.silu(x @ layer["w_gate"])
        up = x @ layer["w_up"]
        h = h + (gate * up) @ layer["w_down"]
        return (h, None, None), (cache_k, cache_v)

    # scan over layers, carrying h; per-layer caches go through xs/ys
    def body(h, xs):
        layer, cache_k, cache_v = xs
        (h, _, _), (new_k, new_v) = scan_body((h, cache_k, cache_v), layer)
        return h, (new_k, new_v)

    h, (new_ks, new_vs) = jax.lax.scan(body, h, (params["layers"], cache["k"], cache["v"]))
    h = rms_norm(h, params["final_norm"], cfg.norm_eps)
    return h, {"k": new_ks, "v": new_vs}


# ----------------------------------------------------------------------------------
# Initialization (tests / from-scratch experiments)
# ----------------------------------------------------------------------------------


def init_params(cfg: ConfigLlama3_2, key: jax.Array, dtype=jnp.bfloat16) -> Params:
    """Random small-normal initialization (tests use this; training loads checkpoints)."""
    d, f, hd = cfg.embed_dim, cfg.intermediate_dim, cfg.head_dim
    hq, hkv, nl, v = cfg.num_heads, cfg.num_kv_heads, cfg.num_layers, cfg.vocab_size
    keys = jax.random.split(key, 9)

    def norm_init(k, shape, fan_in):
        return (jax.random.normal(k, shape, jnp.float32) * (fan_in**-0.5)).astype(dtype)

    return {
        "embed": norm_init(keys[0], (v, d), d),
        "layers": {
            "attn_norm": jnp.ones((nl, d), dtype),
            "wq": norm_init(keys[1], (nl, d, hq * hd), d),
            "wk": norm_init(keys[2], (nl, d, hkv * hd), d),
            "wv": norm_init(keys[3], (nl, d, hkv * hd), d),
            "wo": norm_init(keys[4], (nl, hq * hd, d), d),
            "mlp_norm": jnp.ones((nl, d), dtype),
            "w_gate": norm_init(keys[5], (nl, d, f), d),
            "w_up": norm_init(keys[6], (nl, d, f), d),
            "w_down": norm_init(keys[7], (nl, f, d), f),
        },
        "final_norm": jnp.ones((d,), dtype),
    }


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
