"""Rotary position embeddings with Llama-3 frequency scaling.

Uses the Hugging Face "rotate-half" convention so that HF-layout q/k projection
weights can be used directly — no permutation on checkpoint load/save (the reference
needs torchtune's hf_to_tune/tune_to_hf permutations because torchtune uses the
interleaved convention; ref: ssi/checkpoint.py:325,352).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _scaled_inv_freq(
    head_dim: int,
    rope_base: float,
    scale_factor: float,
    low_freq_factor: float,
    high_freq_factor: float,
    original_max_seq_len: int,
) -> tuple[float, ...]:
    """Llama-3 RoPE frequency scaling (NTK-by-parts)."""
    inv_freq = 1.0 / (rope_base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    if not scale_factor or scale_factor == 1:
        return tuple(inv_freq.tolist())
    low_freq_wavelen = original_max_seq_len / low_freq_factor
    high_freq_wavelen = original_max_seq_len / high_freq_factor
    scaled = []
    for f in inv_freq:
        wavelen = 2 * math.pi / f
        if wavelen < high_freq_wavelen:
            scaled.append(f)
        elif wavelen > low_freq_wavelen:
            scaled.append(f / scale_factor)
        else:
            smooth = (original_max_seq_len / wavelen - low_freq_factor) / (high_freq_factor - low_freq_factor)
            scaled.append((1 - smooth) * f / scale_factor + smooth * f)
    return tuple(scaled)


def rope_cos_sin(
    positions: jnp.ndarray,
    head_dim: int,
    rope_base: float = 500_000.0,
    scale_factor: float = 32.0,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    original_max_seq_len: int = 8192,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for the given positions.

    Args:
        positions: integer array of any shape ``[...]``.

    Returns:
        (cos, sin), each of shape ``[..., head_dim]`` (the half-frequencies are
        duplicated across the two halves, per the rotate-half convention).
    """
    inv_freq = jnp.asarray(
        _scaled_inv_freq(
            head_dim, float(rope_base), float(scale_factor), low_freq_factor, high_freq_factor, original_max_seq_len
        ),
        dtype=jnp.float32,
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., head_dim//2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [..., head_dim]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotate-half RoPE.

    Args:
        x: ``[..., S, n_heads, head_dim]``.
        cos/sin: ``[..., S, head_dim]`` (broadcast over the heads axis).
    """
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(x.dtype)
