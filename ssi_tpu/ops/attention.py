"""Causal multi-head attention (GQA) for training.

Replaces the reference's reliance on torch SDPA/flex-attention inside torchtune
(ref: SURVEY.md §2.3 — torchtune model kernels). Two interchangeable backends:

- ``xla``: straightforward einsum attention with fp32 softmax. XLA on TPU fuses this
  into a flash-style kernel for moderate sequence lengths; it is also the CPU test path.
- ``pallas``: first-party Pallas TPU flash-attention kernel (see ops/flash_attention.py),
  used automatically on TPU for long sequences where it beats the XLA fusion.

All backends compute identical math: causal masking, GQA key/value head sharing,
softmax in fp32, output in the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -2.0e38


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B, S, Hkv, D] -> [B, S, Hkv * n_rep, D]."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(b, s, h * n_rep, d)


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    segment_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Reference attention in pure XLA.

    Args:
        q: ``[B, S, Hq, D]``.
        k, v: ``[B, S, Hkv, D]`` with ``Hq % Hkv == 0``.
        segment_ids: optional ``[B, S]`` int array; attention is restricted to equal
            segments (packed-sequence support). ``0`` may be used for padding.

    Returns:
        ``[B, S, Hq, D]`` in q's dtype.
    """
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    k = _repeat_kv(k, hq // hkv)
    v = _repeat_kv(v, hq // hkv)

    scale = 1.0 / (d**0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale

    mask = None
    if causal:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        mask = k_pos <= q_pos  # [S, S]
        mask = mask[None, None, :, :]
    if segment_ids is not None:
        seg_mask = (segment_ids[:, :, None] == segment_ids[:, None, :])[:, None, :, :]
        mask = seg_mask if mask is None else jnp.logical_and(mask, seg_mask)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


# Above this sequence length the [B, H, S, S] probability tensor and repeated K/V
# stop fitting comfortably; the Pallas flash kernel's O(S) memory wins. Below it,
# XLA's fused attention is measured faster on v5e (9.5 ms vs 46 ms fwd+bwd at
# B4/S768/32q/8kv — attention is overhead-dominated at short S).
AUTO_PALLAS_MIN_SEQ = 4096


def dispatch_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    segment_ids: jnp.ndarray | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Resolve and run the attention backend (shared by the model and the jitted API)."""
    if impl == "auto":
        impl = "pallas" if q.shape[1] >= AUTO_PALLAS_MIN_SEQ else "xla"
    if impl == "xla":
        return xla_attention(q, k, v, causal=causal, segment_ids=segment_ids)
    if impl in ("pallas", "pallas_grouped"):
        from ssi_tpu.ops.flash_attention import flash_attention

        # "pallas" auto-selects head grouping by VMEM fit; "pallas_grouped" forces it
        return flash_attention(
            q, k, v, causal=causal, segment_ids=segment_ids,
            group_heads=True if impl == "pallas_grouped" else None,
        )
    raise ValueError(f"Unknown attention impl: {impl!r}")


@functools.partial(jax.jit, static_argnames=("causal", "impl"))
def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    segment_ids: jnp.ndarray | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Jitted entry point over :func:`dispatch_attention`."""
    return dispatch_attention(q, k, v, causal=causal, segment_ids=segment_ids, impl=impl)
