"""Pallas TPU fused cross-entropy over the tied embedding (fwd + custom VJP).

The XLA-based chunked CE (ops/cross_entropy.py) already avoids the full [N, V]
logits tensor, but its backward materializes per-chunk fp32 dlogits in HBM and
streams a [V, D] fp32 gradient accumulator through a scan (~26 GB of HBM traffic
per step at the 1B/133k-vocab CPT shape; measured ~42% MFU). These kernels keep
both in VMEM:

- **forward**: grid (token blocks, vocab blocks) streaming online logsumexp —
  scratch [T, 1] running max / sum-exp; logits blocks live only in VMEM. The
  picked-label logit is computed outside via a row gather (cheap, exact).
- **backward dh**: same grid; dh block accumulates in VMEM scratch across vocab
  blocks; dlogits blocks ([T, Vb] fp32) never touch HBM.
- **backward dE**: transposed grid (vocab blocks, token blocks); dE block
  accumulates in VMEM fp32 and writes back once per vocab block.

Vocab is padded to a multiple of the block inside the op (padded columns are
masked to -inf); token count pads with ignore-labels. Gradients are exact
(verified against the XLA implementation and a naive reference in tests).

Measured on v5e at the 1B CPT shape (N=12288, D=2048, V=133258, bf16):
fwd 67 ms (XLA chunked: 72), fwd+bwd 242 ms (XLA: 247) — parity. Both backward
passes are compute-bound (~78% MFU over the 4 unavoidable [N,D]x[D,V]-class
matmuls); the VMEM-residency win is offset by the double logits recompute
(dh and dE kernels each recompute, where the XLA scan shares one recompute but
pays dlogits HBM traffic). The XLA implementation therefore remains the default;
this kernel is the drop-in alternative and the base for future fusion work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssi_tpu.constants import CROSS_ENTROPY_IGNORE_IDX

TOKEN_BLOCK = 512
VOCAB_BLOCK = 2048
_NEG_INF = -1.0e30


from ssi_tpu.utils import round_up as _round_up

# ----------------------------------------------------------------------------------
# Forward: streaming logsumexp
# ----------------------------------------------------------------------------------


def _lse_kernel(h_ref, e_ref, lse_ref, m_scr, l_scr, *, vocab_size, vocab_block):
    vi = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(vi == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)

    h = h_ref[...]  # [T, D]
    e = e_ref[...]  # [Vb, D]
    logits = jax.lax.dot_general(
        h, e, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [T, Vb]
    # mask padded vocab columns
    col = vi * vocab_block + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < vocab_size, logits, _NEG_INF)

    m_prev = m_scr[...]  # [T, 1]
    m_blk = jnp.max(logits, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_blk)
    l_scr[...] = l_scr[...] * jnp.exp(m_prev - m_new) + jnp.sum(jnp.exp(logits - m_new), axis=1, keepdims=True)
    m_scr[...] = m_new

    @pl.when(vi == nv - 1)
    def _():
        lse_ref[...] = m_scr[...] + jnp.log(jnp.maximum(l_scr[...], 1e-30))


def _compute_lse(h, embed, vocab_size, token_block, vocab_block):
    n, d = h.shape
    v_pad = embed.shape[0]
    grid = (n // token_block, v_pad // vocab_block)
    return pl.pallas_call(
        functools.partial(_lse_kernel, vocab_size=vocab_size, vocab_block=vocab_block),
        grid=grid,
        in_specs=[
            pl.BlockSpec((token_block, d), lambda ti, vi: (ti, 0)),
            pl.BlockSpec((vocab_block, d), lambda ti, vi: (vi, 0)),
        ],
        out_specs=pl.BlockSpec((token_block, 1), lambda ti, vi: (ti, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((token_block, 1), jnp.float32),
            pltpu.VMEM((token_block, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(h, embed)


# ----------------------------------------------------------------------------------
# Backward: dh (token-major) and dE (vocab-major)
# ----------------------------------------------------------------------------------


def _dh_kernel(h_ref, e_ref, lse_ref, lab_ref, g_ref, dh_ref, acc, *, vocab_size, vocab_block):
    vi = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(vi == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    h = h_ref[...]
    e = e_ref[...]
    logits = jax.lax.dot_general(h, e, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    col = vi * vocab_block + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < vocab_size, logits, _NEG_INF)

    lab = lab_ref[...]  # [T, 1] int32
    valid = (lab != CROSS_ENTROPY_IGNORE_IDX).astype(jnp.float32)  # [T, 1]
    p = jnp.exp(logits - lse_ref[...])  # [T, Vb]
    onehot = (col == lab).astype(jnp.float32)
    dlogits = (p - onehot) * valid * g_ref[0, 0]  # [T, Vb] f32, never leaves VMEM

    acc[...] += jax.lax.dot_general(
        dlogits.astype(e.dtype), e, dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(vi == nv - 1)
    def _():
        dh_ref[...] = acc[...].astype(dh_ref.dtype)


def _de_kernel(h_ref, e_ref, lse_ref, lab_ref, g_ref, de_ref, acc, *, vocab_size, vocab_block):
    vi = pl.program_id(0)
    ti = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(ti == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    h = h_ref[...]  # [T, D]
    e = e_ref[...]  # [Vb, D]
    logits = jax.lax.dot_general(h, e, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    col = vi * vocab_block + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < vocab_size, logits, _NEG_INF)

    lab = lab_ref[...]
    valid = (lab != CROSS_ENTROPY_IGNORE_IDX).astype(jnp.float32)
    p = jnp.exp(logits - lse_ref[...])
    onehot = (col == lab).astype(jnp.float32)
    dlogits = (p - onehot) * valid * g_ref[0, 0]  # [T, Vb]

    acc[...] += jax.lax.dot_general(
        dlogits.astype(h.dtype), h, dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Vb, D]

    @pl.when(ti == nt - 1)
    def _():
        de_ref[...] = acc[...].astype(de_ref.dtype)


# ----------------------------------------------------------------------------------
# Public op
# ----------------------------------------------------------------------------------


def _prepare(hidden, embed, labels, token_block, vocab_block):
    n, d = hidden.shape
    v = embed.shape[0]
    n_pad = _round_up(n, token_block)
    v_pad = _round_up(v, vocab_block)
    if n_pad != n:
        hidden = jnp.pad(hidden, ((0, n_pad - n), (0, 0)))
        labels = jnp.pad(labels, (0, n_pad - n), constant_values=CROSS_ENTROPY_IGNORE_IDX)
    if v_pad != v:
        embed = jnp.pad(embed, ((0, v_pad - v), (0, 0)))
    return hidden, embed, labels, n, v


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_cross_entropy_pallas(
    hidden: jnp.ndarray,
    embed: jnp.ndarray,
    labels: jnp.ndarray,
    token_block: int = TOKEN_BLOCK,
    vocab_block: int = VOCAB_BLOCK,
) -> jnp.ndarray:
    """Sum of NLL over non-ignored labels; tied-embedding logits; Pallas kernels.

    Args:
        hidden: ``[N, D]`` final hidden states (bf16/f32).
        embed: ``[V, D]`` tied embedding matrix.
        labels: ``[N]`` int32; ``-100`` ignored.
    """
    loss, _ = _forward(hidden, embed, labels, token_block, vocab_block)
    return loss


def _forward(hidden, embed, labels, token_block, vocab_block):
    h, e, lab, n, v = _prepare(hidden, embed, labels, token_block, vocab_block)
    lse = _compute_lse(h, e, v, token_block, vocab_block)  # [Npad, 1]
    valid = lab != CROSS_ENTROPY_IGNORE_IDX
    safe = jnp.where(valid, lab, 0)
    # picked logit via row gather (N x D reads; exact, f32 accumulation)
    picked = jnp.sum(h.astype(jnp.float32) * e[safe].astype(jnp.float32), axis=-1)
    nll = jnp.where(valid, lse[:, 0] - picked, 0.0)
    return jnp.sum(nll), lse


def _fwd_rule(hidden, embed, labels, token_block, vocab_block):
    loss, lse = _forward(hidden, embed, labels, token_block, vocab_block)
    return loss, (hidden, embed, labels, lse)


def _bwd_rule(token_block, vocab_block, residuals, g):
    hidden, embed, labels, lse = residuals
    h, e, lab, n, v = _prepare(hidden, embed, labels, token_block, vocab_block)
    n_pad, d = h.shape
    v_pad = e.shape[0]
    lab2 = lab[:, None].astype(jnp.int32)
    g_arr = jnp.full((1, 1), g, jnp.float32)

    dh = pl.pallas_call(
        functools.partial(_dh_kernel, vocab_size=v, vocab_block=vocab_block),
        grid=(n_pad // token_block, v_pad // vocab_block),
        in_specs=[
            pl.BlockSpec((token_block, d), lambda ti, vi: (ti, 0)),
            pl.BlockSpec((vocab_block, d), lambda ti, vi: (vi, 0)),
            pl.BlockSpec((token_block, 1), lambda ti, vi: (ti, 0)),
            pl.BlockSpec((token_block, 1), lambda ti, vi: (ti, 0)),
            pl.BlockSpec((1, 1), lambda ti, vi: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((token_block, d), lambda ti, vi: (ti, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), hidden.dtype),
        scratch_shapes=[pltpu.VMEM((token_block, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(h, e, lse, lab2, g_arr)

    de = pl.pallas_call(
        functools.partial(_de_kernel, vocab_size=v, vocab_block=vocab_block),
        grid=(v_pad // vocab_block, n_pad // token_block),
        in_specs=[
            pl.BlockSpec((token_block, d), lambda vi, ti: (ti, 0)),
            pl.BlockSpec((vocab_block, d), lambda vi, ti: (vi, 0)),
            pl.BlockSpec((token_block, 1), lambda vi, ti: (ti, 0)),
            pl.BlockSpec((token_block, 1), lambda vi, ti: (ti, 0)),
            pl.BlockSpec((1, 1), lambda vi, ti: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((vocab_block, d), lambda vi, ti: (vi, 0)),
        out_shape=jax.ShapeDtypeStruct((v_pad, d), embed.dtype),
        scratch_shapes=[pltpu.VMEM((vocab_block, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(h, e, lse, lab2, g_arr)

    return dh[: hidden.shape[0]], de[: embed.shape[0]], None


fused_cross_entropy_pallas.defvjp(_fwd_rule, _bwd_rule)
