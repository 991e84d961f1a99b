"""Fused, chunked cross-entropy over the extended (133k-row) vocabulary.

TPU-native analog of the reference's ``CEWithChunkedOutputLoss`` (ref:
ssi/trainer.py:300-304, ssi/loss.py:17-19): the loss is computed from hidden states
and the tied embedding matrix in token chunks, so the full ``[N, V]`` fp32 logits
tensor is never materialized. A custom VJP recomputes each chunk's logits in the
backward pass (rematerialization), trading FLOPs for HBM exactly like the chunked
torch implementation trades chunked upcasts for memory.

The forward/backward matmuls are large, static-shape contractions that XLA maps
straight onto the MXU; the chunk loop is a ``lax.scan`` (compiled once).

Semantics: ``sum`` of token NLLs over labels != ignore_index, plus the count of
non-ignored tokens. Mean-per-token loss = sum / count, matching the reference's
per-token normalization (ref: ssi/trainer.py:391-404).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ssi_tpu.constants import CROSS_ENTROPY_IGNORE_IDX

DEFAULT_CHUNK = 1024


def _pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int, pad_value) -> jnp.ndarray:
    size = x.shape[axis]
    rem = size % multiple
    if rem == 0:
        return x
    pad = multiple - rem
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, pad)
    return jnp.pad(x, pad_widths, constant_values=pad_value)


def _chunk_losses(h_chunk: jnp.ndarray, embed: jnp.ndarray, labels_chunk: jnp.ndarray):
    """Per-token NLL for one chunk. h_chunk: [C, D]; embed: [V, D]; labels: [C]."""
    logits = jnp.dot(h_chunk, embed.T, preferred_element_type=jnp.float32)  # [C, V] f32
    valid = labels_chunk != CROSS_ENTROPY_IGNORE_IDX
    safe_labels = jnp.where(valid, labels_chunk, 0)
    lse = jax.nn.logsumexp(logits, axis=-1)  # [C]
    picked = jnp.take_along_axis(logits, safe_labels[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, lse - picked, 0.0)
    return nll, valid


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_cross_entropy(
    hidden: jnp.ndarray,
    embed: jnp.ndarray,
    labels: jnp.ndarray,
    chunk_size: int = DEFAULT_CHUNK,
) -> jnp.ndarray:
    """Sum of cross-entropy losses with tied-embedding output projection.

    Args:
        hidden: ``[N, D]`` final hidden states (bf16 or f32).
        embed: ``[V, D]`` tied embedding matrix.
        labels: ``[N]`` int32 targets; ``-100`` entries are ignored.
        chunk_size: tokens per chunk (static).

    Returns:
        Scalar f32: sum of NLL over non-ignored tokens.
    """
    loss, _ = _forward(hidden, embed, labels, chunk_size)
    return loss


def _forward(hidden, embed, labels, chunk_size):
    n = hidden.shape[0]
    h = _pad_to_multiple(hidden, chunk_size, 0, 0)
    y = _pad_to_multiple(labels, chunk_size, 0, CROSS_ENTROPY_IGNORE_IDX)
    n_chunks = h.shape[0] // chunk_size
    h = h.reshape(n_chunks, chunk_size, -1)
    y = y.reshape(n_chunks, chunk_size)

    def body(carry, xs):
        h_c, y_c = xs
        nll, valid = _chunk_losses(h_c, embed, y_c)
        return carry + jnp.sum(nll), None

    total, _ = jax.lax.scan(body, jnp.float32(0.0), (h, y))
    return total, n


def _fwd(hidden, embed, labels, chunk_size):
    loss, _ = _forward(hidden, embed, labels, chunk_size)
    return loss, (hidden, embed, labels)


def _bwd(chunk_size, residuals, g):
    hidden, embed, labels = residuals
    n, d = hidden.shape
    h = _pad_to_multiple(hidden, chunk_size, 0, 0)
    y = _pad_to_multiple(labels, chunk_size, 0, CROSS_ENTROPY_IGNORE_IDX)
    n_chunks = h.shape[0] // chunk_size
    h_chunks = h.reshape(n_chunks, chunk_size, d)
    y_chunks = y.reshape(n_chunks, chunk_size)

    def chunk_grads(h_c, y_c):
        logits = jnp.dot(h_c, embed.T, preferred_element_type=jnp.float32)  # [C, V]
        valid = y_c != CROSS_ENTROPY_IGNORE_IDX
        safe_labels = jnp.where(valid, y_c, 0)
        probs = jax.nn.softmax(logits, axis=-1)
        # one-hot subtraction via iota compare: fuses as elementwise into the
        # softmax, where a scatter (.at[].add) lowered to flatten/scatter-add
        # copies over the full f32 [C, V] block (profiled at ~140 ms/step,
        # round 3) — and likewise contract over C with dot_general instead of
        # materializing dlogits.T.
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        one_hot_grad = probs - (col == safe_labels[:, None]).astype(jnp.float32)
        dlogits = jnp.where(valid[:, None], one_hot_grad, 0.0) * g  # [C, V] f32
        dlogits = dlogits.astype(embed.dtype)
        dh_c = jnp.dot(dlogits, embed, preferred_element_type=jnp.float32)
        d_embed_c = jax.lax.dot_general(
            dlogits, h_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [V, D]
        return d_embed_c, dh_c

    if n_chunks == 1:
        # no accumulator round-trip over the 1.1 GB f32 [V, D] buffer
        d_embed, dh = chunk_grads(h_chunks[0], y_chunks[0])
        dh = dh[None]
    else:
        def body(d_embed_acc, xs):
            d_embed_c, dh_c = chunk_grads(*xs)
            return d_embed_acc + d_embed_c, dh_c

        d_embed, dh = jax.lax.scan(body, jnp.zeros(embed.shape, jnp.float32), (h_chunks, y_chunks))
    dh = dh.reshape(-1, d)[:n].astype(hidden.dtype)
    return dh, d_embed.astype(embed.dtype), None


fused_cross_entropy.defvjp(_fwd, _bwd)


def cross_entropy_sum_and_count(
    hidden: jnp.ndarray,
    embed: jnp.ndarray,
    labels: jnp.ndarray,
    chunk_size: int = DEFAULT_CHUNK,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience wrapper returning (sum NLL, non-ignored token count)."""
    loss = fused_cross_entropy(hidden, embed, labels, chunk_size)
    count = jnp.sum(labels != CROSS_ENTROPY_IGNORE_IDX)
    return loss, count
