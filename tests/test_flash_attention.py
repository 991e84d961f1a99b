"""Pallas flash attention vs XLA reference (fwd + grads), interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ssi_tpu.ops.attention import xla_attention
from ssi_tpu.ops.flash_attention import flash_attention


def make_qkv(b=2, s=256, hq=4, hkv=2, d=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), dtype)
    return q, k, v


def run_interpret(fn, *args, **kwargs):
    with pltpu.force_tpu_interpret_mode():
        return fn(*args, **kwargs)


@pytest.mark.parametrize("group_heads", [False, True])
@pytest.mark.parametrize("causal", [True, False])
def test_forward_matches_xla(causal, group_heads):
    q, k, v = make_qkv()
    ours = run_interpret(flash_attention, q, k, v, causal=causal, block_q=128, group_heads=group_heads)
    ref = xla_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_forward_gqa_and_mha():
    q, k, v = make_qkv(hq=8, hkv=2)
    ours = run_interpret(flash_attention, q, k, v, causal=True, block_q=128)
    ref = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)

    q2, k2, v2 = make_qkv(hq=4, hkv=4, seed=1)
    ours2 = run_interpret(flash_attention, q2, k2, v2, causal=True, block_q=128)
    ref2 = xla_attention(q2, k2, v2, causal=True)
    np.testing.assert_allclose(np.asarray(ours2), np.asarray(ref2), rtol=2e-5, atol=2e-5)


def test_segment_ids_masking():
    q, k, v = make_qkv(b=1, s=128)
    seg = jnp.concatenate([jnp.ones((1, 64), jnp.int32), jnp.full((1, 64), 2, jnp.int32)], axis=1)
    ours = run_interpret(flash_attention, q, k, v, causal=True, segment_ids=seg, block_q=64)
    ref = xla_attention(q, k, v, causal=True, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("group_heads", [False, True])
def test_gradients_match_xla(group_heads):
    q, k, v = make_qkv(b=1, s=128, hq=4, hkv=2)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(flash_attention(q, k, v, causal=True, block_q=64, group_heads=group_heads)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(xla_attention(q, k, v, causal=True)))

    g_ours = run_interpret(jax.grad(loss_flash, argnums=(0, 1, 2)), q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=f"grad d{name} mismatch"
        )


@pytest.mark.parametrize("group_heads", [False, True])
def test_gradients_with_segments_match_xla(group_heads):
    q, k, v = make_qkv(b=1, s=128, hq=4, hkv=2, seed=3)
    seg = jnp.concatenate([jnp.ones((1, 96), jnp.int32), jnp.full((1, 32), 2, jnp.int32)], axis=1)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(flash_attention(q, k, v, causal=True, segment_ids=seg, block_q=64, group_heads=group_heads)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(xla_attention(q, k, v, causal=True, segment_ids=seg)))

    g_ours = run_interpret(jax.grad(loss_flash, argnums=(0, 1, 2)), q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=f"grad d{name} mismatch"
        )


def test_rejects_bad_block():
    q, k, v = make_qkv(s=100)
    with pytest.raises(ValueError, match="multiple"):
        flash_attention(q, k, v, block_q=64)



def test_grouped_matches_ungrouped_exactly():
    # same kernels' math, different grid decomposition: grouped and per-head
    # variants must agree to float equality on identical inputs
    q, k, v = make_qkv(b=2, s=256, hq=8, hkv=2, seed=7)
    a = run_interpret(flash_attention, q, k, v, causal=True, block_q=64, group_heads=True)
    b = run_interpret(flash_attention, q, k, v, causal=True, block_q=64, group_heads=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)



def test_grouped_subtiled_block_q_long_s():
    """Forced grouping at a shape whose [n_rep*bq, S] planes exceed VMEM at the
    default bq: flash() sub-tiles (shrinks block_q) instead of failing, and the
    sub-tiled grouped output still equals the per-head path exactly."""
    from ssi_tpu.ops.flash_attention import _auto_group_heads, _grouped_block_q

    # the SFT shape's parameters: n_rep 4, S 2048, d 64 — default bq 256 doesn't fit
    assert not _auto_group_heads(4, 256, 2048, 64)
    assert _grouped_block_q(4, 256, 2048, 64) == 64

    # interpret-mode parity at a smaller long-S stand-in (same sub-tiling logic)
    q, k, v = make_qkv(b=1, s=512, hq=8, hkv=2, seed=11)
    grouped = run_interpret(flash_attention, q, k, v, causal=True, group_heads=True)
    per_head = run_interpret(flash_attention, q, k, v, causal=True, group_heads=False)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(per_head), rtol=1e-6, atol=1e-6)


def test_grouped_gradients_with_segments_match_xla():
    q, k, v = make_qkv(b=1, s=128, hq=4, hkv=2, seed=9)
    seg = jnp.concatenate([jnp.ones((1, 96), jnp.int32), jnp.full((1, 32), 2, jnp.int32)], axis=1)

    def loss_flash(q, k, v):
        return jnp.sum(
            jnp.square(flash_attention(q, k, v, causal=True, segment_ids=seg, block_q=64, group_heads=True))
        )

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(xla_attention(q, k, v, causal=True, segment_ids=seg)))

    g_ours = run_interpret(jax.grad(loss_flash, argnums=(0, 1, 2)), q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=f"grad d{name} mismatch"
        )


def test_grouped_mha_falls_back_to_per_head():
    # Hq == Hkv (no grouping possible): group_heads must be a no-op, not an error
    q, k, v = make_qkv(hq=4, hkv=4, seed=11)
    ours = run_interpret(flash_attention, q, k, v, causal=True, block_q=128, group_heads=True)
    ref = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-5, atol=2e-5)
