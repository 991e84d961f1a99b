"""Pallas fused CE vs the XLA chunked implementation (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ssi_tpu.constants import CROSS_ENTROPY_IGNORE_IDX
from ssi_tpu.ops.cross_entropy import fused_cross_entropy
from ssi_tpu.ops.cross_entropy_pallas import fused_cross_entropy_pallas


def make_inputs(n=100, v=300, d=64, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    e = jnp.asarray(rng.standard_normal((v, d)), jnp.float32)
    y = jnp.asarray(rng.integers(0, v, n), jnp.int32).at[::7].set(CROSS_ENTROPY_IGNORE_IDX)
    return h, e, y


def test_forward_matches_xla_chunked():
    h, e, y = make_inputs()
    with pltpu.force_tpu_interpret_mode():
        ours = fused_cross_entropy_pallas(h, e, y, 32, 128)
    ref = fused_cross_entropy(h, e, y, 64)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_gradients_match_xla_chunked():
    h, e, y = make_inputs(n=64, v=257, d=32, seed=1)  # odd vocab exercises padding
    with pltpu.force_tpu_interpret_mode():
        g_ours = jax.grad(lambda h, e: fused_cross_entropy_pallas(h, e, y, 32, 128), argnums=(0, 1))(h, e)
    g_ref = jax.grad(lambda h, e: fused_cross_entropy(h, e, y, 64), argnums=(0, 1))(h, e)
    np.testing.assert_allclose(np.asarray(g_ours[0]), np.asarray(g_ref[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_ours[1]), np.asarray(g_ref[1]), rtol=1e-4, atol=1e-5)


def test_all_ignored():
    h, e, _ = make_inputs(n=32, v=128, d=32)
    y = jnp.full((32,), CROSS_ENTROPY_IGNORE_IDX, jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        loss = fused_cross_entropy_pallas(h, e, y, 32, 128)
        g = jax.grad(lambda h: fused_cross_entropy_pallas(h, e, y, 32, 128))(h)
    assert float(loss) == 0.0
    np.testing.assert_array_equal(np.asarray(g), 0.0)
