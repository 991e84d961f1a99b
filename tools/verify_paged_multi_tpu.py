"""Hardware parity: fused multi-token kernel vs scatter+gather reference, bf16 pools.

Validates paged_attention_pallas_multi's real-TPU DMA path (the interpret-mode
tests in tests/test_paged_decode.py validate the algorithm; this validates the
async-copy windows against the chip). PASSED v5e 2026-08-17: attn max abs diff
1.6e-2 (bf16), pools bitwise vs the scatter reference.

Run from the repo root:
PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_paged_multi_tpu.py
"""
import numpy as np, jax, jax.numpy as jnp
from ssi_tpu.generate.paged import paged_attention_multi
from ssi_tpu.generate.paged_pallas import WRITE_WIN, paged_attention_pallas_multi

rng = np.random.default_rng(3)
slots, ps, max_pages, hq, hkv, hd, t_q = 8, 32, 16, 32, 8, 64, 4
n_layers_rows = 2 * 64  # pool rows incl. trash region
n_pages = n_layers_rows - 1
kvd = hkv * hd
kp = jnp.asarray(rng.standard_normal((n_layers_rows, ps, kvd)), jnp.bfloat16)
vp = jnp.asarray(rng.standard_normal((n_layers_rows, ps, kvd)), jnp.bfloat16)
q = jnp.asarray(rng.standard_normal((slots, t_q, hq, hd)), jnp.bfloat16)
k_new = jnp.asarray(rng.standard_normal((slots, t_q, hkv, hd)), jnp.bfloat16)
v_new = jnp.asarray(rng.standard_normal((slots, t_q, hkv, hd)), jnp.bfloat16)
logical = np.stack([rng.choice(n_pages - 1, max_pages, replace=False) for _ in range(slots)]).astype(np.int32)
phys = jnp.asarray(logical)
hist = jnp.asarray(rng.integers(0, (max_pages - 1) * ps, slots), jnp.int32)
# include edge alignments
hist = hist.at[0].set(5).at[1].set(ps).at[2].set(2 * ps - 3).at[3].set(WRITE_WIN - 1)
active = jnp.asarray([True] * (slots - 1) + [False])
cap = jnp.full((slots,), max_pages * ps, jnp.int32)
trash = kp.shape[0] - 1

positions = hist[:, None] + jnp.arange(t_q)[None, :]
logical_ids = jnp.take_along_axis(jnp.asarray(logical), positions // ps, axis=1)
offs = positions % ps
rows_ref = jnp.where(active[:, None], logical_ids, trash)
kp_ref, vp_ref = kp, vp
for t in range(t_q):
    kp_ref = kp_ref.at[rows_ref[:, t], offs[:, t]].set(k_new[:, t].reshape(slots, -1))
    vp_ref = vp_ref.at[rows_ref[:, t], offs[:, t]].set(v_new[:, t].reshape(slots, -1))
ref = paged_attention_multi(q, kp_ref, vp_ref, phys, hist + 1)

g1 = (hist // WRITE_WIN) * WRITE_WIN
g2 = g1 + WRITE_WIN
l1 = jnp.take_along_axis(jnp.asarray(logical), jnp.clip(g1 // ps, 0, max_pages - 1)[:, None], 1)[:, 0]
l2 = jnp.take_along_axis(jnp.asarray(logical), jnp.clip(g2 // ps, 0, max_pages - 1)[:, None], 1)[:, 0]
row1 = jnp.where(jnp.logical_and(active, hist < cap), l1, trash)
row2 = jnp.where(jnp.logical_and(active, jnp.logical_and(g2 < cap, g2 <= hist + t_q - 1)), l2, trash)
got, kp_out, vp_out = paged_attention_pallas_multi(
    q, kp, vp, phys, hist, k_new=k_new, v_new=v_new, row_w1=row1, row_w2=row2)
jax.block_until_ready(got)
ga = np.asarray(got, np.float32)[:-1]
ra = np.asarray(ref, np.float32)[:-1]
print("attn max abs diff:", np.max(np.abs(ga - ra)))
np.testing.assert_allclose(ga, ra, rtol=3e-2, atol=3e-2)
np.testing.assert_array_equal(np.asarray(kp_out, np.float32)[:-1], np.asarray(kp_ref, np.float32)[:-1])
np.testing.assert_array_equal(np.asarray(vp_out, np.float32)[:-1], np.asarray(vp_ref, np.float32)[:-1])
print("HW PARITY OK")
