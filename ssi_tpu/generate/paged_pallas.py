"""Pallas TPU paged-attention decode kernel.

The BASELINE north star names a "Pallas paged-attention batched decode loop" as
the vLLM replacement (ref: scripts/generate.py:112 relies on vLLM's CUDA paged
attention). This kernel computes single-token grouped-query attention directly
over the physical page pool:

- grid = (slots, page_groups). The **page table is a scalar-prefetch operand**,
  so each grid step's BlockSpec index_maps resolve up to PAGES_PER_STEP logical
  blocks to their physical pages and Mosaic DMAs them HBM->VMEM in parallel,
  double-buffered one grid step ahead.
- Per page, the kernel folds keys/values into flash-style running statistics
  (row max ``m``, normalizer ``l``, weighted accumulator ``acc``) held in VMEM
  scratch across grid steps — the gathered [slots, max_context] cache view is
  NEVER materialized in HBM, unlike the XLA gather path
  (`ssi_tpu.generate.paged.paged_attention`), which pays a full write+read of
  the gathered view per step (measured 41-59 ms/call at 32 slots x 1024 ctx on
  v5e; this kernel: ~0.1-0.3 ms inside a jitted scan).
- Pages are stored/DMA'd as ``[ps, Hkv*hd]`` 2D tiles (128-lane aligned; Mosaic
  rejects 64-lane DMA slices). Grouped-query attention runs as ONE MXU matmul
  per page via a block-diagonal trick: each q head's hd lanes sit at its kv
  head's stripe of a [Hq, Hkv*hd] matrix (zeros elsewhere, built OUTSIDE the
  kernel in XLA — integer iota/mod work is expensive on the VPU), so
  ``q2 @ page^T`` yields exactly the per-head logits. The PV product
  accumulates ``p @ page`` in [Hq, Hkv*hd] stripe space; the fold back to
  [Hq, hd] happens ONCE at finalize via the constant tiling matrix (Mosaic
  rejects 3D<->2D vector shape casts, so the fold is a matmul against a 0/1
  matrix — MXU time is negligible, the kernel is bandwidth/overhead-bound).
- Positions ``>= seq_lens[slot]`` are masked with -inf before the running-max
  update; page groups fully past the valid length skip compute via ``pl.when``
  and clamp their page index to the slot's page 0 (the DMA still runs — the
  price of a static grid — but transfer time is negligible next to step count).

Numerics: q/k/v are upcast to f32 inside the kernel; softmax statistics and the
accumulator are f32 — matching the gather path's f32 softmax to within reduction
order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30

PAGES_PER_STEP = 8


def _kernel(
    # scalar-prefetch operands (SMEM)
    page_table_ref,  # [slots, max_pages] int32
    seq_lens_ref,    # [slots] int32
    # array operands
    *refs,           # q2, stripe, tile_mat, k pages x n, v pages x n
    ps: int,
    hd: int,
    n_per_step: int,
):
    q2_ref = refs[0]       # [1, Hq, Hkv*hd] block-diagonal q (pre-scaled)
    stripe_ref = refs[1]   # [Hq, Hkv*hd] 0/1 f32
    tile_ref = refs[2]     # [hd, Hkv*hd] 0/1 f32
    k_refs = refs[3 : 3 + n_per_step]
    v_refs = refs[3 + n_per_step : 3 + 2 * n_per_step]
    out_ref = refs[3 + 2 * n_per_step]
    m_ref, l_ref, acc_ref = refs[4 + 2 * n_per_step :]

    b = pl.program_id(0)
    jt = pl.program_id(1)
    n_jt = pl.num_programs(1)
    seq_len = seq_lens_ref[b]
    hq = q2_ref.shape[1]

    @pl.when(jt == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q2 = q2_ref[0].astype(jnp.float32)  # [Hq, Hkv*hd]

    for i in range(n_per_step):
        page_start = (jt * n_per_step + i) * ps

        @pl.when(page_start < seq_len)
        def _compute(i=i, page_start=page_start):
            k = k_refs[i][0].astype(jnp.float32)  # [ps, Hkv*hd]
            v = v_refs[i][0].astype(jnp.float32)

            # [Hq, Hkv*hd] x [ps, Hkv*hd]^T -> [Hq, ps]; zero stripes kill
            # cross-head terms
            s = jax.lax.dot_general(
                q2, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            pos = page_start + jax.lax.broadcasted_iota(jnp.int32, (hq, ps), 1)
            s = jnp.where(pos < seq_len, s, NEG_INF)

            m_prev = m_ref[:, :1]
            l_prev = l_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)                 # [Hq, ps]
            l_ref[:, :1] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_ref[:, :1] = m_new
            # accumulate in stripe space; rows' off-stripe lanes carry garbage
            # that the finalize fold masks away
            acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
                p, v, preferred_element_type=jnp.float32
            )

    @pl.when(jt == n_jt - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        masked = acc_ref[:] * stripe_ref[:] / l    # [Hq, Hkv*hd]
        out = jax.lax.dot_general(
            masked, tile_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Hq, hd]
        out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_attention_pallas(
    q: jnp.ndarray,
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    page_table: jnp.ndarray,
    seq_lens: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-token GQA over a paged KV pool (Pallas TPU kernel).

    q: [slots, Hq, hd]; k_pool/v_pool: [n_pages, ps, Hkv, hd];
    page_table: [slots, max_pages] int32; seq_lens: [slots] valid lengths
    (including the just-written token, so every slot reads >= 1 page).
    Returns [slots, Hq, hd] in q.dtype.
    """
    n_slots, hq, hd = q.shape
    n_pages, ps, hkv, _ = k_pool.shape
    max_pages = page_table.shape[1]
    n_rep = hq // hkv
    kvd = hkv * hd
    n_per_step = min(PAGES_PER_STEP, max_pages)
    n_steps = pl.cdiv(max_pages, n_per_step)

    # Host/XLA-side constants + block-diagonal q (cheap einsum; integer mod work
    # is slow on the in-kernel VPU).
    heads = jnp.arange(hq, dtype=jnp.int32)
    onehot = (heads[:, None] // n_rep == jnp.arange(hkv, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    q2 = (q.astype(jnp.float32) * (hd ** -0.5))[:, :, None, :] * onehot[None, :, :, None]
    q2 = q2.reshape(n_slots, hq, kvd)
    stripe = jnp.repeat(onehot, hd, axis=1)  # [Hq, Hkv*hd]
    d = jnp.arange(hd, dtype=jnp.int32)
    tile_mat = (jnp.arange(kvd, dtype=jnp.int32)[None, :] % hd == d[:, None]).astype(jnp.float32)

    def page_index(i):
        # clamp past-the-table groups to the slot's first page (masked in-kernel)
        def index_map(b, jt, pt, sl, i=i):
            j = jt * n_per_step + i
            j = jnp.minimum(j, max_pages - 1)
            return (pt[b, j], 0, 0)

        return index_map

    k2 = k_pool.reshape(n_pages, ps, kvd)
    v2 = v_pool.reshape(n_pages, ps, kvd)

    in_specs = [
        pl.BlockSpec((1, hq, kvd), lambda b, jt, pt, sl: (b, 0, 0)),
        pl.BlockSpec((hq, kvd), lambda b, jt, pt, sl: (0, 0)),
        pl.BlockSpec((hd, kvd), lambda b, jt, pt, sl: (0, 0)),
    ]
    in_specs += [pl.BlockSpec((1, ps, kvd), page_index(i)) for i in range(n_per_step)]
    in_specs += [pl.BlockSpec((1, ps, kvd), page_index(i)) for i in range(n_per_step)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_slots, n_steps),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hq, hd), lambda b, jt, pt, sl: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, kvd), jnp.float32),
        ],
    )

    kernel = functools.partial(_kernel, ps=ps, hd=hd, n_per_step=n_per_step)
    args = [q2, stripe, tile_mat] + [k2] * n_per_step + [v2] * n_per_step
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slots, hq, hd), q.dtype),
        interpret=interpret,
    )(page_table.astype(jnp.int32), seq_lens.astype(jnp.int32), *args)
