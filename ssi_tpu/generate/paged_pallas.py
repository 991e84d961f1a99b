"""Pallas TPU paged-attention decode kernel.

The BASELINE north star names a "Pallas paged-attention batched decode loop" as
the vLLM replacement (ref: scripts/generate.py:112 relies on vLLM's CUDA paged
attention). This kernel computes single-token grouped-query attention directly
over the physical page pool:

- grid = (slots, max_pages / PAGES_PER_STEP). The **page table is a
  scalar-prefetch operand**, so each grid step's BlockSpec index_maps resolve
  PAGES_PER_STEP logical blocks to their physical pages and Mosaic DMAs them
  HBM->VMEM in parallel, double-buffered one grid step ahead. Grid-step overhead
  (~2.5 us on v5e) dominates this kernel — single-page steps measured 1.25 ms
  per call at 32 slots x 16 pages; batching 8 pages per step cuts the step count
  8x. A manual per-slot DMA pipeline was measured SLOWER (2.0 ms): its DMA
  latency chain serializes per slot, while the grid pipeline overlaps across the
  whole (slot, page-group) sequence.
- Per page, the kernel folds keys/values into flash-style running statistics
  (row max ``m``, normalizer ``l``, weighted accumulator ``acc``) held in VMEM
  scratch across grid steps — the gathered [slots, max_context] cache view is
  NEVER materialized in HBM, unlike the XLA gather path
  (`ssi_tpu.generate.paged.paged_attention`), which pays a full write+read of
  the gathered view per step (measured 41-59 ms/call at the same shape).
- Pages are stored/DMA'd as ``[ps, Hkv*hd]`` 2D tiles (128-lane aligned; Mosaic
  rejects 64-lane DMA slices). Grouped-query attention runs as ONE MXU matmul
  per page via a block-diagonal trick: each q head's hd lanes are placed at its
  kv head's stripe of a [Hq, Hkv*hd] matrix (zeros elsewhere), so
  ``q2 @ page^T`` yields exactly the per-head logits; the PV product computes
  ``p @ page`` into [Hq, Hkv*hd] and folds each row's stripe back to [Hq, hd]
  with the tiling matrix (Mosaic also rejects 3D<->2D vector shape casts, so
  both tricks are matmuls against small 0/1 constant matrices — MXU time is
  negligible, the kernel is bandwidth/overhead-bound).
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
    # array operands: q then PAGES_PER_STEP k pages then PAGES_PER_STEP v pages
    *refs,
    ps: int,
    n_rep: int,
    n_per_step: int,
):
    q_ref = refs[0]
    k_refs = refs[1 : 1 + n_per_step]
    v_refs = refs[1 + n_per_step : 1 + 2 * n_per_step]
    out_ref = refs[1 + 2 * n_per_step]
    m_ref, l_ref, acc_ref = refs[2 + 2 * n_per_step :]

    b = pl.program_id(0)
    jt = pl.program_id(1)
    n_jt = pl.num_programs(1)
    seq_len = seq_lens_ref[b]
    hq, hd = q_ref.shape[1], q_ref.shape[2]
    hkv = k_refs[0].shape[2] // hd
    kvd = hkv * hd

    @pl.when(jt == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Block-diagonal q (built per step; tiny VPU/MXU cost).
    q = q_ref[0].astype(jnp.float32) * (hd ** -0.5)           # [Hq, hd]
    # T[d, c] = 1 iff c % hd == d  ->  (q @ T)[h, c] = q[h, c % hd]
    t_rows = jax.lax.broadcasted_iota(jnp.int32, (hd, kvd), 0)
    t_cols = jax.lax.broadcasted_iota(jnp.int32, (hd, kvd), 1)
    tile_mat = (t_cols % hd == t_rows).astype(jnp.float32)    # [hd, Hkv*hd]
    row_kv = jax.lax.broadcasted_iota(jnp.int32, (hq, kvd), 0) // n_rep
    lane_kv = jax.lax.broadcasted_iota(jnp.int32, (hq, kvd), 1) // hd
    stripe = (lane_kv == row_kv).astype(jnp.float32)          # [Hq, Hkv*hd]
    q2 = jnp.dot(q, tile_mat, preferred_element_type=jnp.float32) * stripe

    for i in range(n_per_step):
        page_start = (jt * n_per_step + i) * ps

        @pl.when(page_start < seq_len)
        def _compute(i=i, page_start=page_start):
            k = k_refs[i][0].astype(jnp.float32)  # [ps, Hkv*hd]
            v = v_refs[i][0].astype(jnp.float32)

            s = jax.lax.dot_general(
                q2, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [Hq, ps]
            pos = page_start + jax.lax.broadcasted_iota(jnp.int32, (hq, ps), 1)
            s = jnp.where(pos < seq_len, s, NEG_INF)

            m_prev = m_ref[:, :1]
            l_prev = l_ref[:, :1]
            m_cur = jnp.max(s, axis=1, keepdims=True)  # [Hq, 1]
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)                     # [Hq, ps]
            l_ref[:, :1] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            m_ref[:, :1] = m_new

            pv_all = jnp.dot(p, v, preferred_element_type=jnp.float32) * stripe
            pv = jax.lax.dot_general(
                pv_all, tile_mat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [Hq, hd]
            acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(jt == n_jt - 1)
    def _finalize():
        l = l_ref[:, :1]
        out_ref[0] = (acc_ref[:] / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


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

    def page_index(i):
        # clamp past-the-table groups to the slot's first page (masked in-kernel)
        def index_map(b, jt, pt, sl, i=i):
            j = jt * n_per_step + i
            j = jnp.minimum(j, max_pages - 1)
            return (pt[b, j], 0, 0)

        return index_map

    k2 = k_pool.reshape(n_pages, ps, kvd)
    v2 = v_pool.reshape(n_pages, ps, kvd)

    in_specs = [pl.BlockSpec((1, hq, hd), lambda b, jt, pt, sl: (b, 0, 0))]
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
            pltpu.VMEM((hq, hd), jnp.float32),
        ],
    )

    kernel = functools.partial(_kernel, ps=ps, n_rep=n_rep, n_per_step=n_per_step)
    args = [q] + [k2] * n_per_step + [v2] * n_per_step
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slots, hq, hd), q.dtype),
        interpret=interpret,
    )(page_table.astype(jnp.int32), seq_lens.astype(jnp.int32), *args)
