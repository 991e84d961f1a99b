"""Pallas TPU paged-attention decode kernel (fused token-write + attend).

The BASELINE north star names a "Pallas paged-attention batched decode loop" as
the vLLM replacement (ref: scripts/generate.py:112 relies on vLLM's CUDA paged
attention). This kernel advances one decode token for every slot directly over
the flat physical page pool (all layers in one array — see
ssi_tpu/generate/paged.py for the layout argument).

Design (v3 — the measured path to speed-of-light at the serving shape):

- **The pool never leaves HBM, and never leaves its buffer.** k/v pools are
  ``memory_space=ANY`` operands aliased input->output; the kernel itself
  writes the incoming token's K/V (a ~1 KB VMEM->HBM DMA per slot) and reads
  history pages with its own DMAs. The two designs this replaces were each
  an order of magnitude off: an XLA-side scatter whose result feeds a custom
  call forces XLA to copy the full pool in AND out around the call (profiled
  at 97% of decode-chunk time — 4x ~340 MB copies per layer per token), and
  a BlockSpec-driven grid of (slots x pages) paid ~1 us of grid machinery per
  128 KB page.
- grid = (slots,). Each grid step handles one slot: an in-kernel ``fori_loop``
  walks ONLY the slot's valid history pages (the invalid tail is never
  fetched — at ragged serving lengths this also cuts KV bandwidth),
  double-buffering page DMAs (start page i+1, wait page i, fold page i). The
  page table, lengths, and write positions are scalar-prefetch operands
  (SMEM), so DMA indices are data-dependent.
- **The incoming token folds from registers**: its logit/value contribution is
  added to the flash statistics directly, so the kernel never reads the cell
  it just wrote — there is no read-after-write ordering between the token
  write and the page reads (the write only has to land before the NEXT
  decode step, guaranteed by the trailing wait).
- Per page, keys/values fold into flash-style running statistics (row max
  ``m``, normalizer ``l``, accumulator ``acc``) in VMEM scratch — the
  gathered [slots, max_context] view is never materialized.
- Pages are stored/DMA'd as ``[ps, Hkv*hd]`` 2D tiles (128-lane aligned;
  Mosaic rejects 64-lane DMA slices). Grouped-query attention runs as ONE MXU
  matmul per page via a block-diagonal trick: each q head's hd lanes sit at
  its kv head's stripe of a [Hq, Hkv*hd] matrix (zeros elsewhere, built
  OUTSIDE the kernel in XLA — integer iota/mod work is expensive on the
  VPU), so ``q2 @ page^T`` yields exactly the per-head logits. The PV product
  accumulates in [Hq, Hkv*hd] stripe space; the fold back to [Hq, hd]
  happens ONCE at finalize via a constant 0/1 tiling matrix (Mosaic rejects
  3D<->2D vector shape casts).
- ``interpret=True`` (CPU parity tests) switches to whole-array VMEM refs
  with plain loads/stores and an explicit pool copy-through: the interpreter
  neither seeds aliased output buffers nor supports read-modify-write DMA
  into untouched ANY outputs.

Numerics: q/k/v are upcast to f32 inside the kernel; softmax statistics and the
accumulator are f32 — matching the gather path's f32 softmax to within reduction
order (parity: tests/test_paged_decode.py::test_pallas_kernel_parity_interpret).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30

N_BUFFERS = 2

# token-write RMW window: DMA slices along the in-page dim must be 8-aligned
WRITE_WIN = 8


def _kernel(
    # scalar-prefetch operands (SMEM)
    page_table_ref,  # [slots, max_pages] int32 (physical rows)
    seq_lens_ref,    # [slots] int32 — INCLUDING the incoming token
    write_rows_ref,  # [slots] int32 physical row for the incoming token (trash if inactive)
    write_offs_ref,  # [slots] int32 in-page offset for the incoming token
    # array operands
    q2_ref,          # [1, Hq, Hkv*hd] VMEM — this slot's block-diagonal q
    stripe_ref,      # [Hq, Hkv*hd] 0/1 f32 VMEM
    tile_ref,        # [hd, Hkv*hd] 0/1 f32 VMEM
    knew_ref,        # [1, 1, Hkv*hd] VMEM — this slot's new K (pool dtype)
    vnew_ref,        # [1, 1, Hkv*hd] VMEM
    k_hbm,           # [rows, ps, Hkv*hd] ANY (interpret: whole-array VMEM)
    v_hbm,
    out_ref,         # [1, Hq, hd] VMEM
    k_out,           # ANY — same buffer as k_hbm via input_output_aliases
    v_out,           #       (interpret: separate whole-array VMEM ref)
    # scratch
    kbuf, vbuf,      # [N_BUFFERS, ps, Hkv*hd] VMEM
    wbuf_k, wbuf_v,  # [WRITE_WIN, Hkv*hd] VMEM — aligned window for the token RMW
    m_ref, l_ref, acc_ref,
    sems,            # DMA semaphores [2, N_BUFFERS]
    wsems,           # DMA semaphores [2] for the token write
    *,
    ps: int,
    hd: int,
    interpret: bool,
):
    b = pl.program_id(0)
    seq_len = seq_lens_ref[b]          # INCLUDING the incoming token
    hist_len = seq_len - 1             # tokens already resident in pages
    n_valid = (hist_len + ps - 1) // ps
    hq = q2_ref.shape[1]
    row = write_rows_ref[b]
    off = write_offs_ref[b]

    if interpret:
        # plain-refs mode: copy the carried pools through, then store the token
        @pl.when(b == 0)
        def _carry_pool():
            k_out[...] = k_hbm[...]
            v_out[...] = v_hbm[...]

        k_out[row, pl.ds(off, 1)] = knew_ref[0]
        v_out[row, pl.ds(off, 1)] = vnew_ref[0]
    else:
        # DMA slices along the in-page (sublane) dim must be 8-row aligned
        # (Mosaic HBM memref tiling), so the 1-row token write is a
        # read-modify-write of the aligned 8-row window: fetch it, overwrite
        # our row in VMEM, write it back. Neighbor rows are either earlier
        # tokens (stable — written by earlier decode steps) or not-yet-valid
        # cells, so writing back what was read is a no-op. The shared trash
        # page can be RMW-raced by inactive slots; its content is garbage by
        # definition.
        win = (off // WRITE_WIN) * WRITE_WIN
        rk = pltpu.make_async_copy(k_hbm.at[row, pl.ds(win, WRITE_WIN)], wbuf_k, wsems.at[0])
        rv = pltpu.make_async_copy(v_hbm.at[row, pl.ds(win, WRITE_WIN)], wbuf_v, wsems.at[1])
        rk.start()
        rv.start()
        rk.wait()
        rv.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (WRITE_WIN, knew_ref.shape[2]), 0)
        sel = lane == (off - win)
        wbuf_k[:] = jnp.where(sel, knew_ref[0], wbuf_k[:])
        wbuf_v[:] = jnp.where(sel, vnew_ref[0], wbuf_v[:])
        wk = pltpu.make_async_copy(wbuf_k, k_out.at[row, pl.ds(win, WRITE_WIN)], wsems.at[0])
        wv = pltpu.make_async_copy(wbuf_v, v_out.at[row, pl.ds(win, WRITE_WIN)], wsems.at[1])
        wk.start()
        wv.start()

    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    q2 = q2_ref[0].astype(jnp.float32)  # [Hq, Hkv*hd]

    def fold_page(i, k, v):
        # k/v: [ps, Hkv*hd] f32. Zero stripes in q2 kill cross-head terms.
        s = jax.lax.dot_general(q2, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        pos = i * ps + jax.lax.broadcasted_iota(jnp.int32, (hq, ps), 1)
        s = jnp.where(pos < hist_len, s, NEG_INF)  # the incoming token folds from registers
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)              # [Hq, ps]
        l_ref[:, :1] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, :1] = m_new
        # accumulate in stripe space; rows' off-stripe lanes carry garbage
        # that the finalize fold masks away
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)

    if interpret:
        def body(i, _):
            page = page_table_ref[b, i]
            fold_page(i, k_out[page].astype(jnp.float32), v_out[page].astype(jnp.float32))
            return 0

        jax.lax.fori_loop(0, n_valid, body, 0)
    else:
        def dma_k(i, slot):
            return pltpu.make_async_copy(k_hbm.at[page_table_ref[b, i]], kbuf.at[slot], sems.at[0, slot])

        def dma_v(i, slot):
            return pltpu.make_async_copy(v_hbm.at[page_table_ref[b, i]], vbuf.at[slot], sems.at[1, slot])

        @pl.when(n_valid > 0)
        def _warmup():
            dma_k(0, 0).start()
            dma_v(0, 0).start()

        def body(i, _):
            slot = jax.lax.rem(i, N_BUFFERS)

            @pl.when(i + 1 < n_valid)
            def _prefetch():
                nxt = jax.lax.rem(i + 1, N_BUFFERS)
                dma_k(i + 1, nxt).start()
                dma_v(i + 1, nxt).start()

            dma_k(i, slot).wait()
            dma_v(i, slot).wait()
            fold_page(i, kbuf[slot].astype(jnp.float32), vbuf[slot].astype(jnp.float32))
            return 0

        jax.lax.fori_loop(0, n_valid, body, 0)

    # fold the incoming token (always attended — it is position seq_len-1)
    kn = knew_ref[0].astype(jnp.float32)    # [1, Hkv*hd]
    vn = vnew_ref[0].astype(jnp.float32)
    s_cur = jax.lax.dot_general(q2, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)  # [Hq, 1]
    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, s_cur)
    alpha = jnp.exp(m_prev - m_new)
    p_cur = jnp.exp(s_cur - m_new)          # [Hq, 1]
    l_fin = l_ref[:, :1] * alpha + p_cur
    acc_fin = acc_ref[:] * alpha + p_cur * vn  # [Hq, 1] * [1, kvd]

    l = jnp.maximum(l_fin, 1e-30)
    masked = acc_fin * stripe_ref[:] / l         # [Hq, Hkv*hd]
    out = jax.lax.dot_general(
        masked, tile_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Hq, hd]
    out_ref[0] = out.astype(out_ref.dtype)

    if not interpret:
        wk.wait()
        wv.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_attention_pallas(
    q: jnp.ndarray,
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    page_table: jnp.ndarray,
    seq_lens: jnp.ndarray,
    *,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    write_rows: jnp.ndarray,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused write-token + single-token GQA over the paged KV pool.

    q: [slots, Hq, hd]; k_pool/v_pool: [rows, ps, Hkv*hd] — the FLAT pool
    (all layers, head-flattened), aliased input->output so it never leaves
    its buffer;
    page_table: [slots, max_pages] int32 PHYSICAL rows (the caller applies
    the layer offset — see paged.decode_step_tokens); seq_lens: [slots]
    valid lengths INCLUDING the incoming token; k_new/v_new: [slots, Hkv, hd]
    the incoming token's K/V (written at ``write_rows`` / offset
    ``(seq_lens-1) % ps`` — point inactive slots' write_rows at the trash
    row). Returns (attn [slots, Hq, hd], k_pool, v_pool).
    """
    n_slots, hq, hd = q.shape
    n_rows, ps, kvd = k_pool.shape
    hkv = kvd // hd
    n_rep = hq // hkv
    if ps % WRITE_WIN != 0:
        # The token write is an 8-row RMW window (Mosaic sublane alignment); a
        # page smaller than / not divisible by the window would DMA past the
        # page's sublane extent silently on the TPU path.
        raise ValueError(f"page_size ({ps}) must be a multiple of {WRITE_WIN}")

    # Host/XLA-side constants + block-diagonal q (cheap einsum; integer mod work
    # is slow on the in-kernel VPU).
    heads = jnp.arange(hq, dtype=jnp.int32)
    onehot = (heads[:, None] // n_rep == jnp.arange(hkv, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    q2 = (q.astype(jnp.float32) * (hd ** -0.5))[:, :, None, :] * onehot[None, :, :, None]
    q2 = q2.reshape(n_slots, hq, kvd)
    stripe = jnp.repeat(onehot, hd, axis=1)  # [Hq, Hkv*hd]
    d = jnp.arange(hd, dtype=jnp.int32)
    tile_mat = (jnp.arange(kvd, dtype=jnp.int32)[None, :] % hd == d[:, None]).astype(jnp.float32)

    k2 = k_pool  # already [rows, ps, kvd] — no reshape may sit between the
    v2 = v_pool  # scan carry and the custom call (it materializes a copy)
    kn = k_new.astype(k_pool.dtype).reshape(n_slots, 1, kvd)
    vn = v_new.astype(v_pool.dtype).reshape(n_slots, 1, kvd)
    write_offs = (seq_lens - 1) % ps

    if interpret:
        pool_in_spec = pl.BlockSpec((n_rows, ps, kvd), lambda b, *_: (0, 0, 0))
        pool_out_spec = pl.BlockSpec((n_rows, ps, kvd), lambda b, *_: (0, 0, 0))
        aliases = {}
    else:
        pool_in_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        pool_out_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        # keys index the flat positional inputs (scalar-prefetch included):
        # inputs 9/10 are k2/v2; outputs 1/2 are the aliased pools.
        aliases = {9: 1, 10: 2}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_slots,),
        in_specs=[
            pl.BlockSpec((1, hq, kvd), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((hq, kvd), lambda b, *_: (0, 0)),
            pl.BlockSpec((hd, kvd), lambda b, *_: (0, 0)),
            pl.BlockSpec((1, 1, kvd), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, kvd), lambda b, *_: (b, 0, 0)),
            pool_in_spec,
            pool_in_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, hq, hd), lambda b, *_: (b, 0, 0)),
            pool_out_spec,
            pool_out_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((N_BUFFERS, ps, kvd), k_pool.dtype),
            pltpu.VMEM((N_BUFFERS, ps, kvd), v_pool.dtype),
            pltpu.VMEM((WRITE_WIN, kvd), k_pool.dtype),
            pltpu.VMEM((WRITE_WIN, kvd), v_pool.dtype),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, kvd), jnp.float32),
            pltpu.SemaphoreType.DMA((2, N_BUFFERS)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(_kernel, ps=ps, hd=hd, interpret=interpret)
    attn, k_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_slots, hq, hd), q.dtype),
            jax.ShapeDtypeStruct(k2.shape, k2.dtype),
            jax.ShapeDtypeStruct(v2.shape, v2.dtype),
        ],
        input_output_aliases=aliases,
        interpret=interpret,
    )(
        page_table.astype(jnp.int32), seq_lens.astype(jnp.int32),
        write_rows.astype(jnp.int32), write_offs.astype(jnp.int32),
        q2, stripe, tile_mat, kn, vn, k2, v2,
    )
    return attn, k_out, v_out
