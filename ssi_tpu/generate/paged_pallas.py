"""Pallas TPU paged-attention decode kernel (fused token-write + attend).

The BASELINE north star names a "Pallas paged-attention batched decode loop" as
the vLLM replacement (ref: scripts/generate.py:112 relies on vLLM's CUDA paged
attention). This kernel advances one decode token for every slot directly over
the flat physical page pool (all layers in one array — see
ssi_tpu/generate/paged.py for the layout argument).

Design (v4 — flat-buffer single-pass softmax; measured path to the HBM
bandwidth bound at the serving shape):

- **The pool never leaves HBM, and never leaves its buffer.** k/v pools are
  ``memory_space=ANY`` operands aliased input->output; the kernel itself
  writes the incoming token's K/V (a ~1 KB VMEM->HBM DMA per slot) and reads
  history pages with its own DMAs. The two designs this replaces were each
  an order of magnitude off: an XLA-side scatter whose result feeds a custom
  call forces XLA to copy the full pool in AND out around the call (profiled
  at 97% of decode-chunk time — 4x ~340 MB copies per layer per token), and
  a BlockSpec-driven grid of (slots x pages) paid ~1 us of grid machinery per
  128 KB page.
- grid = (slots,). Each slot's valid history pages are DMA'd into ONE flat
  contiguous VMEM buffer ([max_pages*ps, Hkv*hd]), then attention runs as a
  SINGLE exact softmax: one q2@K^T dot over the whole buffer, one masked exp
  pass, one P@V dot. The v3 kernel folded page-by-page with online-softmax
  rescaling; its loop-carried m/l/acc dependency chain (not DMA latency —
  deeper prefetch measured flat) kept it at ~2x the bandwidth bound.
  Invalid-tail positions are masked to -inf before the max, so buffer lanes
  beyond ``hist_len`` (stale data from earlier slots) never contribute.
- **Cross-slot double buffering**: while slot b computes from buffer b%2,
  slot b+1's page DMAs (issued by program b — the page table is a
  scalar-prefetch operand, so any slot's pages are addressable from any
  program) stream into buffer (b+1)%2. Grid steps execute sequentially on
  the core, so this pipelines DMA behind compute exactly. When the flat
  buffers would exceed the VMEM budget (long max_context), the kernel drops
  to a single buffer (own-slot DMAs issued at program entry) — contexts long
  enough to break THAT (> ~4k tokens/slot) cannot fit the HBM pool at
  serving slot counts anyway.
- **The incoming token folds from registers**: its logit/value contribution
  joins the single softmax directly, so the kernel never reads the cell it
  just wrote — there is no read-after-write ordering between the token write
  and the page reads (the write only has to land before the NEXT decode
  step, guaranteed by the trailing wait).
- Pages are stored/DMA'd as ``[ps, Hkv*hd]`` 2D tiles (128-lane aligned;
  Mosaic rejects 64-lane DMA slices). Grouped-query attention runs as ONE MXU
  matmul via a block-diagonal trick: each q head's hd lanes sit at its kv
  head's stripe of a [Hq, Hkv*hd] matrix (zeros elsewhere, built OUTSIDE the
  kernel in XLA — integer iota/mod work is expensive on the VPU), so
  ``q2 @ K^T`` yields exactly the per-head logits. The PV product
  accumulates in [Hq, Hkv*hd] stripe space; the fold back to [Hq, hd]
  happens ONCE at finalize via a constant 0/1 tiling matrix (Mosaic rejects
  3D<->2D vector shape casts).
- ``interpret=True`` (CPU parity tests) switches to whole-array VMEM refs
  with plain loads/stores and an explicit pool copy-through: the interpreter
  neither seeds aliased output buffers nor supports read-modify-write DMA
  into untouched ANY outputs.

Numerics: matmul operands are bf16 (pool dtype) with f32 accumulation — the
same MXU discipline as the training flash kernels (an f32xf32 dot runs the MXU
at 1/4 rate); the softmax statistics are f32. The interpret path keeps full-f32
operands to stay bit-comparable with the gather reference
(parity: tests/test_paged_decode.py::test_pallas_kernel_parity_interpret).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30

# token-write RMW window: DMA slices along the in-page dim must be 8-aligned
WRITE_WIN = 8

# VMEM budget for the flat page buffers (k + v, all ring buffers together);
# above it the cross-slot double buffer degrades to a single buffer
_FLAT_VMEM_BUDGET = 8 * 1024 * 1024


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
    # scratch (TPU path only carries the flat ring + RMW window)
    kbuf, vbuf,      # [n_buf, max_pages*ps, Hkv*hd] VMEM flat page buffers
    wbuf_k, wbuf_v,  # [WRITE_WIN, Hkv*hd] VMEM — aligned window for the token RMW
    sems,            # DMA semaphores [2, n_buf, max_pages]
    wsems,           # DMA semaphores [2] for the token write
    *,
    ps: int,
    hd: int,
    interpret: bool,
):
    b = pl.program_id(0)
    n_slots = pl.num_programs(0)
    seq_len = seq_lens_ref[b]          # INCLUDING the incoming token
    hist_len = seq_len - 1             # tokens already resident in pages
    n_valid = (hist_len + ps - 1) // ps
    hq = q2_ref.shape[1]
    row = write_rows_ref[b]
    off = write_offs_ref[b]

    # ---- token write + history fetch ---------------------------------------------
    if interpret:
        # plain-refs mode: copy the carried pools through, then store the token
        @pl.when(b == 0)
        def _carry_pool():
            k_out[...] = k_hbm[...]
            v_out[...] = v_hbm[...]

        k_out[row, pl.ds(off, 1)] = knew_ref[0]
        v_out[row, pl.ds(off, 1)] = vnew_ref[0]
    else:
        n_buf = kbuf.shape[0]
        cur = jax.lax.rem(b, n_buf)

        def issue_slot(s, buf):
            """Start page DMAs for slot ``s`` into ring buffer ``buf``."""
            nv = (seq_lens_ref[s] - 1 + ps - 1) // ps

            def go(i, _):
                page = page_table_ref[s, i]
                pltpu.make_async_copy(
                    k_hbm.at[page], kbuf.at[buf, pl.ds(i * ps, ps)], sems.at[0, buf, i]
                ).start()
                pltpu.make_async_copy(
                    v_hbm.at[page], vbuf.at[buf, pl.ds(i * ps, ps)], sems.at[1, buf, i]
                ).start()
                return 0

            jax.lax.fori_loop(0, nv, go, 0)

        @pl.when(b == 0)
        def _first():
            # stale ring lanes are masked before the softmax max, but masked
            # P lanes still multiply V lanes in the MXU — 0 * NaN would poison
            # the accumulator, so the very first program clears the
            # (uninitialized) ring once; afterwards stale lanes are earlier
            # slots' finite reals
            kbuf[...] = jnp.zeros_like(kbuf)
            vbuf[...] = jnp.zeros_like(vbuf)
            issue_slot(0, 0)

        # token-write RMW reads start now; the modify/write-back happens after
        # the attention dots so the read latency hides behind real work. DMA
        # slices along the in-page (sublane) dim must be 8-row aligned (Mosaic
        # HBM memref tiling), so the 1-row token write is a read-modify-write
        # of the aligned 8-row window. Neighbor rows are earlier tokens
        # (stable) or not-yet-valid cells, so writing back what was read is a
        # no-op; the shared trash page can be RMW-raced by inactive slots —
        # its content is garbage by definition.
        win = (off // WRITE_WIN) * WRITE_WIN
        rk = pltpu.make_async_copy(k_hbm.at[row, pl.ds(win, WRITE_WIN)], wbuf_k, wsems.at[0])
        rv = pltpu.make_async_copy(v_hbm.at[row, pl.ds(win, WRITE_WIN)], wbuf_v, wsems.at[1])
        rk.start()
        rv.start()

        if n_buf > 1:
            # cross-slot pipelining: put the NEXT slot's pages in flight
            # before waiting on our own
            @pl.when(b + 1 < n_slots)
            def _prefetch_next():
                issue_slot(b + 1, jax.lax.rem(b + 1, n_buf))
        else:
            # single-buffer mode (long max_context): no cross-slot overlap —
            # every program issues its OWN pages at entry (slot 0's were issued
            # by _first; without this, b >= 1 would wait on never-started DMAs).
            @pl.when(b > 0)
            def _issue_own():
                issue_slot(b, cur)

        def wait_one(i, _):
            sems_wait_k = pltpu.make_async_copy(
                k_hbm.at[page_table_ref[b, i]], kbuf.at[cur, pl.ds(i * ps, ps)], sems.at[0, cur, i]
            )
            sems_wait_v = pltpu.make_async_copy(
                v_hbm.at[page_table_ref[b, i]], vbuf.at[cur, pl.ds(i * ps, ps)], sems.at[1, cur, i]
            )
            sems_wait_k.wait()
            sems_wait_v.wait()
            return 0

        jax.lax.fori_loop(0, n_valid, wait_one, 0)

    # ---- single-pass exact softmax over the flat buffer --------------------------
    if interpret:
        # online fold per page (value-carried, full f32 — matches the gather
        # reference bit-for-bit up to reduction order)
        q2 = q2_ref[0].astype(jnp.float32)
        m0 = jnp.full((hq, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((hq, 1), jnp.float32)
        a0 = jnp.zeros((hq, q2.shape[1]), jnp.float32)

        def body(i, carry):
            m_prev, l_prev, acc = carry
            page = page_table_ref[b, i]
            k = k_out[page].astype(jnp.float32)
            v = v_out[page].astype(jnp.float32)
            s = jax.lax.dot_general(q2, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            pos = i * ps + jax.lax.broadcasted_iota(jnp.int32, (hq, ps), 1)
            s = jnp.where(pos < hist_len, s, NEG_INF)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
            return m_new, l_new, acc

        m_hist, l_hist, acc = jax.lax.fori_loop(0, n_valid, body, (m0, l0, a0))

        kn = knew_ref[0].astype(jnp.float32)
        vn = vnew_ref[0].astype(jnp.float32)
        s_cur = jax.lax.dot_general(q2, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        m_fin = jnp.maximum(m_hist, s_cur)
        alpha = jnp.exp(m_hist - m_fin)
        p_cur = jnp.exp(s_cur - m_fin)
        l_fin = l_hist * alpha + p_cur
        acc_fin = acc * alpha + p_cur * vn
    else:
        q2 = q2_ref[0].astype(k_hbm.dtype)  # bf16 MXU operands, f32 accumulation
        k_flat = kbuf[cur]                  # [T, kvd] pool dtype
        v_flat = vbuf[cur]
        t = k_flat.shape[0]
        s = jax.lax.dot_general(
            q2, k_flat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Hq, T]
        pos = jax.lax.broadcasted_iota(jnp.int32, (hq, t), 1)
        s = jnp.where(pos < hist_len, s, NEG_INF)

        kn = knew_ref[0].astype(jnp.float32)    # [1, kvd]
        vn = vnew_ref[0].astype(jnp.float32)
        # VPU multiply-reduce: an N=1 bf16 dot trips a Mosaic broadcast
        # verification bug, and [32, 512] elementwise work is trivial anyway
        s_cur = jnp.sum(q2.astype(jnp.float32) * kn, axis=1, keepdims=True)  # [Hq, 1]

        m_fin = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_cur)  # [Hq, 1]
        p = jnp.exp(s - m_fin)                  # [Hq, T]; masked lanes exp(-1e30)=0
        p_cur = jnp.exp(s_cur - m_fin)          # [Hq, 1]
        l_fin = jnp.sum(p, axis=1, keepdims=True) + p_cur
        acc_fin = jax.lax.dot_general(
            p.astype(v_flat.dtype), v_flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + p_cur * vn

    # ---- token-write RMW tail (starts before the output fold so the write
    # latency overlaps the remaining compute) -------------------------------------
    if not interpret:
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
    max_pages = page_table.shape[1]
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

    # flat ring sizing: double-buffer (cross-slot DMA/compute overlap) inside
    # the VMEM budget, single otherwise (see module docstring)
    flat_tokens = max_pages * ps
    per_buf_bytes = 2 * flat_tokens * kvd * k_pool.dtype.itemsize  # k + v
    n_buf = 2 if 2 * per_buf_bytes <= _FLAT_VMEM_BUDGET else 1
    if n_buf * per_buf_bytes > 2 * _FLAT_VMEM_BUDGET:
        raise ValueError(
            f"max_context ({flat_tokens} tokens/slot) exceeds the flat-buffer VMEM "
            f"budget; shrink max_context or page the kernel"
        )

    if interpret:
        pool_in_spec = pl.BlockSpec((n_rows, ps, kvd), lambda b, *_: (0, 0, 0))
        pool_out_spec = pl.BlockSpec((n_rows, ps, kvd), lambda b, *_: (0, 0, 0))
        aliases = {}
    else:
        pool_in_spec = pl.BlockSpec(memory_space=pl.ANY)
        pool_out_spec = pl.BlockSpec(memory_space=pl.ANY)
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
            pltpu.VMEM((n_buf, flat_tokens, kvd), k_pool.dtype),
            pltpu.VMEM((n_buf, flat_tokens, kvd), v_pool.dtype),
            pltpu.VMEM((WRITE_WIN, kvd), k_pool.dtype),
            pltpu.VMEM((WRITE_WIN, kvd), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2, n_buf, max_pages)),
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


# --- multi-token verification kernel (speculative decoding) ----------------------
#
# Advances T = speculate_k + 1 candidate tokens per slot in one call: the
# history pages are DMA'd once and attended by ALL T tokens (T*Hq q rows feed
# the MXU far better than the single-token kernel's Hq), and the T in-flight
# tokens attend each other from registers under a causal bias — pages are only
# ever READ for positions < hist_len, so there is no same-call RAW hazard.
#
# Token persistence: the T tokens occupy CONSECUTIVE positions
# [hist_len, hist_len + T); with T <= WRITE_WIN and ps % WRITE_WIN == 0 the
# span covers at most TWO aligned 8-row windows (a page boundary is itself
# 8-aligned), so the write is at most two RMW window DMAs per pool. The caller
# precomputes each window's physical row (trash = skip: window unused, slot
# inactive, or window start beyond the slot's write cap — a beyond-cap token
# inside a LIVE window lands harmlessly in its own provisioned page's never-
# read tail).


def _kernel_multi(
    # scalar-prefetch operands (SMEM)
    page_table_ref,  # [slots, max_pages] int32 physical rows
    hist_lens_ref,   # [slots] int32 — tokens resident in pages BEFORE this step
    row1_ref,        # [slots] int32 physical row of write window 1 (trash = skip)
    row2_ref,        # [slots] int32 physical row of write window 2 (trash = skip)
    # array operands
    q2_ref,          # [1, T*Hq, Hkv*hd] VMEM — block-diagonal q, t-major rows
    stripe_ref,      # [T*Hq, Hkv*hd] 0/1 f32
    tile_ref,        # [hd, Hkv*hd] 0/1 f32
    bias_ref,        # [T*Hq, T] f32 additive causal bias for the register block
    knew_ref,        # [1, T, Hkv*hd] VMEM — the T tokens' K (pool dtype)
    vnew_ref,
    k_hbm,           # [rows, ps, Hkv*hd] ANY (interpret: whole-array VMEM)
    v_hbm,
    out_ref,         # [1, T*Hq, hd] VMEM
    k_out,
    v_out,
    # scratch (TPU path)
    kbuf, vbuf,      # [n_buf, max_pages*ps, Hkv*hd] VMEM flat page buffers
    wbuf_k, wbuf_v,  # [2, WRITE_WIN, Hkv*hd] VMEM — two RMW windows
    sems,            # DMA semaphores [2, n_buf, max_pages]
    wsems,           # DMA semaphores [2, 2] — (k/v, window)
    *,
    ps: int,
    hd: int,
    interpret: bool,
):
    b = pl.program_id(0)
    n_slots = pl.num_programs(0)
    hist_len = hist_lens_ref[b]
    n_valid = (hist_len + ps - 1) // ps
    th = q2_ref.shape[1]
    t_q = knew_ref.shape[1]
    trash = k_hbm.shape[0] - 1
    row1 = row1_ref[b]
    row2 = row2_ref[b]
    # window geometry: d_t = in-span lane of token t relative to window 1
    off1 = ((hist_len % ps) // WRITE_WIN) * WRITE_WIN
    base_lane = hist_len % WRITE_WIN  # == hist_len%ps - off1
    # window 2 wraps to the next page's row 0 when window 1 is the page's last;
    # written with the * WRITE_WIN outermost so Mosaic can prove 8-alignment
    off2 = (((hist_len % ps) // WRITE_WIN + 1) % (ps // WRITE_WIN)) * WRITE_WIN

    if interpret:
        @pl.when(b == 0)
        def _carry_pool():
            k_out[...] = k_hbm[...]
            v_out[...] = v_hbm[...]

        for t in range(t_q):
            d_t = base_lane + t

            @pl.when(jnp.logical_and(d_t < WRITE_WIN, row1 != trash))
            def _w1():
                k_out[row1, pl.ds(off1 + d_t, 1)] = knew_ref[0, pl.ds(t, 1)]
                v_out[row1, pl.ds(off1 + d_t, 1)] = vnew_ref[0, pl.ds(t, 1)]

            @pl.when(jnp.logical_and(d_t >= WRITE_WIN, row2 != trash))
            def _w2():
                k_out[row2, pl.ds(off2 + d_t - WRITE_WIN, 1)] = knew_ref[0, pl.ds(t, 1)]
                v_out[row2, pl.ds(off2 + d_t - WRITE_WIN, 1)] = vnew_ref[0, pl.ds(t, 1)]
    else:
        n_buf = kbuf.shape[0]
        cur = jax.lax.rem(b, n_buf)

        def issue_slot(s, buf):
            nv = (hist_lens_ref[s] + ps - 1) // ps

            def go(i, _):
                page = page_table_ref[s, i]
                pltpu.make_async_copy(
                    k_hbm.at[page], kbuf.at[buf, pl.ds(i * ps, ps)], sems.at[0, buf, i]
                ).start()
                pltpu.make_async_copy(
                    v_hbm.at[page], vbuf.at[buf, pl.ds(i * ps, ps)], sems.at[1, buf, i]
                ).start()
                return 0

            jax.lax.fori_loop(0, nv, go, 0)

        @pl.when(b == 0)
        def _first():
            kbuf[...] = jnp.zeros_like(kbuf)  # see single-token kernel: NaN guard
            vbuf[...] = jnp.zeros_like(vbuf)
            issue_slot(0, 0)

        # start both windows' RMW reads now; modify/write-back after the dots
        rk1 = pltpu.make_async_copy(k_hbm.at[row1, pl.ds(off1, WRITE_WIN)], wbuf_k.at[0], wsems.at[0, 0])
        rv1 = pltpu.make_async_copy(v_hbm.at[row1, pl.ds(off1, WRITE_WIN)], wbuf_v.at[0], wsems.at[1, 0])
        rk2 = pltpu.make_async_copy(k_hbm.at[row2, pl.ds(off2, WRITE_WIN)], wbuf_k.at[1], wsems.at[0, 1])
        rv2 = pltpu.make_async_copy(v_hbm.at[row2, pl.ds(off2, WRITE_WIN)], wbuf_v.at[1], wsems.at[1, 1])
        rk1.start()
        rv1.start()

        @pl.when(row2 != trash)
        def _r2():
            rk2.start()
            rv2.start()

        if n_buf > 1:
            @pl.when(b + 1 < n_slots)
            def _prefetch_next():
                issue_slot(b + 1, jax.lax.rem(b + 1, n_buf))
        else:
            # single-buffer fallback: issue own pages (see single-token kernel)
            @pl.when(b > 0)
            def _issue_own():
                issue_slot(b, cur)

        def wait_one(i, _):
            pltpu.make_async_copy(
                k_hbm.at[page_table_ref[b, i]], kbuf.at[cur, pl.ds(i * ps, ps)], sems.at[0, cur, i]
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[page_table_ref[b, i]], vbuf.at[cur, pl.ds(i * ps, ps)], sems.at[1, cur, i]
            ).wait()
            return 0

        jax.lax.fori_loop(0, n_valid, wait_one, 0)

    # ---- exact softmax: flat history buffer + in-flight register block ----------
    if interpret:
        q2 = q2_ref[0].astype(jnp.float32)
        m0 = jnp.full((th, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((th, 1), jnp.float32)
        a0 = jnp.zeros((th, q2.shape[1]), jnp.float32)

        def body(i, carry):
            m_prev, l_prev, acc = carry
            page = page_table_ref[b, i]
            k = k_out[page].astype(jnp.float32)
            v = v_out[page].astype(jnp.float32)
            s = jax.lax.dot_general(q2, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            pos = i * ps + jax.lax.broadcasted_iota(jnp.int32, (th, ps), 1)
            s = jnp.where(pos < hist_len, s, NEG_INF)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
            return m_new, l_new, acc

        m_hist, l_hist, acc = jax.lax.fori_loop(0, n_valid, body, (m0, l0, a0))

        kn = knew_ref[0].astype(jnp.float32)  # [T, kvd]
        vn = vnew_ref[0].astype(jnp.float32)
        s_new = jax.lax.dot_general(q2, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s_new = s_new + bias_ref[:]
        m_fin = jnp.maximum(m_hist, jnp.max(s_new, axis=1, keepdims=True))
        alpha = jnp.exp(m_hist - m_fin)
        p_new = jnp.exp(s_new - m_fin)
        l_fin = l_hist * alpha + jnp.sum(p_new, axis=1, keepdims=True)
        acc_fin = acc * alpha + jnp.dot(p_new, vn, preferred_element_type=jnp.float32)
    else:
        q2 = q2_ref[0].astype(k_hbm.dtype)  # bf16 MXU operands, f32 accumulation
        k_flat = kbuf[cur]
        v_flat = vbuf[cur]
        t_flat = k_flat.shape[0]
        s = jax.lax.dot_general(
            q2, k_flat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [TH, T_flat]
        pos = jax.lax.broadcasted_iota(jnp.int32, (th, t_flat), 1)
        s = jnp.where(pos < hist_len, s, NEG_INF)

        kn = knew_ref[0]  # [T, kvd] pool dtype; T >= 2 so a real MXU dot is safe
        vn = vnew_ref[0]
        s_new = jax.lax.dot_general(
            q2, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + bias_ref[:]  # [TH, T]

        m_fin = jnp.maximum(
            jnp.max(s, axis=1, keepdims=True), jnp.max(s_new, axis=1, keepdims=True)
        )
        p = jnp.exp(s - m_fin)
        p_new = jnp.exp(s_new - m_fin)
        l_fin = jnp.sum(p, axis=1, keepdims=True) + jnp.sum(p_new, axis=1, keepdims=True)
        acc_fin = jax.lax.dot_general(
            p.astype(v_flat.dtype), v_flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            p_new.astype(vn.dtype), vn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- token-write RMW tail ----------------------------------------------------
    if not interpret:
        rk1.wait()
        rv1.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (WRITE_WIN, knew_ref.shape[2]), 0)
        for t in range(t_q):
            d_t = base_lane + t  # scalar; lane==d_t has no match when d_t >= 8
            wbuf_k[0] = jnp.where(lane == d_t, knew_ref[0, t], wbuf_k[0])
            wbuf_v[0] = jnp.where(lane == d_t, vnew_ref[0, t], wbuf_v[0])
        wk1 = pltpu.make_async_copy(wbuf_k.at[0], k_out.at[row1, pl.ds(off1, WRITE_WIN)], wsems.at[0, 0])
        wv1 = pltpu.make_async_copy(wbuf_v.at[0], v_out.at[row1, pl.ds(off1, WRITE_WIN)], wsems.at[1, 0])
        wk1.start()
        wv1.start()

        @pl.when(row2 != trash)
        def _w2():
            rk2.wait()
            rv2.wait()
            for t in range(t_q):
                d_t = base_lane + t - WRITE_WIN  # lane==d_t: no match when d_t < 0
                wbuf_k[1] = jnp.where(lane == d_t, knew_ref[0, t], wbuf_k[1])
                wbuf_v[1] = jnp.where(lane == d_t, vnew_ref[0, t], wbuf_v[1])
            pltpu.make_async_copy(wbuf_k.at[1], k_out.at[row2, pl.ds(off2, WRITE_WIN)], wsems.at[0, 1]).start()
            pltpu.make_async_copy(wbuf_v.at[1], v_out.at[row2, pl.ds(off2, WRITE_WIN)], wsems.at[1, 1]).start()

    l = jnp.maximum(l_fin, 1e-30)
    masked = acc_fin * stripe_ref[:] / l  # [TH, Hkv*hd]
    out = jax.lax.dot_general(
        masked, tile_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [TH, hd]
    out_ref[0] = out.astype(out_ref.dtype)

    if not interpret:
        wk1.wait()
        wv1.wait()

        @pl.when(row2 != trash)
        def _w2_wait():
            pltpu.make_async_copy(wbuf_k.at[1], k_out.at[row2, pl.ds(off2, WRITE_WIN)], wsems.at[0, 1]).wait()
            pltpu.make_async_copy(wbuf_v.at[1], v_out.at[row2, pl.ds(off2, WRITE_WIN)], wsems.at[1, 1]).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_attention_pallas_multi(
    q: jnp.ndarray,
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    page_table: jnp.ndarray,
    hist_lens: jnp.ndarray,
    *,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    row_w1: jnp.ndarray,
    row_w2: jnp.ndarray,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused T-token write + verification GQA over the paged KV pool.

    q: [slots, T, Hq, hd] post-RoPE draft queries (token t at position
    ``hist_lens + t``); hist_lens: [slots] tokens resident in pages BEFORE this
    step; k_new/v_new: [slots, T, Hkv, hd]; row_w1/row_w2: [slots] physical
    rows of the (at most two) aligned 8-row write windows covering positions
    [hist_lens, hist_lens+T) — point unused/inactive windows at the trash row
    to skip their write. Token t attends history + drafts 0..t (causal in the
    register block). Returns (attn [slots, T, Hq, hd], k_pool, v_pool).
    """
    n_slots, t_q, hq, hd = q.shape
    n_rows, ps, kvd = k_pool.shape
    hkv = kvd // hd
    n_rep = hq // hkv
    max_pages = page_table.shape[1]
    th = t_q * hq
    if ps % WRITE_WIN != 0:
        raise ValueError(f"page_size ({ps}) must be a multiple of {WRITE_WIN}")
    if t_q > WRITE_WIN:
        raise ValueError(f"T ({t_q}) must be <= {WRITE_WIN} (two-window write design)")
    if t_q < 2:
        raise ValueError("T must be >= 2 (use paged_attention_pallas for T == 1)")

    heads = jnp.arange(hq, dtype=jnp.int32)
    onehot = (heads[:, None] // n_rep == jnp.arange(hkv, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    q2 = (q.astype(jnp.float32) * (hd ** -0.5))[:, :, :, None, :] * onehot[None, None, :, :, None]
    q2 = q2.reshape(n_slots, th, kvd)
    stripe = jnp.tile(jnp.repeat(onehot, hd, axis=1), (t_q, 1))  # [TH, kvd]
    d = jnp.arange(hd, dtype=jnp.int32)
    tile_mat = (jnp.arange(kvd, dtype=jnp.int32)[None, :] % hd == d[:, None]).astype(jnp.float32)
    # causal bias over the register block: row r = t*Hq + h attends draft j <= t
    row_t = jnp.arange(th, dtype=jnp.int32) // hq
    bias = jnp.where(
        jnp.arange(t_q, dtype=jnp.int32)[None, :] <= row_t[:, None], 0.0, NEG_INF
    ).astype(jnp.float32)

    kn = k_new.astype(k_pool.dtype).reshape(n_slots, t_q, kvd)
    vn = v_new.astype(v_pool.dtype).reshape(n_slots, t_q, kvd)

    flat_tokens = max_pages * ps
    per_buf_bytes = 2 * flat_tokens * kvd * k_pool.dtype.itemsize
    n_buf = 2 if 2 * per_buf_bytes <= _FLAT_VMEM_BUDGET else 1
    if n_buf * per_buf_bytes > 2 * _FLAT_VMEM_BUDGET:
        raise ValueError(
            f"max_context ({flat_tokens} tokens/slot) exceeds the flat-buffer VMEM "
            f"budget; shrink max_context or page the kernel"
        )

    if interpret:
        pool_in_spec = pl.BlockSpec((n_rows, ps, kvd), lambda b, *_: (0, 0, 0))
        pool_out_spec = pl.BlockSpec((n_rows, ps, kvd), lambda b, *_: (0, 0, 0))
        aliases = {}
    else:
        pool_in_spec = pl.BlockSpec(memory_space=pl.ANY)
        pool_out_spec = pl.BlockSpec(memory_space=pl.ANY)
        # flat positional inputs (4 scalar-prefetch + 6 arrays): k2/v2 at 10/11
        aliases = {10: 1, 11: 2}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_slots,),
        in_specs=[
            pl.BlockSpec((1, th, kvd), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((th, kvd), lambda b, *_: (0, 0)),
            pl.BlockSpec((hd, kvd), lambda b, *_: (0, 0)),
            pl.BlockSpec((th, t_q), lambda b, *_: (0, 0)),
            pl.BlockSpec((1, t_q, kvd), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, t_q, kvd), lambda b, *_: (b, 0, 0)),
            pool_in_spec,
            pool_in_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, th, hd), lambda b, *_: (b, 0, 0)),
            pool_out_spec,
            pool_out_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((n_buf, flat_tokens, kvd), k_pool.dtype),
            pltpu.VMEM((n_buf, flat_tokens, kvd), v_pool.dtype),
            pltpu.VMEM((2, WRITE_WIN, kvd), k_pool.dtype),
            pltpu.VMEM((2, WRITE_WIN, kvd), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2, n_buf, max_pages)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    kernel = functools.partial(_kernel_multi, ps=ps, hd=hd, interpret=interpret)
    attn, k_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_slots, th, hd), q.dtype),
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ],
        input_output_aliases=aliases,
        interpret=interpret,
    )(
        page_table.astype(jnp.int32), hist_lens.astype(jnp.int32),
        row_w1.astype(jnp.int32), row_w2.astype(jnp.int32),
        q2, stripe, tile_mat, bias, kn, vn, k_pool, v_pool,
    )
    return attn.reshape(n_slots, t_q, hq, hd), k_out, v_out
