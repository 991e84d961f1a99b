"""First-party Pallas TPU flash attention (training: fwd + custom-VJP bwd).

Replaces torch SDPA/flex-attention in the reference's hot path (ref: SURVEY.md §2.3
"torchtune model kernels"). Design for this workload (Llama 3.2 1B; S = 768 CPT /
2048 SFT; head_dim 64; GQA 32q/8kv):

- **Whole-K in VMEM**: at these sequence lengths one (batch, head) slice of K/V is
  S x 64 bf16 <= 256 KB, so each kernel instance holds full K/V in VMEM and
  computes an exact softmax over the full row — no online-softmax passes, fewer
  VMEM round-trips than the textbook streaming variant, same O(S^2 D) FLOPs.
- **Triangle blocking, statically unrolled**: grid (B, H) with a PYTHON loop
  over q blocks, so each block's k/v extent ``(qi+1)*block_q`` is a static
  shape: causal row qi never dots against keys it would mask anyway. Exact
  softmax per row (a causal row's full valid range is present — no online
  rescaling), no fori machinery; both were measured dead ends for the chunked
  variant, which this is not. Saves ~1/3 of MXU and VPU work at S=768
  (~44% at S=2048) vs the previous full-rectangle kernels.
- **GQA without materialization**: the K/V BlockSpec index-maps query head h to
  kv head h // n_rep, so grouped heads re-read the same VMEM block instead of
  expanding K/V in HBM (the XLA path and the reference's torch path both expand).
- **Pre-scaled queries**: the softmax scale is folded into q OUTSIDE the kernels
  (``q * sm_scale`` fuses into the preceding projection in XLA, and autodiff
  chains the scale into dq for free). The kernels are VPU-bound — round-3
  profiling put the elementwise [bq, S] passes, not the MXU dots, at ~15% of
  the CPT step — so every eliminated full-block multiply (1 in fwd, 2 in bwd)
  is a direct win. For head_dim 64 the scale is 1/8: exact in bf16.
- **Fused backward**: ONE kernel with grid (B, H) and the same unrolled q-block
  loop produces dq, dk, dv together. TPU Pallas grids execute sequentially on
  the core, so the old dq-kernel/dkv-kernel split bought no parallelism — it just
  recomputed s/mask/p/dp twice and re-fetched q/do/lse from HBM. Consecutive
  grouped query heads accumulate dk/dv into the same revisited output block;
  delta = sum(o*do) is computed inline per q block (the separate XLA delta
  pass cost 70 ms/step before round 3 fused it into the bwd).
- Causal masking and packed-sequence ``segment_ids`` supported in fwd + bwd.

Numerics: matmul OPERANDS stay in the input dtype (bf16) with
``preferred_element_type=float32`` accumulation — an f32xf32 dot runs the MXU
at 1/4 rate, which round-3 profiling measured as 518 ms (16%) of the CPT step
at ~5% MFU; softmax statistics and the dk/dv accumulators are fp32. Matches
ops.attention.xla_attention to ~1e-2 in bf16 and ~1e-5 in fp32
(see tests/test_flash_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 256
_NEG_INF = -1.0e30


def _pick_block_q(s: int) -> int:
    for candidate in (DEFAULT_BLOCK_Q, 128, 64, 32, 16, 8):
        if s % candidate == 0:
            return candidate
    return s


def _causal_mask(qi: int, block_q: int, s_kv: int):
    # 1D iotas + a broadcast compare: Mosaic keeps the row/column indices
    # in-register instead of materializing two full [bq, S] i32 planes
    rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, s_kv), 1)
    return cols <= rows


# ----------------------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, lse_ref, *, causal, block_q, use_segs):
    # MXU dtype discipline (the profiled 5%-MFU bug of round 2): operands stay
    # bf16 — an f32xf32 dot runs the MXU at 1/4 rate — while
    # preferred_element_type=f32 keeps fp32 accumulation. Standard flash
    # numerics: only softmax/statistics run in f32. q arrives pre-scaled.
    k = k_ref[0, 0]  # [S, D]
    v = v_ref[0, 0]
    s_kv = k.shape[0]

    for qi in range(q_ref.shape[2] // block_q):
        # static k/v extent: causal row block qi only attends to keys < bound
        bound = (qi + 1) * block_q if causal else s_kv
        sl = pl.ds(qi * block_q, block_q)  # pl.ds: a python slice on a ref
        # lowers to an unsupported gather on the TPU path
        s = jax.lax.dot_general(
            q_ref[0, 0, sl], k[:bound], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bound]

        mask = None
        if causal:
            mask = _causal_mask(qi, block_q, bound)
        if use_segs:
            qseg = qseg_ref[0, 0, sl]  # [bq]
            kseg_b = kseg_ref[0, 0, pl.ds(0, bound)]  # [bound] (1-D VALUE
            # slicing lowers to an unsupported >2D gather on the TPU path)
            seg_mask = qseg[:, None] == kseg_b[None, :]
            mask = seg_mask if mask is None else jnp.logical_and(mask, seg_mask)
        if mask is not None:
            s = jnp.where(mask, s, _NEG_INF)

        m = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        # rows that are fully masked (can happen with segment padding) -> zero output
        m_safe = jnp.maximum(m, -0.5e30)
        p = jnp.exp(s - m_safe)
        l = jnp.sum(p, axis=1, keepdims=True)
        l_safe = jnp.maximum(l, 1e-30)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[:bound], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # normalization deferred to the [bq, D] output — 12x fewer elements than
        # dividing the [bq, S] probability block (the kernel is VPU-bound)
        o_ref[0, 0, sl] = (o / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0, sl] = m_safe + jnp.log(l_safe)  # [bq, 1]


def _fwd(q, k, v, segment_ids, causal, block_q):
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    n_rep = hq // hkv

    if segment_ids is None:
        segs = jnp.zeros((b, 1, s), jnp.int32)  # dummy; kernel skips the compare
    else:
        segs = segment_ids.astype(jnp.int32)[:, None, :]

    kernel = functools.partial(
        _fwd_kernel,
        causal=causal,
        block_q=block_q,
        use_segs=segment_ids is not None,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=(b, hq),
        in_specs=[
            pl.BlockSpec((1, 1, s, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, n_rep=n_rep: (bi, hi // n_rep, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, n_rep=n_rep: (bi, hi // n_rep, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda bi, hi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda bi, hi: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, s, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, 1), lambda bi, hi: (bi, hi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, hq, s, 1), jnp.float32),
        ],
    )(q, k, v, segs, segs)
    return o, lse


def _grouped_causal_mask(qi: int, block_q: int, s_kv: int, n_rep: int):
    """Causal mask for n_rep stacked query heads (head-major rows): stacked row
    r maps to q position qi*block_q + (r mod block_q). One fused compare pass
    for the whole group instead of n_rep separate mask materializations."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_rep * block_q, 1), 0)
    if block_q & (block_q - 1) == 0:
        rows = jnp.bitwise_and(rows, block_q - 1)  # r mod bq, power-of-two fast path
    else:
        rows = jax.lax.rem(rows, block_q)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, s_kv), 1)
    return cols <= qi * block_q + rows


def _fwd_kernel_grouped(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, lse_ref,
                        *, causal, block_q, use_segs, n_rep):
    """GQA-grouped forward: grid (B, Hkv); one program computes all n_rep query
    heads of a KV group, stacked head-major into a [n_rep*bq, *] 2D problem
    (Mosaic lowers only 2D dots). Same math and element count as _fwd_kernel,
    but 1/n_rep the grid programs (the kernels are latency/VPU-bound at
    ~1.2 us/program — round-3 profile) and n_rep-fold larger MXU row blocks."""
    k = k_ref[0, 0]  # [S, D]
    v = v_ref[0, 0]
    s_kv = k.shape[0]

    for qi in range(q_ref.shape[2] // block_q):
        bound = (qi + 1) * block_q if causal else s_kv
        sl = pl.ds(qi * block_q, block_q)
        d = q_ref.shape[3]
        q = q_ref[0, :, sl].reshape(n_rep * block_q, d)  # stacked group (pre-scaled)
        s = jax.lax.dot_general(
            q, k[:bound], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [n_rep*bq, bound]

        mask = None
        if causal:
            mask = _grouped_causal_mask(qi, block_q, bound, n_rep)
        if use_segs:
            qseg = qseg_ref[0, 0, sl]  # [bq]
            kseg_b = kseg_ref[0, 0, pl.ds(0, bound)]
            # 2D compare then a sublane-axis concat (1-D concats don't lower):
            # the same [bq, bound] plane replicated for each stacked head
            seg_mask_1 = qseg[:, None] == kseg_b[None, :]
            seg_mask = jnp.concatenate([seg_mask_1] * n_rep, axis=0)
            mask = seg_mask if mask is None else jnp.logical_and(mask, seg_mask)
        if mask is not None:
            s = jnp.where(mask, s, _NEG_INF)

        m = jnp.max(s, axis=1, keepdims=True)  # [n_rep*bq, 1]
        m_safe = jnp.maximum(m, -0.5e30)
        p = jnp.exp(s - m_safe)
        l = jnp.sum(p, axis=1, keepdims=True)
        l_safe = jnp.maximum(l, 1e-30)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[:bound], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [n_rep*bq, D]
        o_ref[0, :, sl] = (o / l_safe).reshape(n_rep, block_q, d).astype(o_ref.dtype)
        lse_ref[0, :, sl] = (m_safe + jnp.log(l_safe)).reshape(n_rep, block_q, 1)


def _fwd_grouped(q, k, v, segment_ids, causal, block_q):
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    n_rep = hq // hkv

    if segment_ids is None:
        segs = jnp.zeros((b, 1, s), jnp.int32)
    else:
        segs = segment_ids.astype(jnp.int32)[:, None, :]

    kernel = functools.partial(
        _fwd_kernel_grouped, causal=causal, block_q=block_q,
        use_segs=segment_ids is not None, n_rep=n_rep,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, n_rep, s, d), lambda bi, gi: (bi, gi, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, gi: (bi, gi, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, gi: (bi, gi, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda bi, gi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda bi, gi: (bi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_rep, s, d), lambda bi, gi: (bi, gi, 0, 0)),
            pl.BlockSpec((1, n_rep, s, 1), lambda bi, gi: (bi, gi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, hq, s, 1), jnp.float32),
        ],
    )(q, k, v, segs, segs)
    return o, lse


# ----------------------------------------------------------------------------------
# Backward: one fused kernel for dq + dk + dv
# ----------------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, o_ref,
                dq_ref, dk_ref, dv_ref, *, causal, block_q, n_rep, use_segs):
    hi = pl.program_id(1)
    k = k_ref[0, 0]  # [S, D] bf16 (see module dtype note)
    v = v_ref[0, 0]
    s_kv = k.shape[0]
    n_q_blocks = q_ref.shape[2] // block_q

    # consecutive grouped query heads revisit the same dk/dv output block
    # (grid steps run sequentially on the core), so zero it at group entry
    @pl.when(hi % n_rep == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    for qi in range(n_q_blocks):
        # static k/v extent (see module docstring): the triangle above the
        # causal diagonal is never computed, not merely masked
        bound = (qi + 1) * block_q if causal else s_kv
        sl = pl.ds(qi * block_q, block_q)
        q = q_ref[0, 0, sl]      # [bq, D] bf16 (pre-scaled)
        do = do_ref[0, 0, sl]    # [bq, D]
        lse = lse_ref[0, 0, sl]  # [bq, 1]
        # delta inline: the separate XLA sum(o * do) pass over [B,H,S,D] cost
        # 70 ms/step in the round-3 profile
        delta = jnp.sum(
            o_ref[0, 0, sl].astype(jnp.float32) * do.astype(jnp.float32), axis=-1, keepdims=True
        )  # [bq, 1]

        s = jax.lax.dot_general(q, k[:bound], dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mask = None
        if causal:
            mask = _causal_mask(qi, block_q, bound)
        if use_segs:
            qseg = qseg_ref[0, 0, sl]
            kseg_b = kseg_ref[0, 0, pl.ds(0, bound)]  # see _fwd_kernel note
            seg_mask = qseg[:, None] == kseg_b[None, :]
            mask = seg_mask if mask is None else jnp.logical_and(mask, seg_mask)
        p = jnp.exp(s - lse)  # [bq, bound] f32
        if mask is not None:
            p = jnp.where(mask, p, 0.0)

        dp = jax.lax.dot_general(do, v[:bound], dimension_numbers=(((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)  # [bq, bound] f32

        ksl = pl.ds(0, bound)
        dv_ref[0, 0, ksl] += jax.lax.dot_general(
            p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_ref[0, 0, ksl] += jax.lax.dot_general(
            ds.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq = jax.lax.dot_general(ds.astype(k.dtype), k[:bound], dimension_numbers=(((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, 0, sl] = dq.astype(dq_ref.dtype)


def _bwd(q, k, v, segment_ids, o, lse, do, causal, block_q):
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    n_rep = hq // hkv

    if segment_ids is None:
        segs = jnp.zeros((b, 1, s), jnp.int32)
    else:
        segs = segment_ids.astype(jnp.int32)[:, None, :]
    use_segs = segment_ids is not None

    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, causal=causal, block_q=block_q, n_rep=n_rep, use_segs=use_segs
        ),
        grid=(b, hq),
        in_specs=[
            pl.BlockSpec((1, 1, s, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, n_rep=n_rep: (bi, hi // n_rep, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, n_rep=n_rep: (bi, hi // n_rep, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda bi, hi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda bi, hi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, 1), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi: (bi, hi, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, s, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, n_rep=n_rep: (bi, hi // n_rep, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, n_rep=n_rep: (bi, hi // n_rep, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, hkv, s, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, s, d), jnp.float32),
        ],
    )(q, k, v, segs, segs, do, lse, o)

    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _bwd_kernel_grouped(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, do_ref, lse_ref, o_ref,
                        dq_ref, dk_ref, dv_ref, *, causal, block_q, n_rep, use_segs):
    """GQA-grouped backward: grid (B, Hkv); the n_rep query heads of a KV group
    are stacked head-major into 2D [n_rep*bq, *] blocks. The group's dk/dv
    contributions come out of ONE dot (contracting over all n_rep*bq stacked
    rows) instead of n_rep sequential f32 read-modify-write accumulation passes
    over the revisited output block."""
    k = k_ref[0, 0]  # [S, D]
    v = v_ref[0, 0]
    s_kv = k.shape[0]
    d = q_ref.shape[3]
    n_q_blocks = q_ref.shape[2] // block_q

    # each (b, kv-head) program owns its dk/dv block exclusively; zero once, then
    # accumulate across the q-block loop
    dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
    dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    for qi in range(n_q_blocks):
        bound = (qi + 1) * block_q if causal else s_kv
        sl = pl.ds(qi * block_q, block_q)
        q = q_ref[0, :, sl].reshape(n_rep * block_q, d)    # stacked (pre-scaled)
        do = do_ref[0, :, sl].reshape(n_rep * block_q, d)
        lse = lse_ref[0, :, sl].reshape(n_rep * block_q, 1)
        delta = jnp.sum(
            o_ref[0, :, sl].reshape(n_rep * block_q, d).astype(jnp.float32)
            * do.astype(jnp.float32), axis=-1, keepdims=True
        )  # [n_rep*bq, 1]

        s = jax.lax.dot_general(q, k[:bound], dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mask = None
        if causal:
            mask = _grouped_causal_mask(qi, block_q, bound, n_rep)
        if use_segs:
            qseg = qseg_ref[0, 0, sl]  # [bq]
            kseg_b = kseg_ref[0, 0, pl.ds(0, bound)]
            # 2D compare then a sublane-axis concat (1-D concats don't lower):
            # the same [bq, bound] plane replicated for each stacked head
            seg_mask_1 = qseg[:, None] == kseg_b[None, :]
            seg_mask = jnp.concatenate([seg_mask_1] * n_rep, axis=0)
            mask = seg_mask if mask is None else jnp.logical_and(mask, seg_mask)
        p = jnp.exp(s - lse)  # [n_rep*bq, bound] f32
        if mask is not None:
            p = jnp.where(mask, p, 0.0)

        dp = jax.lax.dot_general(do, v[:bound], dimension_numbers=(((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)  # [n_rep*bq, bound] f32

        ksl = pl.ds(0, bound)
        # one dot per group: contracting over the stacked row axis sums the
        # n_rep heads' contributions inside the MXU
        dv_ref[0, 0, ksl] += jax.lax.dot_general(
            p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_ref[0, 0, ksl] += jax.lax.dot_general(
            ds.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq = jax.lax.dot_general(ds.astype(k.dtype), k[:bound],
                                 dimension_numbers=(((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = dq.reshape(n_rep, block_q, d).astype(dq_ref.dtype)


def _bwd_grouped(q, k, v, segment_ids, o, lse, do, causal, block_q):
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    n_rep = hq // hkv

    if segment_ids is None:
        segs = jnp.zeros((b, 1, s), jnp.int32)
    else:
        segs = segment_ids.astype(jnp.int32)[:, None, :]
    use_segs = segment_ids is not None

    grouped = pl.BlockSpec((1, n_rep, s, d), lambda bi, gi: (bi, gi, 0, 0))
    single = pl.BlockSpec((1, 1, s, d), lambda bi, gi: (bi, gi, 0, 0))
    segspec = pl.BlockSpec((1, 1, s), lambda bi, gi: (bi, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel_grouped, causal=causal, block_q=block_q, n_rep=n_rep, use_segs=use_segs
        ),
        grid=(b, hkv),
        in_specs=[
            grouped, single, single, segspec, segspec, grouped,
            pl.BlockSpec((1, n_rep, s, 1), lambda bi, gi: (bi, gi, 0, 0)),
            grouped,
        ],
        out_specs=[grouped, single, single],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, hkv, s, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, s, d), jnp.float32),
        ],
    )(q, k, v, segs, segs, do, lse, o)

    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


# ----------------------------------------------------------------------------------
# Public API (custom VJP, model layout [B, S, H, D])
# ----------------------------------------------------------------------------------


def _auto_group_heads(n_rep: int, block_q: int, s: int, d: int) -> bool:
    """Grouped kernels hold [n_rep*block_q, S] f32 score/probability planes in
    VMEM (~16 MB/core); estimate the backward's live set and group only when it
    fits. At the CPT shape (n_rep 4, bq 256, S 768) this is ~11.6 MB — measured
    working and +1% end-to-end; at S 2048 with bq 256 it would be ~25 MB and
    Mosaic fails allocation — _grouped_block_q sub-tiles the planes by
    shrinking the q block until they fit (S 2048 groups at bq 32)."""
    if n_rep <= 1:
        return False
    rows = n_rep * block_q
    est = (
        3 * rows * s * 4          # s/p/ds-class [rows, S] f32 planes live in bwd
        + 4 * n_rep * s * d * 2   # stacked q/do/o/dq blocks (bf16)
        + 2 * s * d * 2           # k, v (bf16)
        + 2 * s * d * 4           # dk, dv accumulators (f32)
    )
    return est <= 12 * 1024 * 1024


def _grouped_block_q(n_rep: int, block_q: int, s: int, d: int, floor: int = 32) -> int | None:
    """Largest q block <= block_q whose GROUPED live set fits VMEM (sub-tiling
    the [n_rep*bq, S] planes along the q axis), or None when even ``floor``
    doesn't fit. Shrinking bq by the grouping factor keeps the stacked MXU row
    block (n_rep*bq) at the ungrouped kernel's size while still cutting the
    program count by n_rep."""
    bq = block_q
    while bq >= floor:
        if s % bq == 0 and _auto_group_heads(n_rep, bq, s, d):
            return bq
        bq //= 2
    return None


def _fwd_dispatch(q, k, v, segment_ids, causal, block_q, group_heads):
    if group_heads and q.shape[1] != k.shape[1]:
        return _fwd_grouped(q, k, v, segment_ids, causal, block_q)
    return _fwd(q, k, v, segment_ids, causal, block_q)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_bhsd(q, k, v, segment_ids, causal, block_q, group_heads):
    # lse is returned as a PRIMAL output (callers discard it) so a remat policy
    # can checkpoint-name BOTH backward residuals: with only o nameable, the
    # backward pass would re-run this whole forward kernel just to regenerate
    # lse (round-3 profile: 113 ms/step of rematted_computation).
    return _fwd_dispatch(q, k, v, segment_ids, causal, block_q, group_heads)


def _flash_fwd_rule(q, k, v, segment_ids, causal, block_q, group_heads):
    from jax.ad_checkpoint import checkpoint_name

    o, lse = _fwd_dispatch(q, k, v, segment_ids, causal, block_q, group_heads)
    # name the RESIDUALS (not just the primal output): the remat policy decides
    # per named value; both o and lse must be saved or the whole forward kernel
    # re-runs in the backward pass to regenerate them
    res_o = checkpoint_name(o, "attn_out")
    res_lse = checkpoint_name(lse, "attn_out")
    return (o, lse), (q, k, v, segment_ids, res_o, res_lse)


def _flash_bwd_rule(causal, block_q, group_heads, residuals, cotangents):
    q, k, v, segment_ids, o, lse = residuals
    do, _ = cotangents  # lse cotangent is structurally zero (output unused)
    if group_heads and q.shape[1] != k.shape[1]:
        dq, dk, dv = _bwd_grouped(q, k, v, segment_ids, o, lse, do, causal, block_q)
    else:
        dq, dk, dv = _bwd(q, k, v, segment_ids, o, lse, do, causal, block_q)
    return dq, dk, dv, None


_flash_bhsd.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = True,
    segment_ids: jnp.ndarray | None = None,
    block_q: int | None = None,
    group_heads: bool | None = None,
) -> jnp.ndarray:
    """Pallas flash attention in the model's ``[B, S, H, D]`` layout.

    Args:
        q: ``[B, S, Hq, D]``.
        k, v: ``[B, S, Hkv, D]`` with ``Hq % Hkv == 0`` (GQA).
        segment_ids: optional ``[B, S]`` packed-sequence IDs.
        group_heads: run one grid program per (batch, KV head) with the n_rep
            grouped query heads stacked into 2D blocks, instead of one program
            per (batch, query head). Same math; fewer, larger programs. The
            default (None) auto-enables grouping when the grouped blocks fit
            VMEM (see _auto_group_heads); True forces it, False disables.
    """
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    if hq % hkv != 0:
        # the K/V BlockSpec index map divides by n_rep — a non-divisible head
        # config would silently clamp/wrap the block index (wrong attention)
        raise ValueError(f"Hq ({hq}) must be a multiple of Hkv ({hkv}) for GQA")
    if block_q is None:
        block_q = _pick_block_q(s)
    if s % block_q != 0:
        raise ValueError(f"Sequence length {s} must be a multiple of block_q={block_q}")
    n_rep = hq // hkv
    if group_heads is None:
        # auto: group only when the grouped live set fits at the FULL block_q
        # (measured +1% at the CPT shape). Sub-tiled grouping (smaller bq) is
        # opt-in via group_heads=True — measured at parity, not a win, at the
        # SFT shape (see docs/ROADMAP.md round-5 notes).
        group_heads = _auto_group_heads(n_rep, block_q, s, d)
    elif group_heads and not _auto_group_heads(n_rep, block_q, s, d):
        # forced grouping at a shape whose planes exceed VMEM at this bq:
        # sub-tile along the q axis instead of failing Mosaic allocation
        sub_bq = _grouped_block_q(n_rep, block_q, s, d)
        if sub_bq is None:
            group_heads = False  # nothing fits; fall back to the per-head grid
        else:
            block_q = sub_bq
    sm_scale = 1.0 / (d**0.5)
    # fold the softmax scale into q here: XLA fuses the multiply into the
    # surrounding transpose/projection, autodiff routes it into dq, and the
    # kernels lose one (fwd) + two (bwd) full [bq, S]/[bq, D] VPU passes
    qt = (q * sm_scale).transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    o, lse = _flash_bhsd(qt, kt, vt, segment_ids, causal, block_q, group_heads)
    # the remat policy saves o (save_qkv_mlp_attn); lse rides along as a fwd
    # residual via _flash_fwd_rule — no extra tag needed here
    from jax.ad_checkpoint import checkpoint_name

    o = checkpoint_name(o, "attn_out")
    return o.transpose(0, 2, 1, 3).astype(q.dtype)
