"""Block-paged KV cache + paged attention for the continuous-batching engine.

TPU-native replacement for vLLM's paged attention (ref: scripts/generate.py:112
relies on vLLM's CUDA paged-attention kernels; BASELINE north star names the
Pallas paged-attention batched decode loop). Design:

- K/V pools are ``[n_pages, page_size, Hkv, hd]`` per layer (stacked to
  ``[L, n_pages, ...]``). A **page table** ``[slots, max_pages]`` maps each decode
  slot's logical blocks to physical pages; ``seq_lens [slots]`` gives the valid
  length. Pages are allocated host-side from a free list (the scheduler), so slots
  with short sequences never reserve memory for the worst case.
- Sequences are **not padded**: slot tokens occupy positions ``0..len-1`` and RoPE
  positions equal the true index — unlike the dense engine's left-padding.
- ``paged_attention`` (XLA): gathers each slot's pages into a dense view and runs
  grouped-query attention — correctness-first, runs everywhere, and XLA keeps the
  gather+einsum on-device with no host trips.
- ``paged_attention_pallas``: Pallas TPU kernel with a scalar-prefetched page
  table — each grid step DMAs exactly one physical page HBM->VMEM and folds it
  into flash-style running (max, sum, acc) statistics, never materializing the
  gathered cache. Used automatically on TPU (``impl="auto"``).

All functions are shape-static: ``max_pages`` bounds the context
(``max_pages * page_size``), and masking by ``seq_lens`` handles raggedness, so
one compiled program serves every mix of prompt/output lengths.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ssi_tpu.models.configs import ConfigLlama3_2
from ssi_tpu.models.llama3 import rms_norm
from ssi_tpu.models.rope import apply_rope, rope_cos_sin

NEG_INF = -1.0e30


def init_pools(cfg: ConfigLlama3_2, n_pages: int, page_size: int, dtype=jnp.bfloat16) -> dict[str, jnp.ndarray]:
    """Allocate the paged K/V pools: ``[L, n_pages, page_size, Hkv, hd]``."""
    shape = (cfg.num_layers, n_pages, page_size, cfg.num_kv_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def write_token_kv(pool: jnp.ndarray, kv: jnp.ndarray,
                   page_ids: jnp.ndarray, offsets: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """Scatter one new token's K or V per slot into its current page.

    pool: [n_pages, ps, Hkv, hd] (single layer); kv: [slots, Hkv, hd];
    page_ids/offsets: [slots] physical page and in-page offset; active: [slots]
    bool — an inactive slot re-writes the value already present at its cell
    (scatter must be total for XLA, so the no-op is a same-value overwrite).
    """
    # For inactive slots, write the value already present (no-op) — scatter must
    # be total for XLA, so read-modify-write the same cell.
    current = pool[page_ids, offsets]  # [slots, Hkv, hd]
    val = jnp.where(active[:, None, None], kv.astype(pool.dtype), current)
    return pool.at[page_ids, offsets].set(val)


def gather_pages(pool: jnp.ndarray, page_table: jnp.ndarray) -> jnp.ndarray:
    """Dense view of a slot-major paged pool: [slots, max_pages*ps, Hkv, hd]."""
    n_slots, max_pages = page_table.shape
    g = pool[page_table]  # [slots, max_pages, ps, Hkv, hd]
    return g.reshape(n_slots, max_pages * pool.shape[1], *pool.shape[2:])


def paged_attention(
    q: jnp.ndarray,
    k_pool: jnp.ndarray,
    v_pool: jnp.ndarray,
    page_table: jnp.ndarray,
    seq_lens: jnp.ndarray,
) -> jnp.ndarray:
    """Single-token grouped-query attention over a paged KV cache (XLA gather).

    q: [slots, Hq, hd] (post-RoPE); k_pool/v_pool: [n_pages, ps, Hkv, hd];
    page_table: [slots, max_pages]; seq_lens: [slots] — number of valid cache
    tokens INCLUDING the current one (already written). Returns [slots, Hq, hd].
    """
    n_slots, hq, hd = q.shape
    ps = k_pool.shape[1]
    hkv = k_pool.shape[2]
    n_rep = hq // hkv

    k = gather_pages(k_pool, page_table)  # [S, M, Hkv, hd]
    v = gather_pages(v_pool, page_table)
    m = k.shape[1]

    qg = q.reshape(n_slots, hkv, n_rep, hd)
    scale = 1.0 / (hd**0.5)
    logits = jnp.einsum("bkgd,bmkd->bkgm", qg, k.astype(q.dtype), preferred_element_type=jnp.float32) * scale
    valid = jnp.arange(m, dtype=jnp.int32)[None, :] < seq_lens[:, None]  # [S, M]
    logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkgm,bmkd->bkgd", probs.astype(v.dtype), v)
    return out.reshape(n_slots, hq, hd)


def prefill_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Causal self-attention over one un-padded prompt (prefill, batch of slots=1).

    q: [T, Hq, hd]; k/v: [T, Hkv, hd]. Returns [T, Hq, hd].
    """
    t, hq, hd = q.shape
    hkv = k.shape[1]
    n_rep = hq // hkv
    qg = q.reshape(t, hkv, n_rep, hd)
    scale = 1.0 / (hd**0.5)
    logits = jnp.einsum("tkgd,mkd->kgtm", qg, k.astype(q.dtype), preferred_element_type=jnp.float32) * scale
    causal = jnp.arange(t, dtype=jnp.int32)[:, None] >= jnp.arange(t, dtype=jnp.int32)[None, :]
    logits = jnp.where(causal[None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("kgtm,mkd->tkgd", probs.astype(v.dtype), v)
    return out.reshape(t, hq, hd)


# ----------------------------------------------------------------------------------
# Model passes over the paged cache
# ----------------------------------------------------------------------------------


def _rope_for_positions(positions: jnp.ndarray, cfg: ConfigLlama3_2):
    return rope_cos_sin(
        positions,
        cfg.head_dim,
        rope_base=cfg.rope_base,
        scale_factor=cfg.scale_factor,
        low_freq_factor=cfg.rope_low_freq_factor,
        high_freq_factor=cfg.rope_high_freq_factor,
        original_max_seq_len=cfg.rope_original_max_seq_len,
    )


def decode_step_tokens(
    params: Any,
    tokens: jnp.ndarray,
    cfg: ConfigLlama3_2,
    pools: dict[str, jnp.ndarray],
    page_table: jnp.ndarray,
    seq_lens: jnp.ndarray,
    active: jnp.ndarray,
    *,
    attn_impl: str = "gather",
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Advance every active slot by ONE token over the paged cache.

    tokens: [slots] current input token per slot (the one being fed);
    seq_lens: [slots] valid cache length BEFORE this token. Writes the new K/V at
    position ``seq_lens`` (page ``seq_lens // ps``), attends over
    ``seq_lens + 1`` entries, and returns (fp32 logits [slots, V], new pools).
    """
    ps = pools["k"].shape[2]
    n_slots = tokens.shape[0]
    positions = seq_lens[:, None]  # [slots, 1] — position of the incoming token
    cos, sin = _rope_for_positions(positions, cfg)  # [slots, 1, hd]

    page_idx = seq_lens // ps
    page_ids = jnp.take_along_axis(page_table, page_idx[:, None], axis=1)[:, 0]
    offsets = seq_lens % ps
    attn_lens = seq_lens + 1  # attend over history + self (inactive slots masked upstream)

    h = params["embed"][tokens]  # [slots, D]
    hd = cfg.head_dim

    def body(carry, xs):
        h = carry
        layer, k_pool, v_pool = xs
        x = rms_norm(h, layer["attn_norm"], cfg.norm_eps)
        q = (x @ layer["wq"]).reshape(n_slots, cfg.num_heads, hd)
        k = (x @ layer["wk"]).reshape(n_slots, cfg.num_kv_heads, hd)
        v = (x @ layer["wv"]).reshape(n_slots, cfg.num_kv_heads, hd)
        # RoPE on the single position (apply_rope expects [B, S, H, d])
        q = apply_rope(q[:, None], cos[:, :1], sin[:, :1])[:, 0]
        k = apply_rope(k[:, None], cos[:, :1], sin[:, :1])[:, 0]
        k_pool = write_token_kv(k_pool, k, page_ids, offsets, active)
        v_pool = write_token_kv(v_pool, v, page_ids, offsets, active)
        if attn_impl == "pallas":
            from ssi_tpu.generate.paged_pallas import paged_attention_pallas

            attn = paged_attention_pallas(q, k_pool, v_pool, page_table, attn_lens)
        else:
            attn = paged_attention(q, k_pool, v_pool, page_table, attn_lens)
        h = h + attn.reshape(n_slots, cfg.num_heads * hd).astype(h.dtype) @ layer["wo"]
        x = rms_norm(h, layer["mlp_norm"], cfg.norm_eps)
        h = h + (jax.nn.silu(x @ layer["w_gate"]) * (x @ layer["w_up"])) @ layer["w_down"]
        return h, (k_pool, v_pool)

    h, (new_k, new_v) = jax.lax.scan(body, h, (params["layers"], pools["k"], pools["v"]))
    h = rms_norm(h, params["final_norm"], cfg.norm_eps)
    logits = jnp.dot(h, params["embed"].T, preferred_element_type=jnp.float32)
    return logits, {"k": new_k, "v": new_v}


def prefill_prompt(
    params: Any,
    tokens: jnp.ndarray,
    length: jnp.ndarray,
    cfg: ConfigLlama3_2,
    pools: dict[str, jnp.ndarray],
    page_ids: jnp.ndarray,
) -> dict[str, jnp.ndarray]:
    """Prefill ONE prompt into its pages (K/V write only — no logits).

    tokens: [P] right-padded to the bucket length; length: scalar true length
    (kept for interface stability; the caller seeds decode at ``length - 1`` so
    the first chunk step recomputes the last prompt position and samples the
    first output on device — admission stays free of host round trips);
    page_ids: [P // ps] physical pages receiving the prompt K/V. The scheduler
    allocates pages for the full bucket length P, so pad-position K/V lands in
    slot-owned pages; decode masks them via seq_lens and overwrites them in place
    as real tokens reach those offsets.

    Returns the updated pools.
    """
    p = tokens.shape[0]
    ps = pools["k"].shape[2]
    assert p % ps == 0, (p, ps)
    positions = jnp.arange(p, dtype=jnp.int32)[None, :]
    cos, sin = _rope_for_positions(positions, cfg)
    hd = cfg.head_dim

    h = params["embed"][tokens]  # [P, D]

    def body(carry, xs):
        h = carry
        layer, k_pool, v_pool = xs
        x = rms_norm(h, layer["attn_norm"], cfg.norm_eps)
        q = (x @ layer["wq"]).reshape(p, cfg.num_heads, hd)
        k = (x @ layer["wk"]).reshape(p, cfg.num_kv_heads, hd)
        v = (x @ layer["wv"]).reshape(p, cfg.num_kv_heads, hd)
        q = apply_rope(q[None], cos, sin)[0]
        k = apply_rope(k[None], cos, sin)[0]
        attn = prefill_attention(q, k, v)
        h = h + attn.reshape(p, cfg.num_heads * hd).astype(h.dtype) @ layer["wo"]
        x = rms_norm(h, layer["mlp_norm"], cfg.norm_eps)
        h = h + (jax.nn.silu(x @ layer["w_gate"]) * (x @ layer["w_up"])) @ layer["w_down"]
        # scatter K/V pages: [P] -> [P//ps, ps, Hkv, hd] written to page_ids
        k_pool = k_pool.at[page_ids].set(k.astype(k_pool.dtype).reshape(p // ps, ps, cfg.num_kv_heads, hd))
        v_pool = v_pool.at[page_ids].set(v.astype(v_pool.dtype).reshape(p // ps, ps, cfg.num_kv_heads, hd))
        return h, (k_pool, v_pool)

    _, (new_k, new_v) = jax.lax.scan(body, h, (params["layers"], pools["k"], pools["v"]))
    del length  # see docstring
    return {"k": new_k, "v": new_v}
