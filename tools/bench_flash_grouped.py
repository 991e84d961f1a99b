#!/usr/bin/env python
"""A/B micro-bench: per-head vs GQA-grouped flash attention kernels on TPU.

Times fwd and fwd+bwd at the headline CPT/SFT shapes without compiling the full
train program (kernel-only compiles are minutes through the dev tunnel; the 1B
train program is tens of minutes). Prints JSONL per shape/variant.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from ssi_tpu.ops.flash_attention import flash_attention

# (name, b, s, hq, hkv, d) — headline CPT micro-batch and SFT micro-batch
SHAPES = [
    ("cpt_b4_s768", 4, 768, 32, 8, 64),
    ("sft_b2_s2048", 2, 2048, 32, 8, 64),
]


def bench_one(name, b, s, hq, hkv, d, group_heads, iters=30):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.bfloat16)

    # each timed fn returns a SCALAR so the host sync is a float() — through the
    # axon tunnel block_until_ready alone does not drain the async queue
    fwd = jax.jit(
        lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, causal=True, group_heads=group_heads).astype(jnp.float32)
        )
    )

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, group_heads=group_heads).astype(jnp.float32))

    def gsum(q, k, v):
        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in g)

    gfn = jax.jit(gsum)

    out = {"shape": name, "group_heads": group_heads}
    for tag, fn, sync in (
        ("fwd", fwd, lambda o: float(o)),
        ("fwd_bwd", gfn, lambda o: float(o)),
    ):
        o = fn(q, k, v)
        sync(o)
        # amortize the ~100 ms tunnel RTT over `iters` queued dispatches
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(iters):
                o = fn(q, k, v)
            sync(o)
            ts.append((time.perf_counter() - t0) / iters)
        out[f"{tag}_ms"] = round(float(np.median(ts)) * 1000, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="*", default=None)
    args = ap.parse_args()
    for name, b, s, hq, hkv, d in SHAPES:
        if args.shapes and name not in args.shapes:
            continue
        for grouped in (False, True):
            try:
                res = bench_one(name, b, s, hq, hkv, d, grouped)
            except Exception as e:
                res = {"shape": name, "group_heads": grouped,
                       "error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
