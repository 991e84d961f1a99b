#!/usr/bin/env python
"""Perf sweep over (micro-batch, accum, remat policy, CE chunk) at the headline
CPT workload (49,152-token optimizer window, 1B extended-vocab, bf16).

Each config is compiled and timed on the real TPU; results print as JSONL so a
run can be tailed/interrupted. Use --only to run a subset by name.
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

SEQ = 768
WINDOW_TOKENS = 4 * 16 * SEQ  # 49,152 — the reference default (bs16 x accum4)

# name: (batch, accum, remat, chunk)
CONFIGS = {
    "baseline_b16a4_full": (16, 4, "full", 1024),
    "b16a4_save_qkv": (16, 4, "save_qkv", 1024),
    "b8a8_save_qkv": (8, 8, "save_qkv", 1024),
    "b4a16_save_qkv_mlp": (4, 16, "save_qkv_mlp", 1024),
    "b4a16_save_qkv_mlp_c3072": (4, 16, "save_qkv_mlp", 3072),
    "b8a8_save_qkv_mlp": (8, 8, "save_qkv_mlp", 2048),
    "b8a8_save_mlp": (8, 8, "save_mlp", 2048),
    "b4a16_none": (4, 16, "none", 3072),
    "b2a32_save_qkv_mlp_c1536": (2, 32, "save_qkv_mlp", 1536),
    "b2a32_none_c1536": (2, 32, "none", 1536),
    "b8a8_save_qkv_c3072": (8, 8, "save_qkv", 3072),
    "b4a16_save_mlp_c3072": (4, 16, "save_mlp", 3072),
}


def run_one(name, batch, accum, remat, chunk, warmup=2, steps=6):
    from ssi_tpu.models.configs import configllama3_2_1b
    from ssi_tpu.models.llama3 import init_params
    from ssi_tpu.parallel import batch_sharding, make_mesh, param_shardings, replicated, shard_params
    from ssi_tpu.train.lr_schedule import cosine_schedule_with_warmup
    from ssi_tpu.train.optimizer import AdamWConfig, init_opt_state
    from ssi_tpu.train.step import make_train_step

    assert batch * accum * SEQ == WINDOW_TOKENS, (batch, accum)
    cfg = configllama3_2_1b.copy()
    cfg.n_dsus = 5000
    cfg.modality_tokens = True

    mesh = make_mesh(tp=1)
    params = init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    params = shard_params(mesh, params)
    opt_cfg = AdamWConfig(mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16)
    opt_state = jax.jit(
        lambda p: init_opt_state(p, opt_cfg),
        out_shardings={
            "mu": param_shardings(mesh, params),
            "nu": param_shardings(mesh, params),
            "count": replicated(mesh),
        },
    )(params)
    state = {"params": params, "opt_state": opt_state, "step": jnp.zeros((), jnp.int32)}

    schedule = cosine_schedule_with_warmup(2e-4, 1000, 100_000)
    step = make_train_step(
        cfg, opt_cfg, schedule, clip_grad_norm=None, chunk_size=chunk,
        remat=remat, grad_accum_dtype=jnp.bfloat16,
    )

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, (accum, batch, SEQ)).astype(np.int32)
    labels = tokens.copy()
    bsh = batch_sharding(mesh)
    tokens_d = jax.device_put(tokens, bsh)
    labels_d = jax.device_put(labels, bsh)

    t_compile = time.perf_counter()
    for _ in range(warmup):
        state, metrics = step(state, tokens_d, labels_d)
        float(metrics["loss_sum"])  # axon sync
    compile_s = time.perf_counter() - t_compile
    tokens_per_step = int(metrics["num_tokens"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, tokens_d, labels_d)
        float(metrics["loss_sum"])
    dt = time.perf_counter() - t0
    tps = tokens_per_step * steps / dt
    return {"name": name, "batch": batch, "accum": accum, "remat": remat, "chunk": chunk,
            "tokens_per_sec": round(tps, 1), "step_ms": round(dt / steps * 1000, 1),
            "warmup_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None, help="config names to run")
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()
    names = args.only or list(CONFIGS)
    for name in names:
        batch, accum, remat, chunk = CONFIGS[name]
        try:
            res = run_one(name, batch, accum, remat, chunk, steps=args.steps)
        except Exception as e:  # OOM configs are expected — record and continue
            res = {"name": name, "error": f"{type(e).__name__}: {str(e)[:300]}"}
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
