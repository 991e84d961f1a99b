#!/usr/bin/env python
"""Llama-3.1-8B int8 paged-decode feasibility bench on ONE v5e chip.

BASELINE configs[4] names "stretch to Llama-3-8B". 8B bf16 weights (~16 GB)
exceed v5e HBM (15.75 GB usable), so bf16 single-chip decode is out; weight-only
int8 (~7 GB + bf16 embed/untied lm_head ~2.2 GB) fits with room for a paged KV
pool. This measures that configuration end-to-end through the production paged
engine on the ragged serving workload.

The quantized pytree is STAGED FROM HOST: materializing bf16 8B params on-device
just to quantize them would OOM before the engine ever ran, so the int8 leaves
({"q", "scale"} dicts, the exact layout quantize_layer_weights_int8 produces)
are built in numpy and device_put directly. Engine dispatch is by leaf type
(ssi_tpu/generate/quant.py:matmul), so `quantize=None` + pre-quantized leaves
runs the identical int8 decode graph. Weights are random — this is a
throughput/fit feasibility number, not a quality number (quality gate for int8
is wer_parity on a real checkpoint: artifacts/wer_drive/).

Ref: /root/reference/ssi/llama_configs.py:142-155 (the reference's scale
stretch stops at its 3B singleton); BASELINE.md configs[4].
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

MAX_TOKENS = 256
_QUANT_LEAVES = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def host_int8_params(cfg, seed: int = 0):
    """Build the int8-quantized 8B pytree host-side, staging leaf by leaf."""
    d, f, hd = cfg.embed_dim, cfg.intermediate_dim, cfg.head_dim
    hq, hkv, nl, v = cfg.num_heads, cfg.num_kv_heads, cfg.num_layers, cfg.vocab_size
    rng = np.random.default_rng(seed)

    def q_leaf(shape):
        q = rng.integers(-127, 128, shape, dtype=np.int8)
        scale = np.full((shape[0], 1, shape[2]), (shape[1] ** -0.5) / 127.0, np.float32)
        return {
            "q": jax.device_put(q),
            "scale": jax.device_put(scale).astype(jnp.bfloat16),
        }

    def bf16(shape, scale):
        x = (rng.standard_normal(shape, dtype=np.float32) * scale).astype(np.float32)
        return jax.device_put(x).astype(jnp.bfloat16)

    layers = {
        "attn_norm": jax.device_put(np.ones((nl, d), np.float32)).astype(jnp.bfloat16),
        "mlp_norm": jax.device_put(np.ones((nl, d), np.float32)).astype(jnp.bfloat16),
        "wq": q_leaf((nl, d, hq * hd)),
        "wk": q_leaf((nl, d, hkv * hd)),
        "wv": q_leaf((nl, d, hkv * hd)),
        "wo": q_leaf((nl, hq * hd, d)),
        "w_gate": q_leaf((nl, d, f)),
        "w_up": q_leaf((nl, d, f)),
        "w_down": q_leaf((nl, f, d)),
    }
    return {
        "embed": bf16((v, d), d**-0.5),
        "lm_head": bf16((v, d), d**-0.5),
        "layers": layers,
        "final_norm": jax.device_put(np.ones((d,), np.float32)).astype(jnp.bfloat16),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, nargs="+", default=[16, 24])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from bench_decode import _ragged_workload, measure_hbm_bw
    from ssi_tpu.generate.engine import SamplingParams
    from ssi_tpu.generate.paged_engine import PagedDecodeEngine
    from ssi_tpu.models.configs import MODEL_CONFIGS

    cfg = MODEL_CONFIGS["llama3_1_8b"].copy()
    cfg.n_dsus = 5000
    cfg.modality_tokens = True

    hbm_bw = measure_hbm_bw()
    params = host_int8_params(cfg)
    n_weight_bytes = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
    print(json.dumps({"resident_weight_gb": round(n_weight_bytes / 1e9, 2)}), flush=True)

    prompts, stops = _ragged_workload(cfg)
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS, stop_token_ids=stops)
    max_context = max(len(p) for p in prompts) + MAX_TOKENS

    best_line = None
    for n_slots in args.slots:
        engine = PagedDecodeEngine(
            params, cfg, pad_id=133_006, n_slots=n_slots, max_context=max_context,
        )
        engine.generate_batch(prompts, sp)  # compile + warmup
        best, stats = 0.0, {}
        for _ in range(args.runs):
            t0 = time.perf_counter()
            outs = engine.generate_batch(prompts, sp)
            dt = time.perf_counter() - t0
            total = sum(len(o["token_ids"]) for o in outs)
            if total / dt > best:
                best = total / dt
                stats = dict(engine.last_stats)
        bytes_total = stats.get("weight_bytes", 0.0) + stats.get("kv_bytes", 0.0)
        bound = stats["tokens_out"] / (bytes_total / hbm_bw) if bytes_total else None
        line = {
            "slots": n_slots,
            "int8_tok_s": round(best, 1),
            "bound_tok_s": round(bound, 1) if bound else None,
            "ratio_to_bound": round(bound / best, 2) if bound else None,
            "occupancy": round(stats.get("slot_occupancy", 0.0), 3),
            "tokens": stats.get("tokens_out"),
            "wall_s": round(stats.get("wall_s", 0.0), 3),
        }
        print(json.dumps(line), flush=True)
        if best_line is None or line["int8_tok_s"] > best_line["int8_tok_s"]:
            best_line = line
        del engine

    if args.out and best_line:
        art = {
            "metric": "decode_tokens_per_second_8b_int8_greedy",
            "unit": "tokens/s",
            "value": best_line["int8_tok_s"],
            "detail": {
                "resident_weight_gb": round(n_weight_bytes / 1e9, 2),
                "hbm_bw_gbs": round(hbm_bw / 1e9, 1),
                "note": "random int8 weights (throughput/fit feasibility; bf16 8B does not fit one v5e chip)",
                **best_line,
            },
        }
        with open(args.out, "w") as f:
            json.dump(art, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
