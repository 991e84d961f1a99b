#!/usr/bin/env python
"""Llama 3.2 3B paged-decode bench on one v5e chip (VERDICT r3 item 3).

Same ragged serving workload as bench_decode.py (96 requests, geometric-ish
generation lengths via a 1%-of-vocab stop set) on the 3B registry entry with
random bf16 weights. bf16 weights are ~6.4 GB; the KV pool at 28 layers x
8 kv-heads x 128 head-dim is ~115 KB/token, so the slot count is the HBM
knob: --slots 32 keeps pool+weights+workspace inside 16 GB with headroom.

bf16 and int8 run in SEPARATE child processes: at 3B the bf16 engine's
allocation churn (three 96-request generate_batch passes with donated pool
buffers) fragments the 16 GB heap enough that a subsequently-built int8 engine
OOMs at its first decode dispatch even though its resident set (~8 GB) fits —
a fresh process per mode removes allocator history from the measurement.
Greedy outputs are deterministic, so cross-process int8-vs-bf16 sequence
agreement is computed from dumped token streams.

Prints one JSON line: bf16 + int8 tok/s with the measured roofline
(bench_decode.measure_hbm_bw triad, RTT-corrected).
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_TOKENS = 256
N_RAGGED = 96
CHUNK = 16


def run_mode(mode: str, args) -> dict:
    """One engine mode in THIS process; returns the result dict."""
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    import numpy as np

    from bench_decode import _ragged_workload, measure_hbm_bw
    from ssi_tpu.generate.engine import SamplingParams
    from ssi_tpu.generate.paged_engine import PagedDecodeEngine
    from ssi_tpu.models.configs import configllama3_2_3b
    from ssi_tpu.models.llama3 import init_params

    cfg = configllama3_2_3b.copy()
    cfg.n_dsus = 5000
    cfg.modality_tokens = True

    hbm_bw = measure_hbm_bw()
    # Stage the 6.4 GB bf16 tree on HOST: the int8 engine's quantized copy +
    # KV pools + a live device bf16 tree do not co-fit in 16 GB HBM. The
    # device copy is dropped once the engine has derived what it needs.
    params_host = jax.device_get(init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params_host))

    prompts, stops = _ragged_workload(cfg)
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS, stop_token_ids=stops)
    max_context = max(len(p) for p in prompts) + MAX_TOKENS

    params = jax.device_put(params_host)
    engine = PagedDecodeEngine(
        params, cfg, pad_id=133_006, n_slots=args.slots,
        max_context=max_context, quantize=None if mode == "bf16" else mode,
    )
    del params  # int8: the engine holds only the quantized tree; free the bf16 one
    outs = engine.generate_batch(prompts, sp)  # compile + warmup
    best, stats, total = 0.0, {}, 0
    for _ in range(args.runs):
        t0 = time.perf_counter()
        outs = engine.generate_batch(prompts, sp)
        dt = time.perf_counter() - t0
        total = sum(len(o["token_ids"]) for o in outs)
        if total / dt > best:
            best = total / dt
            stats = dict(engine.last_stats)

    bytes_total = stats.get("weight_bytes", 0.0) + stats.get("kv_bytes", 0.0)
    roof = {}
    if bytes_total and stats.get("wall_s"):
        bound_tok_s = stats["tokens_out"] / (bytes_total / hbm_bw)
        denom = stats.get("chunk_dispatches", 0) * CHUNK * args.slots
        roof = {
            "weight_gb": round(stats["weight_bytes"] / 1e9, 2),
            "kv_gb": round(stats["kv_bytes"] / 1e9, 2),
            "bound_tok_s": round(bound_tok_s, 1),
            "ratio_to_bound": round(bound_tok_s / best, 2),
            "occupancy": round(stats["tokens_out"] / denom, 3) if denom else None,
            "wall_s": round(stats["wall_s"], 3),
        }
    return {
        "mode": mode,
        "tok_s": round(best, 1),
        "tokens": total,
        "n_params": n_params,
        "hbm_bw_gbs": round(hbm_bw / 1e9, 1),
        "roofline": roof,
        "toks": [o["token_ids"] for o in outs],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--skip-bf16", action="store_true")
    ap.add_argument("--mode", choices=["bf16", "int8"], default=None,
                    help="(internal) run one mode in-process and print its raw dict")
    args = ap.parse_args()

    if args.mode:
        print(json.dumps(run_mode(args.mode, args)), flush=True)
        return

    results = {}
    for mode in (["int8"] if args.skip_bf16 else ["bf16", "int8"]):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--mode", mode,
             "--slots", str(args.slots), "--runs", str(args.runs)],
            capture_output=True, text=True,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(f"{mode} child failed (rc={proc.returncode})")
        results[mode] = json.loads(proc.stdout.strip().splitlines()[-1])

    first = next(iter(results.values()))
    out = {
        "metric": "decode_tokens_per_second_3b_greedy",
        "unit": "tokens/s",
        "value": results.get("bf16", first)["tok_s"],
        "detail": {
            "n_params": first["n_params"],
            "slots": args.slots,
            "hbm_bw_gbs": first["hbm_bw_gbs"],
        },
    }
    if "bf16" in results:
        out["detail"]["paged_bf16_ragged"] = results["bf16"]["tok_s"]
        out["detail"]["ragged_tokens"] = results["bf16"]["tokens"]
        out["detail"]["roofline_bf16"] = results["bf16"]["roofline"]
    if "int8" in results:
        out["detail"]["paged_int8_ragged"] = results["int8"]["tok_s"]
        out["detail"]["roofline_int8"] = results["int8"]["roofline"]
    if "bf16" in results and "int8" in results:
        pairs = list(zip(results["bf16"]["toks"], results["int8"]["toks"]))
        out["detail"]["int8_exact_sequence_agreement"] = round(
            sum(a == b for a, b in pairs) / len(pairs), 3
        )
        out["detail"]["int8_vs_bf16"] = round(
            results["int8"]["tok_s"] / results["bf16"]["tok_s"], 2
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
