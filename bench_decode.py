#!/usr/bin/env python
"""Decode throughput benchmark: batched greedy generation at the 1B eval shape.

Not the driver headline metric (bench.py is); measures the generation pipeline
the reference runs through vLLM (batch 8, greedy, max_tokens 256 —
ref: conf/generate.yaml:17,21-31). Prints one JSON line.
"""

import json
import os
import time

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

BATCH = 8
PROMPT_LEN = 200
MAX_TOKENS = 256


def main() -> None:
    from ssi_tpu.generate.engine import DecodeEngine, SamplingParams
    from ssi_tpu.models.configs import configllama3_2_1b
    from ssi_tpu.models.llama3 import init_params

    cfg = configllama3_2_1b.copy()
    cfg.n_dsus = 5000
    cfg.modality_tokens = True

    params = init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    engine = DecodeEngine(params, cfg, pad_id=133_006)
    # no stop tokens: random weights must decode the full budget (worst case)
    sp = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS, stop_token_ids=())

    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, int(n)).tolist() for n in rng.integers(50, PROMPT_LEN, BATCH)]

    outs = engine.generate_batch(prompts, sp)  # compile + warmup
    t0 = time.perf_counter()
    n_runs = 3
    for _ in range(n_runs):
        outs = engine.generate_batch(prompts, sp)
    dt = (time.perf_counter() - t0) / n_runs
    gen_tokens = sum(len(o["token_ids"]) for o in outs)

    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_second_1b_greedy_b8",
                "value": round(gen_tokens / dt, 1),
                "unit": "tokens/s",
                "detail": {"batch": BATCH, "max_tokens": MAX_TOKENS, "seconds_per_batch": round(dt, 2)},
            }
        )
    )


if __name__ == "__main__":
    main()
