#!/usr/bin/env python
"""Repeatable on-hardware check: bf16 resume equivalence on the real TPU.

Runs the full Trainer twice on a tiny real-shape model in bf16 (the training
dtype) on whatever accelerator JAX sees (TPU under axon; CPU if forced):
an 8-step run vs a 4-step run -> save -> fresh-process-equivalent resume -> 4
more steps. The per-step loss streams must match BITWISE — the reference's
definition of correct checkpointing (ref: tests/test_resume_equivalence.py:292),
here re-proven on TPU numerics instead of trusted from round-1 manual notes
(VERDICT r1 item 6).

Usage: python tools/verify_tpu_resume.py   (exit 0 = pass; prints the streams)
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

TOTAL, HALF = 8, 4


def run(model_dir, ckpt_dir, max_steps, training_state=None):
    from tests import helpers
    from ssi_tpu.train import Trainer

    cfg = helpers.base_train_cfg_dict(model_dir, ckpt_dir, kind="sft")
    cfg["dtype"] = "bf16"
    cfg["optimizer"]["mu_dtype"] = "bf16"
    cfg["optimizer"]["nu_dtype"] = "bf16"
    cfg["remat"] = "save_qkv_mlp"
    cfg["max_steps"] = max_steps
    cfg["save_steps"] = HALF
    cfg["eval_steps"] = HALF
    cfg["lr_scheduler"] = None
    if training_state is not None:
        cfg["checkpointer"]["training_state_checkpoint"] = str(training_state)
    t = Trainer(helpers.make_cfg(cfg))
    t.setup()
    losses = []
    t._loss_log = losses
    t.train()
    t.cleanup()
    return losses


def main():
    import datasets as hfd

    import ssi_tpu.data as data_mod
    from tests import helpers

    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0].device_kind})")
    rows = helpers.synthetic_sft_rows(64)
    data_mod.load_hf_dataset = lambda source, **kw: hfd.Dataset.from_list(rows)

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        model_dir = helpers.make_tiny_hf_checkpoint(td / "model")

        full = run(model_dir, td / "full", TOTAL)
        part_a = run(model_dir, td / "int", HALF)
        part_b = run(
            td / "int" / f"step_{HALF}",
            td / "resumed",
            TOTAL,
            training_state=td / "int" / "training_state.msgpack",
        )

        print("full   :", full)
        print("resumed:", part_a + part_b)
        if part_a + part_b != full:
            print("FAIL: bf16 resume loss streams diverge")
            return 1
        print("PASS: bf16 resume equivalence is bitwise on this hardware")
        return 0


if __name__ == "__main__":
    sys.exit(main())
