"""End-to-end Trainer tests on the tiny model (CPU, hermetic).

The reference needs a GPU + downloaded model + network for these
(ref: tests/test_trainer_gpu.py:65-253); the registry-based tiny architecture
makes them plain CPU unit tests here.
"""

import numpy as np
import pytest

from tests import helpers


@pytest.fixture()
def trainer(tmp_path, synthetic_data):
    from ssi_tpu.train import Trainer

    model_dir = helpers.make_tiny_hf_checkpoint(tmp_path / "model")
    cfg = helpers.make_cfg(helpers.base_train_cfg_dict(model_dir, tmp_path / "ckpts", kind="sft"))
    t = Trainer(cfg)
    yield t
    t.cleanup()


def test_setup_smoke(trainer):
    trainer.setup()
    assert trainer.state is not None
    assert trainer.geometry.steps_per_epoch > 0
    assert trainer.tokenizer.pad_id > 0
    assert trainer.global_step == 0


def test_single_step_finite_loss_and_param_change(trainer):
    import jax

    trainer.setup()
    before = jax.device_get(trainer.state["params"])
    losses = []
    trainer._loss_log = losses
    trainer.cfg.max_steps = 3  # warmup is 2 steps; step 3 has lr > 0
    trainer.train()
    assert len(losses) == 3
    assert all(np.isfinite(x) for x in losses)
    after = jax.device_get(trainer.state["params"])
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
    )
    assert changed, "optimizer step must change parameters"
    assert trainer.global_step == 3
    assert trainer.consumed_samples == 3 * 2 * 2  # steps * accum * batch_size


def test_dev_loss_finite(trainer):
    trainer.setup()
    dev_loss = trainer._evaluate()
    assert np.isfinite(dev_loss)


def test_full_run_saves_checkpoints(trainer, tmp_path):
    trainer.setup()
    trainer.train()  # 8 steps; save_steps=4 -> step_4, step_8
    ckpt_root = tmp_path / "ckpts"
    assert (ckpt_root / "step_4").is_dir()
    assert (ckpt_root / "step_8").is_dir()
    assert (ckpt_root / "training_state.msgpack").is_file()
    assert (ckpt_root / "metrics.jsonl").is_file()
    # metrics logged per step
    assert len(trainer.metric_logger.history) >= 8
    record = trainer.metric_logger.history[-1]
    assert {"loss", "lr", "tokens_per_second_per_gpu", "tokens_total"} <= set(record)
    # token-type accounting accumulated
    assert trainer.token_type_counts_total["dsu"] > 0
    assert trainer.token_type_counts_total["total"] > 0


def test_token_counts_match_host_computation(trainer):
    """Device-side accounting equals the host reference implementation."""
    from ssi_tpu.train.train_utils import count_token_types

    trainer.setup()
    batch = next(iter(trainer.data_train))
    host_counts = count_token_types(batch["tokens"], trainer.token_type_ranges, trainer.tokenizer.pad_id)

    import jax.numpy as jnp

    from ssi_tpu.train.step import count_token_types_device

    dev_counts = count_token_types_device(jnp.asarray(batch["tokens"]), trainer.token_type_ranges, trainer.tokenizer.pad_id)
    for k, v in host_counts.items():
        assert int(dev_counts[k]) == v


def test_cpt_trainer_runs(tmp_path, synthetic_data):
    from ssi_tpu.train import Trainer

    model_dir = helpers.make_tiny_hf_checkpoint(tmp_path / "model")
    cfg_dict = helpers.base_train_cfg_dict(model_dir, tmp_path / "ckpts", kind="cpt")
    cfg_dict["max_steps"] = 2
    t = Trainer(helpers.make_cfg(cfg_dict))
    t.setup()
    losses = []
    t._loss_log = losses
    t.train()
    t.cleanup()
    assert len(losses) == 2 and all(np.isfinite(x) for x in losses)
