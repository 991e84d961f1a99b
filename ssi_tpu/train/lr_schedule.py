"""Learning-rate schedules as pure ``step -> lr`` functions.

The reference wraps torch ``LambdaLR`` with a ``last_epoch = global_step - 1``
offset so the first post-resume update uses ``lr_lambda(global_step)``
(ref: ssi/lr_schedule.py:12-33). A functional schedule makes that trivially
correct: the update producing ``global_step N+1`` always uses ``schedule(N)``,
fresh start or resume alike — the off-by-one machinery disappears.
"""

from __future__ import annotations

import logging
import math
from typing import Any, Callable

LOGGER = logging.getLogger(__name__)

Schedule = Callable[[Any], Any]  # step (int or traced int) -> lr (float or traced)


def constant_schedule(base_lr: float) -> Schedule:
    def schedule(step):
        del step
        return base_lr

    return schedule


def cosine_schedule_with_warmup(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    num_cycles: float = 0.5,
) -> Schedule:
    """Linear warmup then cosine decay (torchtune get_cosine_schedule_with_warmup).

    Implemented with jnp so it can be traced inside the jitted train step.
    """
    import jax.numpy as jnp

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup_factor = step / max(1, num_warmup_steps)
        progress = (step - num_warmup_steps) / max(1, num_training_steps - num_warmup_steps)
        cosine_factor = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress)))
        return base_lr * jnp.where(step < num_warmup_steps, warmup_factor, cosine_factor)

    return schedule


def wsd_schedule(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    decay_fraction: float = 0.1,
    min_lr_ratio: float = 0.0,
) -> Schedule:
    """Warmup-Stable-Decay: linear warmup, flat plateau, linear decay tail.

    The reference planned WSD but never built it (ref: plans/Checkpointing -
    Consolidated Plan.md F3). The flat plateau makes `max_steps` extensions
    cheap: unlike cosine, the schedule up to the decay point is independent of
    the final step count.
    """
    import jax.numpy as jnp

    decay_steps = max(1, int(num_training_steps * decay_fraction))
    decay_start = num_training_steps - decay_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warmup_factor = step / max(1, num_warmup_steps)
        decay_progress = jnp.clip((step - decay_start) / decay_steps, 0.0, 1.0)
        decay_factor = 1.0 - (1.0 - min_lr_ratio) * decay_progress
        factor = jnp.where(step < num_warmup_steps, warmup_factor, decay_factor)
        return base_lr * factor

    return schedule


def setup_lr_schedule(cfg: Any, num_training_steps: int) -> Schedule:
    """Build the schedule from config (ref: ssi/lr_schedule.py:12-33 semantics).

    ``cfg.lr_scheduler is None`` -> constant lr (the reference's "no scheduler").
    ``lr_scheduler.type``: ``cosine`` (default) | ``wsd``.
    """
    base_lr = float(cfg.optimizer.lr)
    if cfg.get("lr_scheduler") is None:
        LOGGER.info("No learning rate scheduler configured. Using constant learning rate.")
        return constant_schedule(base_lr)
    kind = cfg.lr_scheduler.get("type", "cosine")
    if kind == "wsd":
        return wsd_schedule(
            base_lr,
            num_warmup_steps=int(cfg.lr_scheduler.num_warmup_steps),
            num_training_steps=int(num_training_steps),
            decay_fraction=float(cfg.lr_scheduler.get("decay_fraction", 0.1)),
            min_lr_ratio=float(cfg.lr_scheduler.get("min_lr_ratio", 0.0)),
        )
    if kind != "cosine":
        raise ValueError(f"Unknown lr_scheduler.type: {kind!r} (expected cosine | wsd)")
    return cosine_schedule_with_warmup(
        base_lr,
        num_warmup_steps=int(cfg.lr_scheduler.num_warmup_steps),
        num_training_steps=int(num_training_steps),
        num_cycles=float(cfg.lr_scheduler.get("num_cycles", 0.5)),
    )
