"""Pure training utilities: config validation, resume schema, token accounting.

Behavioural rebuild of ref: ssi/train_utils.py:37-165 (numpy in place of torch).
"""

from __future__ import annotations

import logging
from typing import Any

import numpy as np

from ssi_tpu.constants import (
    CHECKPOINT_VERSION,
    CHECKPOINT_VERSION_KEY,
    CONSUMED_SAMPLES_KEY,
    CUMULATIVE_METRICS_KEY,
    GLOBAL_STEP_KEY,
    LR_SCHEDULER_KEY,
    OPTIMIZER_KEY,
    RNG_KEY,
    SEED,
    SEED_KEY,
    SUPPORTED_DTYPES,
    TRAINING_HPARAMS_KEY,
)
from ssi_tpu.models.configs import ConfigLlama3_2

LOGGER = logging.getLogger(__name__)


def resolve_n_dsus(cfg: Any) -> None:
    """Copy ``data.n_dsus`` into ``speech.n_dsus`` unless set explicitly
    (ref: ssi/train_utils.py:37-59)."""
    if cfg.speech.n_dsus is not None:
        return  # explicit CLI override takes precedence
    data_n_dsus = cfg.data.get("n_dsus") if cfg.get("data") is not None else None
    if data_n_dsus is not None:
        cfg.speech.n_dsus = data_n_dsus
        LOGGER.info(f"Auto-resolved speech.n_dsus={data_n_dsus} from data config")
    else:
        raise ValueError(
            "speech.n_dsus must be set either via CLI (speech.n_dsus=5000) or "
            "by using a data config that specifies n_dsus."
        )


def validate_train_cfg(cfg: Any) -> None:
    """Structural validation before any setup (ref: ssi/train_utils.py:62-81)."""
    from ssi_tpu.config import missing_keys

    if cfg.speech.n_dsus is None:
        raise ValueError(
            "speech.n_dsus is still null at validation time. Call resolve_n_dsus(cfg) before validate_train_cfg()."
        )

    if cfg.dtype not in SUPPORTED_DTYPES:
        raise ValueError(f"Unsupported dtype: {cfg.dtype}. Supported dtypes: {SUPPORTED_DTYPES}")

    missing = missing_keys(cfg)
    if missing:
        raise ValueError(f"Missing keys in config: {missing}")

    positive_int_fields = ("gradient_accumulation_steps", "max_steps", "log_interval", "eval_steps", "save_steps")
    for field in positive_int_fields:
        if cfg.get(field, 0) <= 0:
            raise ValueError(f"Config field '{field}' must be a positive integer, got: {cfg.get(field)}")

    if cfg.save_steps % cfg.eval_steps != 0:
        raise ValueError(f"save_steps ({cfg.save_steps}) must be a multiple of eval_steps ({cfg.eval_steps})")


def resume_training_state(ckpt_dict: dict[str, Any]) -> dict[str, Any]:
    """Extract and validate resume state from the versioned training-state dict
    (ref: ssi/train_utils.py:84-107)."""
    if CHECKPOINT_VERSION_KEY not in ckpt_dict:
        raise ValueError(
            "Checkpoint predates the versioned schema (no 'checkpoint_version' key). "
            "Legacy checkpoints are not supported. Start a fresh training run."
        )
    ckpt_version = ckpt_dict[CHECKPOINT_VERSION_KEY]
    if ckpt_version != CHECKPOINT_VERSION:
        raise ValueError(
            f"Checkpoint version mismatch: checkpoint has version {ckpt_version}, "
            f"but this code expects version {CHECKPOINT_VERSION}."
        )
    if ckpt_dict[SEED_KEY] != SEED:
        raise ValueError(f"Seed mismatch: config={SEED}, checkpoint={ckpt_dict[SEED_KEY]}")
    return {
        "global_step": ckpt_dict[GLOBAL_STEP_KEY],
        "optimizer_state": ckpt_dict[OPTIMIZER_KEY],
        "lr_scheduler_state": ckpt_dict[LR_SCHEDULER_KEY],
        "rng_state": ckpt_dict[RNG_KEY],
        "training_hparams": ckpt_dict[TRAINING_HPARAMS_KEY],
        "consumed_samples": ckpt_dict[CONSUMED_SAMPLES_KEY],
        "cumulative_metrics": ckpt_dict[CUMULATIVE_METRICS_KEY],
    }


def validate_resume_hparams(
    ckpt_hparams: dict[str, Any],
    current_hparams: dict[str, Any],
    force_resume: bool = False,
) -> None:
    """Refuse resumes that break the step-to-data-position mapping
    (ref: ssi/train_utils.py:110-126)."""
    for key in ("batch_size", "gradient_accumulation_steps", "world_size", "steps_per_epoch"):
        if key in ckpt_hparams and ckpt_hparams[key] != current_hparams[key]:
            msg = (
                f"Training hparam mismatch on resume for '{key}': "
                f"checkpoint={ckpt_hparams[key]}, current={current_hparams[key]}. "
                f"This breaks the step-to-data-position mapping."
            )
            if force_resume:
                LOGGER.warning(msg)
            else:
                raise ValueError(msg)


def get_token_type_ranges(llama_config: ConfigLlama3_2) -> dict[str, tuple[int, int]]:
    """Inclusive vocab-ID ranges per token type (ref: ssi/train_utils.py:129-147).

    Extended-vocab layout: [text | dsu | modality? | special_text].
    """
    base = llama_config.base_vocab_size_txt
    ranges: dict[str, tuple[int, int]] = {
        "text": (0, base - 1),
        "dsu": (base, base + llama_config.n_dsus - 1),
    }
    offset = base + llama_config.n_dsus
    if llama_config.modality_tokens:
        ranges["modality"] = (offset, offset + 1)
        offset += 2
    # special_text includes the padding token (<|finetune_right_pad_id|>)
    ranges["special_text"] = (offset, offset + llama_config.n_special_txt - 1)

    offset += llama_config.n_special_txt
    if offset != llama_config.vocab_size:
        raise ValueError(f"Vocab vs token ranges mismatch: {offset} != {llama_config.vocab_size}")
    if "total" in ranges:
        raise AssertionError('"total" key reserved')
    return ranges


def count_token_types(tokens: np.ndarray, ranges: dict[str, tuple[int, int]], pad_idx: int) -> dict[str, int]:
    """Host-side token-type counts (ref: ssi/train_utils.py:150-165).

    Padding positions are excluded from every range (see
    :func:`ssi_tpu.train.step.count_token_types_device`) so counts are
    padding-policy-invariant.
    """
    tokens = np.asarray(tokens)
    counts = {}
    real = tokens != pad_idx
    for token_type, (start, end) in ranges.items():
        counts[token_type] = int(((tokens >= start) & (tokens <= end) & real).sum())
    counts["total"] = int(real.sum())
    return counts
