#!/usr/bin/env python
"""Batched generation over an SFT split (ref: scripts/generate.py:145-191).

Usage: python scripts/generate.py model=/path/to/step_N [data=sft/<name>] [key=value ...]

Auto-resolves n_dsus and the data config from the training-config snapshot next to
the checkpoint when not given explicitly.
"""

import logging
from pathlib import Path
import sys

import yaml

from ssi_tpu.config import compose, load_yaml
from ssi_tpu.constants import SUPPORTED_DATASETS, TRAIN_CONFIG_FILENAME
from ssi_tpu.generate import run_generation

logging.basicConfig(
    format="[%(asctime)s][%(name)s][%(levelname)s] - %(message)s",
    level=logging.INFO,
    stream=sys.stdout,
)

LOGGER = logging.getLogger(__name__)

TEST_CONFIG_GROUPS_SUBDIR = "data/sft"
CONF_DIR = Path(__file__).resolve().parent.parent / "conf"


def main(argv: list[str]) -> None:
    cfg = compose(str(CONF_DIR), "generate", overrides=argv)
    from ssi_tpu.train.metric_logging import configure_hydra_logging

    configure_hydra_logging(cfg)

    train_cfg = None
    if cfg.get("train_yaml") is None:
        # our layout: .../checkpoints/step_N -> snapshot in parents[0] (the checkpoints
        # dir); the reference's epoch_X/global_step_N layout put it at parents[1]
        for parent_idx in (0, 1):
            train_yaml_rundir = Path(cfg.model).parents[parent_idx] / TRAIN_CONFIG_FILENAME
            if train_yaml_rundir.exists():
                train_cfg = load_yaml(train_yaml_rundir)
                LOGGER.warning(f"Loaded training config from {train_yaml_rundir!s}")
                break
    else:
        train_cfg = load_yaml(cfg.train_yaml)

    # Resolve speech.n_dsus: CLI > training config > data config
    if cfg.speech.n_dsus is None:
        if train_cfg and train_cfg.get("speech", {}).get("n_dsus") is not None:
            cfg.speech.n_dsus = train_cfg["speech"]["n_dsus"]
            LOGGER.info(f"Auto-setting cfg.speech.n_dsus to {cfg.speech.n_dsus} from training config.")
        elif cfg.get("data") is not None and cfg.data.get("n_dsus") is not None:
            cfg.speech.n_dsus = cfg.data.n_dsus
            LOGGER.info(f"Auto-setting cfg.speech.n_dsus to {cfg.speech.n_dsus} from data config.")
        else:
            raise ValueError("cfg.speech.n_dsus must be specified via CLI, training config, or data config.")

    # Resolve the data config group from the training dataset if not selected
    if cfg.get("data") is None:
        if train_cfg is None:
            raise RuntimeError("No data config selected and no training config found to infer it from.")
        source = train_cfg["data"]["train"]["dataset"]["source"]
        if "/" not in source or source.count("/") != 1:
            raise RuntimeError(
                f"Cannot infer a data config from training source {source!r} (not an owner/name HF repo id); "
                "select one explicitly, e.g. data=sft/mls-hubert_large_ll60k-layer_22"
            )
        _owner, train_dataset = source.split("/")
        if train_dataset.split("-")[0] not in SUPPORTED_DATASETS:
            raise RuntimeError(f"Unsupported dataset for generation: {train_dataset}")
        cfg_data_path = (CONF_DIR / TEST_CONFIG_GROUPS_SUBDIR / train_dataset).with_suffix(".yaml")
        if not cfg_data_path.exists():
            raise RuntimeError(f"Cannot find test dataset config at {cfg_data_path}.")
        composed = compose(str(CONF_DIR), "generate", overrides=argv + [f"data=sft/{train_dataset}"])
        composed.speech.n_dsus = cfg.speech.n_dsus
        cfg = composed

    run_generation(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
