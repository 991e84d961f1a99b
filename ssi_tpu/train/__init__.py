"""Training subsystem: functional core (jitted step over a device mesh) + host loop.

Layout:
- :mod:`ssi_tpu.train.geometry` — batch/step/epoch arithmetic (``TrainingGeometry``).
- :mod:`ssi_tpu.train.optimizer` — first-party AdamW with explicit-dtype state.
- :mod:`ssi_tpu.train.lr_schedule` — pure ``step -> lr`` schedules.
- :mod:`ssi_tpu.train.step` — jitted train/eval step builders (grad-accum scan).
- :mod:`ssi_tpu.train.train_utils` — config validation, resume schema, token types.
- :mod:`ssi_tpu.train.metric_logging` — W&B-or-JSONL metric logger.
- :mod:`ssi_tpu.train.trainer` — the host-side Trainer orchestrating it all.
"""

from ssi_tpu.train.geometry import TrainingGeometry  # noqa: F401
from ssi_tpu.train.trainer import Trainer  # noqa: F401
