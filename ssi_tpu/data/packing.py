"""Fixed-shape sequence packing for CPT/SFT on TPU.

The reference declares packed-dataset support but never implements it (ref:
ssi/data/__init__.py:69,106 raise NotImplementedError; plans/Feature - Packed
Dataset Support.md). On TPU packing is the *natural* data layout (SURVEY.md §7.1):
fixed-shape packs eliminate padding waste and recompiles, and the attention mask
(segment ids) plus per-segment positions keep the loss semantics identical to the
unpacked case because normalization counts only non-ignored tokens.

``PackedDataset`` greedily packs samples in deterministic dataset order into
``max_seq_len``-length rows. Packing is per-epoch deterministic: ``set_epoch``
re-packs so per-sample RNG (CPT interleaving) still varies across epochs while
resume-by-index stays exact.

Pack layout per row:
- ``tokens``   int32 [S] — concatenated sample tokens, pad_id tail;
- ``labels``   int32 [S] — concatenated labels, ignore_index tail;
- ``segment_ids`` int32 [S] — 1-based segment per sample, 0 on padding;
- ``positions``   int32 [S] — restart at 0 per segment (RoPE-correct), 0 on padding.

The cross-segment label shift is masked inside the loss (train.step.shift_labels_packed).
"""

from __future__ import annotations

import logging
from typing import Any

import numpy as np

from ssi_tpu.constants import CROSS_ENTROPY_IGNORE_IDX

LOGGER = logging.getLogger(__name__)


class PackedDataset:
    """Eagerly pack an indexable token dataset into fixed-length rows.

    Args:
        dataset: indexable dataset yielding ``{"tokens": [...], "labels": [...]}``.
        max_seq_len: pack row length (the static model sequence length).
        pad_id: token padding value.
        split_across_pack: split samples across pack boundaries instead of starting
            a new pack (keeps zero padding between packs; a sample's continuation
            starts a new segment so attention never crosses the boundary).
        drop_long: drop samples longer than ``max_seq_len`` when not splitting
            (False raises instead).
    """

    def __init__(
        self,
        dataset: Any,
        max_seq_len: int,
        pad_id: int,
        split_across_pack: bool = False,
        drop_long: bool = True,
    ) -> None:
        self.dataset = dataset
        self.max_seq_len = int(max_seq_len)
        self.pad_id = int(pad_id)
        self.split_across_pack = split_across_pack
        self.drop_long = drop_long
        self._epoch: int | None = None
        self._packs: list[dict[str, np.ndarray]] = []
        self._ensure_packed(0)

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)
        self._ensure_packed(epoch)

    def _ensure_packed(self, epoch: int) -> None:
        if self._epoch == epoch:
            return
        first_pack = self._epoch is None
        self._epoch = epoch
        self._packs = self._pack_all()
        if first_pack:
            self._target_len = len(self._packs)
        else:
            # Stochastic sample lengths (CPT interleaving) can change the pack count
            # across epochs; training geometry (steps_per_epoch, resume math) requires
            # a constant epoch length, so clamp to the epoch-0 count.
            if len(self._packs) > self._target_len:
                self._packs = self._packs[: self._target_len]
            elif len(self._packs) < self._target_len:
                if not self._packs:
                    raise ValueError(f"Epoch {epoch} packed to zero rows; cannot pad to {self._target_len}")
                base = list(self._packs)
                i = 0
                while len(self._packs) < self._target_len:  # cycle distinct packs, not pack 0
                    self._packs.append(base[i % len(base)])
                    i += 1
        LOGGER.info(
            f"Packed {len(self.dataset)} samples into {len(self._packs)} rows of {self.max_seq_len} "
            f"(epoch {epoch}, split_across_pack={self.split_across_pack})"
        )

    def _pack_all(self) -> list[dict[str, np.ndarray]]:
        s = self.max_seq_len
        packs: list[dict[str, np.ndarray]] = []
        tokens = np.full(s, self.pad_id, np.int32)
        labels = np.full(s, CROSS_ENTROPY_IGNORE_IDX, np.int32)
        segs = np.zeros(s, np.int32)
        pos = np.zeros(s, np.int32)
        fill = 0
        seg_id = 0

        def flush():
            nonlocal tokens, labels, segs, pos, fill, seg_id
            if fill > 0:
                packs.append({"tokens": tokens, "labels": labels, "segment_ids": segs, "positions": pos})
            tokens = np.full(s, self.pad_id, np.int32)
            labels = np.full(s, CROSS_ENTROPY_IGNORE_IDX, np.int32)
            segs = np.zeros(s, np.int32)
            pos = np.zeros(s, np.int32)
            fill = 0
            seg_id = 0

        n = len(self.dataset)
        for idx in range(n):
            sample = self.dataset[idx]
            tk = np.asarray(sample["tokens"], np.int32)
            lb = np.asarray(sample["labels"], np.int32)
            if len(tk) > s and not self.split_across_pack:
                if self.drop_long:
                    LOGGER.warning(f"Dropping sample {idx}: length {len(tk)} > max_seq_len {s}")
                    continue
                raise ValueError(f"Sample {idx} length {len(tk)} exceeds max_seq_len {s}")
            offset = 0
            while offset < len(tk):
                space = s - fill
                take = min(space, len(tk) - offset)
                if take < len(tk) - offset and not self.split_across_pack:
                    flush()
                    continue
                seg_id += 1
                tokens[fill : fill + take] = tk[offset : offset + take]
                labels[fill : fill + take] = lb[offset : offset + take]
                segs[fill : fill + take] = seg_id
                # positions restart per segment: a split continuation is a fresh
                # segment (attention cannot see its severed prefix, so restarting
                # RoPE positions keeps the geometry self-consistent)
                pos[fill : fill + take] = np.arange(take, dtype=np.int32)
                fill += take
                offset += take
                if fill == s:
                    flush()
        flush()
        return packs

    def __len__(self) -> int:
        return len(self._packs)

    def __getitem__(self, index: int) -> dict[str, np.ndarray]:
        return self._packs[int(index)]


def padded_collate_packed(batch: list[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    """Stack fixed-length packs into [B, S] arrays (no padding needed)."""
    return {key: np.stack([row[key] for row in batch]) for key in ("tokens", "labels", "segment_ids", "positions")}
