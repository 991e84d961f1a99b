"""Per-sample deterministic RNG properties of the CPT dataset.

Port of the reference property suite (ref: tests/test_cpt_deterministic_rng.py:38-106):
reproducibility, index/epoch sensitivity, order independence, span invariants.
"""

import numpy as np
import pytest

from ssi_tpu.data.cpt import CompletionSequenceType, TextCompletionDataset, get_span_idxs_binomial, interleave
from ssi_tpu.speech import (
    ALIGNMENT_END_TIME_KEY,
    ALIGNMENT_START_TIME_KEY,
    SPEECH_TOKENS_KEY,
    TOKENIZED_KEY,
)
from ssi_tpu.tokenizer import setup_llama3_tokenizer
from tests import helpers

KEYS = {
    "tokenized": TOKENIZED_KEY,
    "t_starts": ALIGNMENT_START_TIME_KEY,
    "t_ends": ALIGNMENT_END_TIME_KEY,
    "speech_tokens": SPEECH_TOKENS_KEY,
}

INTERLEAVE_KW = dict(sampling_rate=16000, downsampling_ratio=320, mean_seq_len_tokens=10.0, binom_prob=0.1, keys=KEYS)


@pytest.fixture()
def dataset(tiny_extended_tokenizer_path, synthetic_data):
    tokenizer, _ = setup_llama3_tokenizer(tiny_extended_tokenizer_path, max_seq_len=256, verbose=False)
    return TextCompletionDataset(
        tokenizer=tokenizer,
        source="synthetic/cpt",
        split="train",
        sequence_type="interleaved",
        deduplicate=True,
        use_modality_tokens=True,
        interleave_kwargs={k: v for k, v in INTERLEAVE_KW.items() if k != "keys"},
    )


def test_reproducible_same_index(dataset):
    assert dataset[3] == dataset[3]


def test_index_sensitivity(dataset):
    assert dataset[3] != dataset[4]


def test_epoch_sensitivity(dataset):
    s0 = dataset[3]
    dataset.set_epoch(1)
    s1 = dataset[3]
    assert s0 != s1


def test_order_independence(dataset):
    """Sample i is identical whether accessed first, last, or alone
    (the property that makes resume skip-ahead exact)."""
    forward = [dataset[i] for i in range(8)]
    backward = [dataset[i] for i in reversed(range(8))][::-1]
    assert forward == backward
    assert dataset[5] == forward[5]


def test_span_idxs_invariants():
    rng = np.random.default_rng(0)
    for seq_len in [1, 2, 5, 50, 500]:
        idxs = get_span_idxs_binomial(10, 0.1, seq_len, rng)
        assert idxs[0] == 0
        assert idxs[-1] == seq_len
        assert all(b > a for a, b in zip(idxs, idxs[1:]))  # strictly increasing


def test_interleave_deterministic_given_rng():
    rows = helpers.synthetic_cpt_rows(1)
    out1 = interleave(rows[0], True, True, rng=np.random.default_rng((1, 0, 0)), **INTERLEAVE_KW)
    out2 = interleave(rows[0], True, True, rng=np.random.default_rng((1, 0, 0)), **INTERLEAVE_KW)
    assert out1 == out2
    out3 = interleave(rows[0], True, True, rng=np.random.default_rng((1, 0, 1)), **INTERLEAVE_KW)
    assert out1 != out3


def test_unsupported_sequence_types(tiny_extended_tokenizer_path, synthetic_data):
    tokenizer, _ = setup_llama3_tokenizer(tiny_extended_tokenizer_path, max_seq_len=256, verbose=False)
    for seq_type in ["dsu_only", "text_only", "alternating"]:
        assert CompletionSequenceType(seq_type)  # declared
        with pytest.raises(ValueError, match="Unsupported sequence type"):
            TextCompletionDataset(
                tokenizer=tokenizer,
                source="synthetic/cpt",
                split="train",
                sequence_type=seq_type,
                deduplicate=True,
                use_modality_tokens=False,
            )
