"""Word error rate (corpus-level) + Whisper English text normalization."""

from __future__ import annotations

import json
import os
from typing import Callable, Iterable


def _edit_distance(ref: list[str], hyp: list[str]) -> int:
    """Word-level Levenshtein distance (substitution/insertion/deletion cost 1)."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = list(range(m + 1))
    cur = [0] * (m + 1)
    for i in range(1, n + 1):
        cur[0] = i
        r = ref[i - 1]
        for j in range(1, m + 1):
            sub = prev[j - 1] + (r != hyp[j - 1])
            cur[j] = min(sub, prev[j] + 1, cur[j - 1] + 1)
        prev, cur = cur, prev
    return prev[m]


def word_error_rate(references: Iterable[str], hypotheses: Iterable[str]) -> float:
    """Corpus-level WER: sum of word edit distances / total reference words.

    Matches ``evaluate.load("wer").compute(references=..., predictions=...)``
    (jiwer's definition, used by ref: scripts/wer.py:70).
    """
    references = list(references)
    hypotheses = list(hypotheses)
    if len(references) != len(hypotheses):
        raise ValueError(f"Length mismatch: {len(references)} references vs {len(hypotheses)} hypotheses")
    total_edits = 0
    total_words = 0
    for ref, hyp in zip(references, hypotheses):
        ref_words = ref.split()
        hyp_words = hyp.split()
        total_edits += _edit_distance(ref_words, hyp_words)
        total_words += len(ref_words)
    if total_words == 0:
        raise ValueError("Total reference length is zero — WER undefined")
    return total_edits / total_words


def load_spelling_mapping() -> dict[str, str]:
    """Vendored British->American spelling mapping (Whisper's ``english.json`` role).

    The upstream asset (openai/whisper ``english.json``, ~1.7k entries derived from
    the tysto UK-US list) is hub-hosted and unavailable offline, so this is a
    first-party reconstruction (~1k entries) covering the systematic classes
    (-ise/-ize, -yse/-yze, -our/-or, -re/-er, doubled-l inflections, -ence/-ense,
    ae/oe reduction) plus well-attested irregulars. Entries are whole-word,
    lowercase, applied post-tokenization by ``EnglishSpellingNormalizer`` exactly
    as the reference does (ref: scripts/wer.py:61-64).
    """
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "english_spelling.json")
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def english_normalizer(spelling_mapping: dict[str, str] | None = None) -> Callable[[str], str]:
    """Whisper EnglishTextNormalizer (transformers' vendored implementation).

    ref: scripts/wer.py:61-64 uses whisper_normalizer.english.EnglishTextNormalizer;
    transformers ships the identical class. ``spelling_mapping`` (British->American)
    defaults to the vendored :func:`load_spelling_mapping`; pass ``{}`` to disable.
    """
    from transformers.models.whisper.english_normalizer import EnglishTextNormalizer

    if spelling_mapping is None:
        spelling_mapping = load_spelling_mapping()
    return EnglishTextNormalizer(spelling_mapping)
