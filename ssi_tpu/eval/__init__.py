"""Evaluation subsystem: WER + text normalization.

The reference computes WER with HF ``evaluate`` (jiwer) after Whisper English text
normalization (ref: scripts/wer.py:59-73). Neither jiwer nor the standalone
``whisper_normalizer`` package is a dependency here:

- :func:`word_error_rate` is a first-party corpus-level WER (total edit distance /
  total reference words) — the same definition jiwer/evaluate implement.
- :func:`english_normalizer` returns transformers' vendored Whisper
  ``EnglishTextNormalizer``. Divergence note: the British->American spelling
  mapping JSON (normally fetched from the HF hub) is unavailable offline, so
  spelling normalization is a no-op unless a mapping is supplied.
"""

from ssi_tpu.eval.wer import english_normalizer, word_error_rate  # noqa: F401
