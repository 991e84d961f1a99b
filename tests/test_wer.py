"""First-party WER + normalizer tests (ref: scripts/wer.py:59-73 behavior)."""

import pytest

from ssi_tpu.eval import english_normalizer, word_error_rate


def test_wer_exact_match():
    assert word_error_rate(["hello world"], ["hello world"]) == 0.0


def test_wer_known_values():
    # 1 substitution over 2 ref words
    assert word_error_rate(["hello world"], ["hello there"]) == pytest.approx(0.5)
    # 1 deletion over 3
    assert word_error_rate(["a b c"], ["a c"]) == pytest.approx(1 / 3)
    # 1 insertion over 2
    assert word_error_rate(["a b"], ["a x b"]) == pytest.approx(0.5)
    # WER can exceed 1.0 (all insertions)
    assert word_error_rate(["a"], ["x y z"]) == pytest.approx(3.0)


def test_wer_corpus_level_pooling():
    # corpus WER pools edits and ref lengths across samples (jiwer semantics),
    # NOT the mean of per-sample WERs
    refs = ["a b c d e f g h i j", "a"]
    hyps = ["a b c d e f g h i j", "x"]
    assert word_error_rate(refs, hyps) == pytest.approx(1 / 11)


def test_wer_empty_hypothesis():
    assert word_error_rate(["a b c"], [""]) == pytest.approx(1.0)


def test_wer_validates_lengths():
    with pytest.raises(ValueError, match="Length mismatch"):
        word_error_rate(["a"], ["a", "b"])
    with pytest.raises(ValueError, match="zero"):
        word_error_rate([""], [""])


def test_whisper_normalizer_canonicalizes():
    normalize = english_normalizer()
    assert normalize("Hello, World!") == "hello world"
    # contractions and abbreviations standardized
    assert normalize("I won't go") == "i will not go"
    assert normalize("Mr. Smith") == "mister smith"
    # numbers normalized to digits
    assert normalize("twenty one dollars") == "$21"


def test_normalized_wer_pipeline():
    normalize = english_normalizer()
    refs = [normalize("Hello, World!")]
    hyps = [normalize("hello world")]
    assert word_error_rate(refs, hyps) == 0.0


def test_spelling_mapping_vendored():
    """The vendored British->American mapping is loaded by default and applied
    whole-word after normalization (VERDICT r1 item 4)."""
    from ssi_tpu.eval import load_spelling_mapping

    mapping = load_spelling_mapping()
    assert len(mapping) > 900
    # whole-word, lowercase, non-identity entries only
    assert all(k == k.lower() and " " not in k and k != v for k, v in mapping.items())

    normalize = english_normalizer()
    # differential fixtures: frozen expected outputs of the full normalizer
    fixtures = [
        ("The colour of the theatre was analysed.", "the color of the theater was analyzed"),
        ("My neighbour's behaviour was marvellous!", "my neighbor is behavior was marvelous"),
        ("He travelled to the centre to practise.", "he traveled to the center to practice"),
        ("A grey aluminium tyre on the kerb.", "a gray aluminum tire on the curb"),
        ("They organised a programme for the labourers.", "they organized a program for the laborers"),
        # words that must NOT be touched (substring traps for the -our class)
        ("four hours on tour", "4 hours on tour"),
        ("this is ours", "this is ours"),
    ]
    for raw, expected in fixtures:
        assert normalize(raw) == expected

    # spelling can be disabled by passing an explicit empty mapping
    plain = english_normalizer({})
    assert plain("colour") == "colour"
