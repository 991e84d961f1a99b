"""Word error rate (corpus-level) + Whisper English text normalization."""

from __future__ import annotations

import hashlib
import json
import os
import re
from collections import Counter
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


def spelling_mapping_fingerprint(mapping: dict[str, str] | None = None) -> dict[str, object]:
    """Pin of the vendored spelling map: entry count + sha256 of its canonical JSON.

    Emitted into every WER artifact (scripts/wer.py, scripts/wer_parity.py) so a
    score is attributable to an exact mapping revision — the map is a
    reconstruction of the hub-hosted Whisper asset, and any drift in it shifts
    WER (VERDICT r3: quantify the normalizer-parity residual per run)."""
    if mapping is None:
        mapping = load_spelling_mapping()
    canonical = json.dumps(mapping, sort_keys=True).encode()
    return {
        "spelling_map_entries": len(mapping),
        "spelling_map_sha256": hashlib.sha256(canonical).hexdigest(),
    }


# British-pattern suffix classes the vendored map systematically covers, with
# exception lists of common words that are IDENTICAL in American English (so
# their absence from the map is correct, not a gap). Matching is heuristic by
# design: it exists to bound the residual normalizer divergence per dataset,
# not to be a dialect classifier.
_BRITISH_CLASSES: list[tuple[str, re.Pattern, frozenset]] = [
    (
        "ise",
        re.compile(r"[a-z]{2,}is(?:e|ed|es|er|ers|ing)$|[a-z]{2,}isations?$"),
        frozenset(
            w + s
            for w in (
                "advertise advise arise chastise comprise compromise demise despise "
                "devise disguise excise exercise franchise disenfranchise enfranchise "
                "improvise incise merchandise otherwise paradise premise promise revise "
                "supervise surmise surprise televise enterprise reprise treatise likewise "
                "clockwise counterclockwise anticlockwise sunrise moonrise highrise "
                "expertise concise precise cruise bruise noise poise praise raise "
                "appraise braise chemise valise anise apprise".split()
            )
            for s in ("", "d", "s", "r", "rs")
        )
        | frozenset(
            w + s
            for w in "advertis advis aris chastis compris compromis despis devis disguis "
            "exercis franchis improvis merchandis promis revis supervis surmis surpris "
            "televis cruis brais prais rais apprais".split()
            for s in ("ing",)
        ),
    ),
    ("yse", re.compile(r"[a-z]{2,}ys(?:e|ed|es|ing)$"), frozenset()),
    (
        "our",
        re.compile(r"[a-z]{2,}our(?:s|ed|ing|er|ers|ite|ites|able|ful|fully|hood|al|ally|ism|y)?$"),
        frozenset(
            (
                "hour hours flour flours devour devours devoured devouring detour "
                "detours detoured velour velours amour amours paramour paramours "
                "troubadour troubadours contour contours contoured tambour scour "
                "scours scoured scouring pompadour tour tours toured touring sour "
                "sours soured souring pour pours poured pouring four fours fourth "
                "dour giaour".split()
            )
        ),
    ),
    (
        "re",
        re.compile(r"[a-z]{2,}(?:tre|tres|bre|bres|vre|vres|cre|cres)$"),
        frozenset("acre acres massacre massacres mediocre lucre wiseacre wiseacres involucre".split()),
    ),
    (
        "elled",
        re.compile(r"[a-z]{2,}ell(?:ed|ing|er|ers)$"),
        frozenset(
            w + s
            for w in "comp exp imp prop rep reb exc disp dw sw sm sp y w sh qu f j g missp t "
            "res outs ups forest".split()
            for s in ("elled", "elling", "eller", "ellers")
        ),
    ),
    (
        "ence",
        re.compile(r"^(?:defence|offence|licence|pretence)[a-z]*$"),
        frozenset(),
    ),
    (
        "ogue",
        re.compile(r"[a-z]{2,}ogues?$"),
        frozenset("vogue vogues rogue rogues brogue brogues".split()),
    ),
    (
        "ae-oe",
        re.compile(r"haem|aemia|anaes|gynaec|oestr|oeso|rrhoea|paed|diarrhoe|foet|leuka"),
        frozenset(),
    ),
]


def suspected_unmapped_words(
    texts: Iterable[str], mapping: dict[str, str] | None = None
) -> dict[str, int]:
    """British-looking words in (normalized) ``texts`` that the spelling map
    does NOT cover -> occurrence counts.

    Run on normalizer OUTPUT: any word still matching a British suffix class
    there either passed through the map unmapped (a coverage gap that shifts
    WER vs the reference's hub-hosted map) or is a heuristic false positive —
    both are worth surfacing per run instead of staying unknown.
    """
    if mapping is None:
        mapping = load_spelling_mapping()
    counts: Counter[str] = Counter()
    for text in texts:
        for word in text.split():
            if not word.isalpha() or word in mapping:
                continue
            for _name, pat, exceptions in _BRITISH_CLASSES:
                if pat.search(word) and word not in exceptions:
                    counts[word] += 1
                    break
    return dict(counts.most_common())


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
