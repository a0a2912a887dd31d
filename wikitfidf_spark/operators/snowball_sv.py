"""Snowball Swedish stemmer — dependency-free implementation of the
published algorithm (snowballstem.org/algorithms/swedish/stemmer.html,
the classic revision; public knowledge, implemented from the spec like
:mod:`.porter2`).

The reference stems every Snowball-supported language via nltk
(``/root/reference/internal/textnormalizer/textnormalizer.pyx:112-121``);
this module gives the registry a second full spec implementation next
to Snowball English so multilingual normalization does not depend on
nltk being installed.

Algorithm (three steps over the R1 region):

- vowels: ``a e i o u y ä å ö``
- R1 = region after the first non-vowel following a vowel (null region
  at the word end if none), adjusted so at least 3 letters precede it
- step 1a: delete the longest of the a/e/ad/ade/…/heterna suffix table
  found in R1
- step 1b: else delete a final ``s`` preceded by a "valid s-ending"
  (``b c d f g h j k l m n o p r t v y``; the preceding letter need
  not itself be in R1 — only the ``s`` must)
- step 2: if R1 ends with ``dd gd nn dt gt kt tt``, delete the last
  letter
- step 3: in R1, delete the longest of ``lig ig els``; replace a final
  ``löst``→``lös`` or ``fullt``→``full``
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäåö")

# longest-match-first: sorted by length desc, then lexicographically so
# the scan order (and therefore the result) is deterministic
_STEP1_SUFFIXES = tuple(
    sorted(
        (
            "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade",
            "ande", "arne", "are", "aste", "en", "anden", "aren",
            "heten", "ern", "ar", "er", "heter", "or", "as", "arnas",
            "ernas", "ornas", "es", "ades", "andes", "ens", "arens",
            "hetens", "erns", "at", "andet", "het", "ast",
        ),
        key=lambda s: (-len(s), s),
    )
)

_S_ENDINGS = frozenset("bcdfghjklmnoprtvy")

_STEP2_SUFFIXES = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")

_STEP3_DELETE = ("els", "lig", "ig")  # longest first


def _r1_start(word: str) -> int:
    """Index where R1 begins: after the first non-vowel that follows a
    vowel, floored at 3 (the spec's 'at least 3 letters before R1')."""
    n = len(word)
    for i in range(1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            return max(i + 1, 3)
    return n  # null region


def snowball_sv(word: str) -> str:
    """Stem one lowercase Swedish word per the Snowball spec."""
    if len(word) <= 3:
        return word
    r1 = _r1_start(word)

    # ---- step 1: longest table suffix in R1, else s after an s-ending
    for suf in _STEP1_SUFFIXES:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[: len(word) - len(suf)]
            break
    else:
        if (
            word.endswith("s")
            and len(word) - 1 >= r1
            and len(word) >= 2
            and word[-2] in _S_ENDINGS
        ):
            word = word[:-1]

    # ---- step 2: undouble dd/gd/nn/dt/gt/kt/tt inside R1
    for suf in _STEP2_SUFFIXES:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            word = word[:-1]
            break

    # ---- step 3
    for suf in _STEP3_DELETE:
        if word.endswith(suf) and len(word) - len(suf) >= r1:
            return word[: len(word) - len(suf)]
    if word.endswith("löst") and len(word) - 4 >= r1:
        return word[:-1]
    if word.endswith("fullt") and len(word) - 5 >= r1:
        return word[:-1]
    return word
