"""Snowball German stemmer — dependency-free implementation of the
published algorithm (snowballstem.org/algorithms/german/stemmer.html,
the classic revision; public knowledge, implemented from the spec like
:mod:`.porter2` and :mod:`.snowball_sv`).

The reference stems every Snowball-supported language via nltk
(``/root/reference/internal/textnormalizer/textnormalizer.pyx:112-121``);
this module gives the registry a third full spec implementation so
multilingual normalization does not depend on nltk being installed.

Algorithm:

- prelude: replace ``ß`` → ``ss``; mark ``u``/``y`` between vowels as
  consonants (uppercased internally so the region scans skip them)
- vowels: ``a e i o u y ä ö ü``
- R1 = region after the first non-vowel following a vowel; R2 = the
  same rule applied inside R1.  R2 is computed from the UNadjusted R1;
  R1 is then adjusted so at least 3 letters precede it
- step 1 (longest match of the whole table, then the region test —
  German's ``[substring] R1 among`` form tests R1 AFTER the longest
  match is chosen, unlike Swedish's setlimit form which retries):
  ``em ern er`` → delete in R1; ``e en es`` → delete in R1, then a
  trailing ``niss`` drops its final s; ``s`` → delete in R1 when
  preceded by a valid s-ending (``b d f g h k l m n r t``)
- step 2: ``en er est`` → delete in R1; ``st`` → delete in R1 when
  preceded by a valid st-ending (s-endings minus ``r``) itself
  preceded by at least 3 letters
- step 3 (d-suffixes, all region tests in R2 unless noted):
  ``end ung`` → delete, then ``ig`` not preceded by ``e`` → delete;
  ``ig ik isch`` not preceded by ``e`` → delete;
  ``lich heit`` → delete, then ``er en`` in R1 → delete;
  ``keit`` → delete, then ``lich ig`` → delete
- postlude: unmark ``U``/``Y``; strip umlauts ``ä ö ü`` → ``a o u``
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäöü")
_S_ENDINGS = frozenset("bdfghklmnrt")
_ST_ENDINGS = frozenset("bdfghklmnt")

_STEP1 = ("ern", "em", "er", "en", "es", "e", "s")  # longest first
_STEP2 = ("est", "en", "er", "st")
_STEP3 = ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik")

_POSTLUDE = str.maketrans({"U": "u", "Y": "y", "ä": "a", "ö": "o", "ü": "u"})


def _prelude(word: str) -> str:
    """ß → ss, then mark u/y standing between vowels as consonants.
    Neighbor vowel-ness is judged on the pre-marking string (the spec
    substitutes all eligible positions simultaneously)."""
    word = word.replace("ß", "ss")
    chars = list(word)
    for i in range(1, len(word) - 1):
        if word[i] in "uy" and word[i - 1] in _VOWELS and word[i + 1] in _VOWELS:
            chars[i] = word[i].upper()
    return "".join(chars)


def _regions(word: str) -> tuple[int, int]:
    """(r1, r2) with r2 derived from the unadjusted r1, then r1 floored
    at 3 (the spec adjusts only R1, after both are set up)."""
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return max(r1, 3), r2


def snowball_de(word: str) -> str:
    """Stem one lowercase German word per the Snowball spec."""
    word = _prelude(word)
    r1, r2 = _regions(word)

    # ---- step 1
    for suf in _STEP1:
        if not word.endswith(suf):
            continue
        if len(word) - len(suf) < r1:
            break  # longest match chosen; region test failed — no retry
        if suf == "s":
            if len(word) >= 2 and word[-2] in _S_ENDINGS:
                word = word[:-1]
        else:
            word = word[: len(word) - len(suf)]
            if suf in ("en", "es", "e") and word.endswith("niss"):
                word = word[:-1]
        break

    # ---- step 2
    for suf in _STEP2:
        if not word.endswith(suf):
            continue
        if len(word) - len(suf) < r1:
            break
        if suf == "st":
            if len(word) >= 6 and word[-3] in _ST_ENDINGS:
                word = word[:-2]
        else:
            word = word[: len(word) - len(suf)]
        break

    # ---- step 3 (d-suffixes)
    for suf in _STEP3:
        if not word.endswith(suf):
            continue
        base = len(word) - len(suf)
        if suf in ("end", "ung"):
            if base >= r2:
                word = word[:base]
                if (
                    word.endswith("ig")
                    and len(word) - 2 >= r2
                    and not word.endswith("eig")
                ):
                    word = word[:-2]
        elif suf in ("ig", "ik", "isch"):
            if base >= r2 and not (base >= 1 and word[base - 1] == "e"):
                word = word[:base]
        elif suf in ("lich", "heit"):
            if base >= r2:
                word = word[:base]
                for s2 in ("er", "en"):
                    if word.endswith(s2) and len(word) - 2 >= r1:
                        word = word[:-2]
                        break
        else:  # keit
            if base >= r2:
                word = word[:base]
                for s2 in ("lich", "ig"):
                    if word.endswith(s2) and len(word) - len(s2) >= r2:
                        word = word[: len(word) - len(s2)]
                        break
        break

    return word.translate(_POSTLUDE)
