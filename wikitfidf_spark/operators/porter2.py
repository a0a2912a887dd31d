"""Pure-Python Porter2 ("Snowball English") stemmer.

The reference stems natural-language corpora with nltk's
``SnowballStemmer(language)`` (textnormalizer.pyx:112-136); for English
that is the Porter2 algorithm.  nltk is not installed in this
container, so this module implements Porter2 from the published
algorithm description (M.F. Porter, "The English (Porter2) stemming
algorithm", snowballstem.org) — the same spec nltk's English stemmer
implements — making real linguistic stemming available in-process with
zero dependencies.  It registers as ``porter2_en`` in
:data:`wikitfidf_spark.operators.stemdict.STEMMERS`, so
``IndexConfig(stemmer="porter2_en")`` flows through the existing
Arrow-lifted (per-batch memoized) stemming path: tf counting, the
stem-reverse dictionary, positions, and de-stemmed exports all agree on
the stemmed vocabulary.

Scale note: the stemmer is a plain ``str -> str`` called under
``column_stemmer``'s batch memoization — per Arrow batch each DISTINCT
token is stemmed once, so the per-row cost on a 100 TB corpus is a dict
hit; the algorithm itself only runs O(distinct tokens per batch) times.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# exceptional forms: stemmed directly, bypassing the steps
_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

# invariant after step 1a
_EXCEPTIONS_1A = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

# step 2 suffix -> replacement, longest-match-first; None = conditional
_STEP2 = (
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", None), ("li", None),
)

_STEP3 = (
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", None),
    ("ical", "ic"), ("ness", ""), ("ful", ""),
)

_STEP4 = (
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
)


def _regions(word: str) -> tuple[int, int]:
    """(R1 start, R2 start).  R1 = after the first non-vowel following
    a vowel (special-cased prefixes per the spec); R2 = same, within
    R1.  Capital Y (consonant-marked y) is a non-vowel."""
    n = len(word)
    if word.startswith(("gener", "arsen")):
        r1 = 5
    elif word.startswith("commun"):
        r1 = 6
    else:
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
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """True if the word ends in a short syllable: a vowel followed by a
    non-vowel other than w, x or Y, preceded by a non-vowel — or a
    vowel at the beginning of the word followed by a non-vowel."""
    n = len(word)
    if n == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if n >= 3:
        return (
            word[-3] not in _VOWELS
            and word[-2] in _VOWELS
            and word[-1] not in _VOWELS
            and word[-1] not in "wxY"
        )
    return False


def porter2_en(word: str) -> str:
    """Stem one lower-case English token per the Porter2 algorithm."""
    if len(word) <= 2:
        return word
    exc = _EXCEPTIONS.get(word)
    if exc is not None:
        return exc
    # step 0: strip a leading apostrophe, then the longest of 's', 's, '
    if word[0] == "'":
        word = word[1:]
    if word.endswith("'s'"):
        word = word[:-3]
    elif word.endswith("'s"):
        word = word[:-2]
    elif word.endswith("'"):
        word = word[:-1]
    if len(word) <= 2:
        return word

    # mark consonant y's as Y (word-initial, or after a vowel)
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)
    # regions are fixed here (suffix edits never move the prefix
    # structure they're defined by — same convention as nltk's
    # implementation of the spec)
    r1, r2 = _regions(word)

    # ---- step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s") and any(c in _VOWELS for c in word[:-2]):
        word = word[:-1]
    if word in _EXCEPTIONS_1A:
        return word

    # ---- step 1b
    if word.endswith(("eedly", "eed")):
        cut = 5 if word.endswith("eedly") else 3
        if len(word) - cut >= r1:
            word = word[: len(word) - cut + 2]  # replace by "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if any(c in _VOWELS for c in stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_short_syllable(word):
                        word += "e"
                break

    # ---- step 1c: y/Y -> i after a non-vowel that isn't the first letter
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # ---- step 2 (longest match; apply only if the match is in R1)
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ogi":
                    if word.endswith("logi"):
                        word = word[:-1]
                elif suf == "li":
                    if len(word) > 2 and word[-3] in _LI_ENDING:
                        word = word[:-2]
                else:
                    word = word[: -len(suf)] + rep
            break

    # ---- step 3 (longest match; in R1; "ative" demands R2)
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if suf == "ative":
                    if len(word) - 5 >= r2:
                        word = word[:-5]
                else:
                    word = word[: -len(suf)] + rep
            break

    # ---- step 4 (longest match; in R2; "ion" also needs s/t before)
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if suf == "ion":
                    if len(word) > 3 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # ---- step 5
    if word.endswith("e") and (
        len(word) - 1 >= r2
        or (len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1]))
    ):
        word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")
