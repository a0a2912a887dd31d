"""ISRI Arabic stemmer — dependency-free implementation of the
published algorithm (Kazem Taghva, Rania Elkhoury & Jeffrey Coombs,
"Arabic Stemming Without A Root Dictionary", ITCC 2005; public
knowledge, implemented from the paper like :mod:`.porter2` /
:mod:`.snowball_sv` / :mod:`.snowball_de` implement the Snowball
specs).

The reference routes ``ar`` to nltk's ISRIStemmer
(``/root/reference/internal/textnormalizer/textnormalizer.pyx:112-121``);
this module closes the one normalization behavior that previously had
no in-sandbox implementation — an Arabic corpus indexed unstemmed when
nltk was absent.  Like the Snowball spec stemmers, this implementation
keeps its registry key even when nltk is installed
(``stemdict.register_nltk_stemmers`` only fills missing keys).

Algorithm (paper §3; the numbered "pattern" tables are the paper's):

1. normalize: strip diacritics (tanwīn..sukūn, U+064B–U+0652)
2. function words (a small closed set) are returned unstemmed
3. strip length-3 then length-2 prefixes (وال بال كال ولل; ال لل) —
   only when enough letters remain (≥3 after the strip)
4. strip length-3 then length-2 suffixes (same length floor)
5. strip one leading wāw of a doubled ``وو``
6. normalize initial hamza forms (آ أ إ → ا)
7. words of length ≤3 are roots already; length 4/5/6 words go through
   the pattern tables for their length (each pattern names the
   augmentation letters around a 3- or 4-consonant root and the slice
   that recovers the root); a length-7 word first sheds a length-1
   suffix or prefix and re-enters the length-6 table.  A word matching
   no pattern sheds a length-1 suffix/prefix and re-enters the table
   one size down.

The stemmer never consults a root dictionary — that is the paper's
point — so outputs are *approximate* roots: consistent term-space
compression for retrieval, not lexicography.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------- data
# U+064B..U+0652: fathatan..sukun — the short-vowel/tanwin diacritics
_DIACRITICS = re.compile("[ً-ْ]")
# initial madda/hamza-above/hamza-below alif -> bare alif
_INITIAL_HAMZA = re.compile("^[آأإ]")

_ALIF = "ا"    # ا
_TEH = "ت"     # ت
_MEEM = "م"    # م
_WAW = "و"     # و
_YEH = "ي"     # ي
_NOON = "ن"    # ن
_TEH_MARBUTA = "ة"  # ة
_YEH_HAMZA = "ئ"    # ئ

#: length-3 prefixes (paper Table 1): كال بال ولل وال
_P3 = ("كال", "بال",
       "ولل", "وال")
#: length-2 prefixes: ال لل
_P2 = ("ال", "لل")
#: length-1 prefixes: ل ب ف س و ي ت ن ا
_P1 = ("ل", "ب", "ف", "س", "و",
       "ي", "ت", "ن", "ا")

#: length-3 suffixes: تمل همل تان تين كمل
_S3 = ("تمل", "همل", "تان",
       "تين", "كمل")
#: length-2 suffixes: ون ات ان ين تن كم هن نا يا ها تم كن ني وا ما هم
_S2 = ("ون", "ات", "ان", "ين",
       "تن", "كم", "هن", "نا",
       "يا", "ها", "تم", "كن",
       "ني", "وا", "ما", "هم")
#: length-1 suffixes: ة ه ي ك ت ا ن
_S1 = ("ة", "ه", "ي", "ك", "ت",
       "ا", "ن")

#: function words the algorithm leaves unstemmed (closed-class Arabic
#: particles/auxiliaries; stripping ال/suffixes off these produces
#: garbage two-letter "roots").  In-pipeline these are usually removed
#: by the stopword hook before the stemmer runs; the guard protects
#: standalone analyze()/destem calls.  CURATED guard list: the affix
#: and pattern tables above are the paper's, but the paper does not
#: publish its stop list, so this set is curated (relative pronouns,
#: kāna/ẓalla-family auxiliaries, common connective-fused particles)
#: and may differ at the margins from other ISRI implementations'
#: lists; ``tests/test_stemmer.py`` carries an import-gated diff
#: against nltk's ISRIStemmer for environments that have it.
_FUNCTION_WORDS = frozenset((
    "يكون",          # يكون
    "وليس",          # وليس
    "وكان",          # وكان
    "كذلك",          # كذلك
    "التي",          # التي
    "الذي",          # الذي
    "الذين",    # الذين
    "اللذين",  # اللذين
    "وبين",          # وبين
    "عليها",    # عليها
    "عليه",          # عليه
    "وكانت",    # وكانت
    "ولكن",          # ولكن
    "والتي",    # والتي
    "تكون",          # تكون
    "اليوم",    # اليوم
    "كانت",          # كانت
    "لذلك",          # لذلك
    "هناك",          # هناك
    "منها",          # منها
    "اليها",    # اليها
    "اليه",          # اليه
    "مساء",          # مساء
    "أمام",          # أمام
    "مازال",    # مازال
    "لازال",    # لازال
    "لايزال",  # لايزال
    "مايزال",  # مايزال
    "ولايزال",      # ولايزال
    "مابرح",    # مابرح
    "مافتئ",    # مافتئ
    "ماانفك",  # ماانفك
    "اصبح",          # اصبح
    "أصبح",          # أصبح
    "امسى",          # امسى
    "أمسى",          # أمسى
    "اضحى",          # اضحى
    "أضحى",          # أضحى
    "لاسيما",  # لاسيما
    "الحالي",  # الحالي
))


# ---------------------------------------------------------- affix steps

def _pre32(w: str) -> str:
    """Strip a length-3 prefix (≥3 letters must remain), else a
    length-2 prefix (same floor)."""
    if len(w) >= 6:
        for p in _P3:
            if w.startswith(p):
                return w[3:]
    if len(w) >= 5:
        for p in _P2:
            if w.startswith(p):
                return w[2:]
    return w


def _suf32(w: str) -> str:
    if len(w) >= 6:
        for s in _S3:
            if w.endswith(s):
                return w[:-3]
    if len(w) >= 5:
        for s in _S2:
            if w.endswith(s):
                return w[:-2]
    return w


def _waw(w: str) -> str:
    """Strip the connective wāw of a doubled initial ``وو``."""
    if len(w) >= 4 and w[:2] == _WAW + _WAW:
        return w[1:]
    return w


def _suf1(w: str) -> str:
    for s in _S1:
        if w.endswith(s):
            return w[:-1]
    return w


def _pre1(w: str) -> str:
    for p in _P1:
        if w.startswith(p):
            return w[1:]
    return w


# ------------------------------------------------------- pattern tables

def _pro_w4(w: str) -> str:
    """Length-4 patterns over a 3-letter root (paper: مفعل فاعل فعال
    فعول فعيل فعلة); no match → shed a 1-letter suffix, then prefix."""
    if w[0] == _MEEM:                       # مفعل
        return w[1:]
    if w[1] == _ALIF:                       # فاعل
        return w[0] + w[2:]
    if w[2] in (_ALIF, _WAW, _YEH):         # فعال فعول فعيل
        return w[:2] + w[3]
    if w[3] == _TEH_MARBUTA:                # فعلة
        return w[:3]
    w = _suf1(w)
    if len(w) == 4:
        w = _pre1(w)
    return w


def _pro_w53(w: str) -> str:
    """Length-5 patterns over a 3-letter root.  Each arm names the
    augmentation pattern it recovers the root from; tried in the
    paper's order (more-specific double-letter tests first)."""
    if w[2] in (_ALIF, _TEH) and w[0] == _ALIF:      # افتعل افاعل
        return w[1] + w[3:]
    if w[3] in (_ALIF, _YEH, _WAW) and w[0] == _MEEM:  # مفعول مفعال مفعيل
        return w[1:3] + w[4]
    if w[0] in (_ALIF, _TEH, _MEEM) and w[4] == _TEH_MARBUTA:  # مفعلة تفعلة افعلة
        return w[1:4]
    if w[0] in (_MEEM, _YEH, _TEH) and w[2] == _TEH:   # مفتعل يفتعل تفتعل
        return w[1] + w[3:]
    if w[0] in (_MEEM, _TEH) and w[2] == _ALIF:        # مفاعل تفاعل
        return w[1] + w[3:]
    if w[2] in (_ALIF, _WAW) and w[4] == _TEH_MARBUTA:  # فعولة فعالة
        return w[:2] + w[3]
    if w[0] in (_ALIF, _MEEM) and w[1] == _NOON:       # انفعل منفعل
        return w[2:]
    if w[3] == _ALIF and w[0] == _ALIF:                # افعال
        return w[1:3] + w[4]
    if w[4] == _NOON and w[3] == _ALIF:                # فعلان
        return w[:3]
    if w[3] == _YEH and w[0] == _TEH:                  # تفعيل
        return w[1:3] + w[4]
    if w[3] == _WAW and w[1] == _ALIF:                 # فاعول
        return w[0] + w[2] + w[4]
    if w[2] == _ALIF and w[1] == _WAW:                 # فواعل
        return w[0] + w[3:]
    if w[3] == _YEH_HAMZA and w[2] == _ALIF:           # فعائل
        return w[:2] + w[4]
    if w[4] == _TEH_MARBUTA and w[1] == _ALIF:         # فاعلة
        return w[0] + w[2:4]
    if w[4] == _YEH and w[2] == _ALIF:                 # فعالي
        return w[:2] + w[3]
    w = _suf1(w)
    if len(w) == 5:
        w = _pre1(w)
    return w


def _pro_w54(w: str) -> str:
    """Length-5 patterns over a 4-letter root (تفعلل افعلل مفعلل فعللة
    فعالل)."""
    if w[0] in (_ALIF, _TEH, _MEEM):        # تفعلل افعلل مفعلل
        return w[1:]
    if w[4] == _TEH_MARBUTA:                # فعللة
        return w[:4]
    if w[2] == _ALIF:                       # فعالل
        return w[:2] + w[3:]
    return w


def _end_w5(w: str) -> str:
    """Dispatch after the length-5/3-root table by remaining length."""
    if len(w) == 4:
        return _pro_w4(w)
    if len(w) == 5:
        return _pro_w54(w)
    return w


def _pro_w6(w: str) -> str:
    """Length-6 patterns over a 3-letter root (استفعل مستفعل مفعالة
    افتعال افعوعل تفاعيل)."""
    if w.startswith("است") or w.startswith("مست"):
        return w[3:]                        # استفعل مستفعل
    if w[0] == _MEEM and w[3] == _ALIF and w[5] == _TEH_MARBUTA:
        return w[1:3] + w[4]                # مفعالة
    if w[0] == _ALIF and w[2] == _TEH and w[4] == _ALIF:
        return w[1] + w[3] + w[5]           # افتعال
    if w[0] == _ALIF and w[3] == _WAW and w[2] == w[4]:
        return w[1] + w[4:]                 # افعوعل
    if w[0] == _TEH and w[2] == _ALIF and w[4] == _YEH:
        return w[1] + w[3] + w[5]           # تفاعيل
    w = _suf1(w)
    if len(w) == 6:
        w = _pre1(w)
    return w


def _pro_w64(w: str) -> str:
    """Length-6 patterns over a 4-letter root (افعلال متفعلل)."""
    if w[0] == _ALIF and w[4] == _ALIF:     # افعلال
        return w[1:4] + w[5]
    if w.startswith(_MEEM + _TEH):          # متفعلل
        return w[2:]
    return w


def _end_w6(w: str) -> str:
    """Dispatch after the length-6/3-root table by remaining length."""
    if len(w) == 6:
        return _pro_w64(w)
    if len(w) == 5:
        return _end_w5(_pro_w53(w))
    if len(w) == 4:
        return _pro_w4(w)
    return w


# -------------------------------------------------------------- driver

def stem(word: str) -> str:
    """Stem one Arabic token to its approximate root."""
    w = _DIACRITICS.sub("", word)
    if w in _FUNCTION_WORDS:
        return w
    w = _pre32(w)
    w = _suf32(w)
    w = _waw(w)
    w = _INITIAL_HAMZA.sub(_ALIF, w)
    n = len(w)
    if n == 4:
        return _pro_w4(w)
    if n == 5:
        return _end_w5(_pro_w53(w))
    if n == 6:
        return _end_w6(_pro_w6(w))
    if n == 7:
        w = _suf1(w)
        if len(w) == 7:
            w = _pre1(w)
        if len(w) == 6:
            return _end_w6(_pro_w6(w))
    return w
