"""Krovetz-style English stemmer (rule-based approximation).

The reference analyzer uses Lucene's KStemFilter (KSTEM selected at
``/root/reference/QryEval/QryParser.java:47``; chain documented at
``EnglishAnalyzerConfigurable.java:142-165``). True KStem is
dictionary-backed; no such dictionary ships in this environment, so this
module implements the *morphological rule* portion of Krovetz (1993,
"Viewing morphology as an inference process") deterministically:

  - plural → singular   (-ies→y, -es→e-or-drop, -s drop; never -ss/-us)
  - past   → present    (-ied→y, -ed drop with doubled-consonant undo)
  - -ing   → base       (drop, doubled-consonant undo, restore final -e
                          for CVC-shaped stems like ``creating``→``create``)

plus a small built-in exception table for very common irregulars. The
contract that matters engine-wide is *self-consistency*: the index build,
the query parser and the test oracle all call this same function, so
ranked results are rank-identical across the system (SURVEY.md §7.4).

Pure function of its input; safe to memoize per actor (Zipfian token
streams make the cache hit rate ~99%).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")

# Common irregulars + cases where the suffix rules would guess wrong.
_EXCEPTIONS = {
    "is": "is", "was": "was", "has": "has", "does": "does", "goes": "go",
    "did": "did", "done": "done", "been": "been", "were": "were",
    "men": "man", "women": "woman", "children": "child", "feet": "foot",
    "geese": "goose", "teeth": "tooth", "mice": "mouse", "people": "people",
    "this": "this", "his": "his", "its": "its", "during": "during",
    "thing": "thing", "things": "thing", "king": "king", "kings": "king",
    "spring": "spring", "string": "string", "bring": "bring",
    "sing": "sing", "ring": "ring", "wing": "wing", "wings": "wing",
    "being": "being", "morning": "morning", "evening": "evening",
    "something": "something", "nothing": "nothing", "anything": "anything",
    "everything": "everything", "news": "news", "series": "series",
    "species": "species", "analysis": "analysis", "basis": "basis",
    "crisis": "crisis", "axes": "axis", "data": "data", "media": "media",
    "died": "die", "dies": "die", "dying": "die", "lying": "lie",
    "tying": "tie", "used": "use", "using": "use", "uses": "use",
    "makes": "make", "making": "make", "made": "made",
    "takes": "take", "taking": "take", "gives": "give", "giving": "give",
    "having": "have", "coming": "come", "comes": "come",
    "writes": "write", "writing": "write", "sites": "site",
    "creating": "create", "created": "create", "creates": "create",
    "increased": "increase", "increasing": "increase",
    "located": "locate", "locating": "locate",
    # -es plurals of -us/-as base words (the generic rule restores 'e')
    "buses": "bus", "gases": "gas", "viruses": "virus",
    "statuses": "status", "campuses": "campus", "censuses": "census",
    "bonuses": "bonus", "geniuses": "genius", "radiuses": "radius",
    "aliases": "alias", "atlases": "atlas", "canvases": "canvas",
    "biases": "bias", "choruses": "chorus", "circuses": "circus",
    # dictionary-only cases the orthographic rules cannot decide
    "focused": "focus", "focusing": "focus", "focuses": "focus",
    "changed": "change", "changing": "change",
    "managed": "manage", "managing": "manage",
    "engaged": "engage", "engaging": "engage",
    "arranged": "arrange", "arranging": "arrange",
    "challenged": "challenge", "challenging": "challenge",
    "exchanged": "exchange", "exchanging": "exchange",
    "ranged": "range", "ranging": "range",
    "indeed": "indeed", "proceed": "proceed", "succeed": "succeed",
    "exceed": "exceed", "freed": "free",
    "welcomed": "welcome", "welcoming": "welcome",
}


def _consonant(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _consonant(word, i - 1)
    return True


def _cvc(word: str) -> bool:
    """word ends consonant-vowel-consonant (and 2nd C not w/x/y) →
    an ``e`` was probably dropped before -ing/-ed (``creat`` → ``create``)."""
    n = len(word)
    if n < 3:
        return False
    return (
        _consonant(word, n - 1)
        and not _consonant(word, n - 2)
        and _consonant(word, n - 3)
        and word[n - 1] not in "wxy"
    )


def _undouble(word: str) -> str:
    if len(word) >= 2 and word[-1] == word[-2] and _consonant(word, len(word) - 1) \
            and word[-1] not in "lsz":
        return word[:-1]
    return word


def _measure(word: str) -> int:
    """Porter's m(): number of vowel→consonant transitions. Gates the
    CVC e-restore so multi-syllable stems like ``open`` / ``visit``
    don't grow a spurious 'e' (``opened``→``open``, not ``opene``)."""
    m = 0
    prev_v = False
    for i in range(len(word)):
        v = not _consonant(word, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _restore_e(stem: str) -> str:
    """After stripping -ed/-ing: decide whether the base word ended in a
    silent 'e' the suffix consumed. English orthography gives strong
    signals (Krovetz §3 spelling-change rules):

    - stems ending bare ``v``/``u``/``c`` are never words (leave→leav,
      argue→argu, dance→danc);
    - ``rg``/``dg`` clusters likewise (merge, charge, judge);
    - a single ``s``/``z`` after anything but itself (parse, cause,
      raise, amaze — but miss/buzz keep their double letter);
    - CVC shape with Porter measure 1 (move, name, hope);
    - CVC ``-at`` stems = the -ate verb class (update, generate,
      operate) where measure alone would say no.
    """
    # bare 'c' too: -ic bases take -ck- before suffixes (panicked), so a
    # post-strip stem ending 'c' almost always came from -ce (noticed)
    if stem.endswith(("v", "u", "rg", "dg", "c")):
        return stem + "e"
    if (stem.endswith("s") and not stem.endswith("ss")) or \
            (stem.endswith("z") and not stem.endswith("zz")):
        return stem + "e"
    if _cvc(stem) and (_measure(stem) == 1 or stem.endswith("at")):
        return stem + "e"
    return stem


def kstem(word: str) -> str:
    """Stem one lowercase token. Tokens with digits or shorter than 3
    characters pass through unchanged (Krovetz leaves them alone too)."""
    if len(word) < 3 or any(ch.isdigit() for ch in word):
        return word
    exc = _EXCEPTIONS.get(word)
    if exc is not None:
        return exc

    # --- plural ---
    if word.endswith("ies") and len(word) > 4:
        return word[:-3] + "y"
    if word.endswith("es") and len(word) > 3 and not word.endswith("ees"):
        stem = word[:-2]
        # boxes→box, dishes→dish, churches→church, kisses→kiss;
        # else the base kept its 'e' (cases→case, houses→house) — the
        # -us/-as plurals that contradict this live in _EXCEPTIONS
        if stem.endswith(("ss", "x", "zz", "ch", "sh")):
            return stem
        return stem + "e"
    if word.endswith("s") and not word.endswith(("ss", "us", "is")) and len(word) > 3:
        return word[:-1]

    # --- past tense ---
    if word.endswith("ied") and len(word) > 4:
        return word[:-3] + "y"
    if word.endswith("eed"):
        # agreed→agree when the prefix has a vowel-consonant sequence;
        # feed/breed keep their -eed (Porter step 1b; the -eed BASE
        # words proceed/succeed/exceed/indeed live in _EXCEPTIONS)
        if _measure(word[:-3]) > 0:
            return word[:-1]
        return word
    if word.endswith("ed") and len(word) > 4:
        stem = word[:-2]
        if stem.endswith("e"):
            return stem
        und = _undouble(stem)
        if und != stem:                   # stopped → stop
            return und
        return _restore_e(stem)           # created → create, open stays

    # --- gerund ---
    if word.endswith("ing") and len(word) > 5:
        stem = word[:-3]
        und = _undouble(stem)
        if und != stem:                   # running → run
            return und
        return _restore_e(stem)           # leaving → leave, open stays

    return word
