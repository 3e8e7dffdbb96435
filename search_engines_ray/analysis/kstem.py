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
        # boxes→box, dishes→dish, churches→church, kisses→kiss; else keep e
        if stem.endswith(("s", "x", "z", "ch", "sh")):
            return stem
        return stem + "e"
    if word.endswith("s") and not word.endswith(("ss", "us", "is")) and len(word) > 3:
        return word[:-1]

    # --- past tense ---
    if word.endswith("ied") and len(word) > 4:
        return word[:-3] + "y"
    if word.endswith("eed"):
        return word
    if word.endswith("ed") and len(word) > 4:
        stem = word[:-2]
        if stem.endswith("e"):            # agreed handled above; e.g. "freed" len 5
            return stem
        und = _undouble(stem)
        if und != stem:                   # stopped → stop
            return und
        if _cvc(stem):                    # created → create
            return stem + "e"
        return stem

    # --- gerund ---
    if word.endswith("ing") and len(word) > 5:
        stem = word[:-3]
        und = _undouble(stem)
        if und != stem:                   # running → run
            return und
        if _cvc(stem):                    # creating → create
            return stem + "e"
        return stem

    return word
