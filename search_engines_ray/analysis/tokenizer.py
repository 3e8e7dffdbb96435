"""Analyzer chain: tokenize → possessive strip → lowercase → stop → stem.

Mirrors the semantics of the reference chain
(``/root/reference/QryEval/EnglishAnalyzerConfigurable.java:142-165``,
configured at ``QryParser.java:41-48``): StandardTokenizer →
EnglishPossessiveFilter → LowerCaseFilter → StopFilter(Lucene
StandardAnalyzer.STOP_WORDS_SET) → KStem.

Two invariants from the reference that everything downstream depends on
(SURVEY.md §7.4):

* **Gap-preserving positions** — a removed stopword still consumes a
  position slot, and the field length counts it
  (``/root/reference/QryEval/Idx.java:87-90``). ``analyze`` therefore
  returns ``(terms, positions, field_length)`` where ``positions`` may
  have gaps and ``field_length >= len(terms)``.
* **Multi-token words** — the StandardTokenizer splits ``near-death``
  into two tokens (exercised by ``QryParser.java:162-171``): our token
  regex does the same because ``-`` is not a word character.

``simple_tokenize`` is a separate, deliberately DuckDB-reproducible
tokenizer (lowercase ``[a-z0-9]+`` runs) used by the oracle-checked
driver queries, where the SQL side is
``string_split_regex(lower(text), '[^a-z0-9]+')``.
"""

from __future__ import annotations

import re
from typing import Iterable

from .kstem import kstem

# Lucene StandardAnalyzer.STOP_WORDS_SET (the classic 33-word English set),
# referenced via EnglishAnalyzerConfigurable.DefaultSetHolder
# (`EnglishAnalyzerConfigurable.java:64`).
LUCENE_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

# UAX#29 word-break emulation (StandardTokenizer's segmentation rules,
# Lucene standard/StandardTokenizerImpl.jflex):
#  - WB5/8/9/10/13a/13b: letter/digit/underscore runs stay one token
#    (underscore is ExtendNumLet — it JOINS: "foo_bar" is ONE token,
#    and the token text keeps the underscore);
#  - WB6/7 (MidLetter/MidNumLet between letters): "can't" / "can’t"
#    stay one token;
#  - WB11/12 (MidNum/MidNumLet between digits): "3.14" / "1,000" stay
#    one token;
#  - a run of ONLY joiners (e.g. "___") emits no token;
#  - CJK ideographs and hiragana emit ONE TOKEN PER CHARACTER
#    (<IDEOGRAPHIC>/<HIRAGANA>); katakana and hangul stay as runs
#    (WB13 / ALetter).
#  - WB4 (Extend/Format never break): a post-merge pass in
#    _uni_word_tokens absorbs combining marks / Cf characters trailing
#    a word run and fuses runs separated only by them (span text kept,
#    marks included, as Lucene does);
#  - WB15/16: regional-indicator PAIRS are one token (flag emoji), an
#    unpaired trailing RI is its own token (<EMOJI> in Lucene 8's
#    grammar).
# Remaining divergences vs the full UAX#29 table (documented,
# exercised in tests/test_tokenizer_uax29.py): the WB6/7 MidLetter
# lookarounds see the literal preceding character, so a combining mark
# directly before an apostrophe defeats the stay-together rule; non-RI
# emoji (pictographs, ZWJ sequences) are not emitted.
_ASCII_TOKEN_RE = re.compile(
    r"[A-Za-z0-9_]+"
    r"(?:(?<=[A-Za-z])['.](?=[A-Za-z])[A-Za-z0-9_]+"
    r"|(?<=[0-9])[.,](?=[0-9])[A-Za-z0-9_]+)*")
_CJK_CLS = "぀-ゟ㐀-䶿一-鿿豈-﫿"
_RI_LO, _RI_HI = "\U0001F1E6", "\U0001F1FF"
_CJK_RE = re.compile(rf"[{_CJK_CLS}]")
_UNI_TOKEN_RE = re.compile(
    rf"[{_RI_LO}-{_RI_HI}]{{1,2}}"
    rf"|[{_CJK_CLS}]"
    rf"|(?:(?![{_CJK_CLS}])\w)+"
    rf"(?:(?<=[^\W\d_])['’.](?=[^\W\d_])(?:(?![{_CJK_CLS}])\w)+"
    rf"|(?<=[0-9])[.,](?=[0-9])(?:(?![{_CJK_CLS}])\w)+)*",
    re.UNICODE)
_POSSESSIVE_RE = re.compile(r"['’][sS]$")


def _is_extend(c: str) -> bool:
    """UAX#29 WB4 ignorables: Extend (Mn/Me/Mc) and Format (Cf — ZWJ,
    ZWNJ, soft hyphen, bidi controls)."""
    import unicodedata
    return unicodedata.category(c) in ("Mn", "Me", "Mc", "Cf")


def _uni_word_tokens(text: str) -> list[str]:
    """Non-ASCII segmentation: regex word runs + a WB4 post-merge. A
    word token absorbs Extend/Format characters trailing it, and two
    word runs separated only by such characters fuse into one token
    (regex \\w never matches a mark, so the following run then starts
    exactly at the absorbed end). CJK single-char and
    regional-indicator tokens never fuse."""
    out: list[str] = []
    prev_end = -1
    prev_fusable = False
    n = len(text)
    for m in _UNI_TOKEN_RE.finditer(text):
        s, e = m.start(), m.end()
        c0 = text[s]
        fusable = not (_RI_LO <= c0 <= _RI_HI or _CJK_RE.match(c0))
        if fusable:
            while e < n and _is_extend(text[e]):
                e += 1
        if out and prev_fusable and fusable and s == prev_end:
            out[-1] += text[prev_end:e]
        else:
            out.append(text[s:e])
        prev_end = e
        prev_fusable = fusable
    return out


def _word_tokens(text: str) -> list[str]:
    """StandardTokenizer-style segmentation; ASCII fast path (the hot
    indexing case), unicode rules otherwise. Joiner-only runs drop."""
    toks = (_ASCII_TOKEN_RE.findall(text) if text.isascii()
            else _uni_word_tokens(text))
    return [t for t in toks if t.strip("_")]

# DuckDB-reproducible simple tokenizer.
_SIMPLE_RE = re.compile(r"[a-z0-9]+")


def simple_tokenize(text: str) -> list[str]:
    """Lowercase alnum-run tokens; exact mirror of the DuckDB expression
    ``string_split_regex(lower(text), '[^a-z0-9]+')`` minus empties."""
    return _SIMPLE_RE.findall(text.lower())


class Analyzer:
    """Callable, self-contained analyzer with a per-instance stem cache.

    Instantiate once per actor (``__init__`` of a map_batches class) so the
    regex/stop-set/cache setup and the Zipf-friendly stem memoization are
    amortized across batches.
    """

    def __init__(self, stopwords: Iterable[str] | None = None,
                 stem: bool = True, lowercase: bool = True,
                 remove_stopwords: bool = True, simple: bool = False):
        """``simple=True`` switches to the DuckDB-reproducible chain:
        ``[a-z0-9]+`` runs on lowercased text, no stopwords, no stemming,
        dense positions — the mode used for oracle-SQL-checked pipelines."""
        self.stopwords = frozenset(LUCENE_STOP_WORDS if stopwords is None else stopwords)
        self.stem = stem
        self.lowercase = lowercase
        self.remove_stopwords = remove_stopwords
        self.simple = simple
        self._stem_cache: dict[str, str] = {}

    def _stem(self, token: str) -> str:
        s = self._stem_cache.get(token)
        if s is None:
            s = kstem(token)
            self._stem_cache[token] = s
        return s

    def analyze(self, text: str) -> tuple[list[str], list[int], int]:
        """→ (terms, positions, field_length).

        ``positions[i]`` is the 0-based token slot of ``terms[i]``;
        stopwords burn a slot without emitting a term; ``field_length``
        is the total number of slots (stopwords included), matching
        ``Idx.getFieldLength`` semantics (`Idx.java:87-90`).
        """
        if self.simple:
            terms = _SIMPLE_RE.findall(text.lower())
            return terms, list(range(len(terms))), len(terms)
        terms: list[str] = []
        positions: list[int] = []
        pos = 0
        stopwords = self.stopwords
        cache = self._stem_cache
        cache_get = cache.get
        for tok in _word_tokens(text):
            if "'" in tok or "’" in tok:
                tok = _POSSESSIVE_RE.sub("", tok)
                if not tok:
                    continue
            if self.lowercase:
                tok = tok.lower()
            if self.remove_stopwords and tok in stopwords:
                pos += 1
                continue
            if self.stem:
                s = cache_get(tok)
                if s is None:
                    s = kstem(tok)
                    cache[tok] = s
                tok = s
            terms.append(tok)
            positions.append(pos)
            pos += 1
        return terms, positions, pos

    def analyze_query_token(self, token: str) -> list[str]:
        """Analyze a single query token: may expand to several terms
        (``near-death`` → 2) or to none (a stopword) — the behavior the
        query parser needs (`QryParser.java:140-172`)."""
        terms, _, _ = self.analyze(token)
        return terms

    __call__ = analyze


def analyzer_for_mode(mode: str) -> "Analyzer":
    """Build-config/stats ``analyzer`` mode → Analyzer instance:

    - ``"lucene"``        — the full reference chain (stop + KStem)
    - ``"lucene_nostem"`` — reference chain with STEMMER=NONE
      (``EnglishAnalyzerConfigurable.setStemmer(NONE)``; the reference's
      toy index `QryEval/index` was built this way — 'fruits', 'keeps'
      are unstemmed in its term dictionary)
    - ``"simple"``        — DuckDB-reproducible oracle chain
    """
    if mode == "simple":
        return Analyzer(simple=True)
    if mode == "lucene_nostem":
        return Analyzer(stem=False)
    return Analyzer()


_DEFAULT = Analyzer()


def analyze(text: str) -> tuple[list[str], list[int], int]:
    """Module-level convenience using the default chain."""
    return _DEFAULT.analyze(text)
