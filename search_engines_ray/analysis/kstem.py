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

# Derivational morphology (KStemmer.java's nessEndings / ityEndings /
# mentEndings / ionEndings are dictionary-validated; with no dictionary
# in this environment the generic rules below are gated by curated
# tables). Two kinds of entries: words the generic strip would mangle
# mapped to themselves (quality, moment, station), and spelling-change
# irregulars the orthographic restore cannot derive (decision->decide,
# security->secure).
_DERIV_EXCEPTIONS = {
    # -ness keeps (dictionary headwords / non-derivational)
    "business": "business", "witness": "witness", "harness": "harness",
    "wilderness": "wilderness", "lioness": "lioness",
    "governess": "governess", "baroness": "baroness",
    # -ment keeps
    "moment": "moment", "comment": "comment", "cement": "cement",
    "segment": "segment", "element": "element", "document": "document",
    "experiment": "experiment", "instrument": "instrument",
    "implement": "implement", "argument": "argument",
    "monument": "monument", "parliament": "parliament",
    "tournament": "tournament", "apartment": "apartment",
    "department": "department", "fragment": "fragment",
    "environment": "environment", "supplement": "supplement",
    "compliment": "compliment", "sentiment": "sentiment",
    "garment": "garment", "ferment": "ferment", "torment": "torment",
    "ailment": "ailment", "pigment": "pigment", "ointment": "ointment",
    # -ment irregular restores
    "measurement": "measure", "management": "manage",
    "requirement": "require", "judgment": "judge", "judgement": "judge",
    "advertisement": "advertise", "acknowledgment": "acknowledge",
    "acknowledgement": "acknowledge",
    # -ity keeps
    "quality": "quality", "velocity": "velocity", "capacity": "capacity",
    "entity": "entity", "identity": "identity", "community": "community",
    "university": "university", "opportunity": "opportunity",
    "city": "city", "gravity": "gravity", "charity": "charity",
    "integrity": "integrity", "celebrity": "celebrity",
    "utility": "utility", "facility": "facility", "humidity": "humidity",
    # -icity words whose base is NOT the -ic adjective (the generic
    # -icity → -ic strip below would mangle them)
    "simplicity": "simple", "multiplicity": "multiple",
    "complicity": "complicity", "felicity": "felicity",
    "duplicity": "duplicity",
    # -ity irregular restores
    "security": "secure", "maturity": "mature", "obscurity": "obscure",
    "purity": "pure", "rarity": "rare", "scarcity": "scarce",
    "clarity": "clear", "brevity": "brief",
    # -ion keeps
    "station": "station", "nation": "nation", "section": "section",
    "session": "session", "mission": "mission", "passion": "passion",
    "fashion": "fashion", "cushion": "cushion", "opinion": "opinion",
    "union": "union", "onion": "onion", "region": "region",
    "religion": "religion", "million": "million", "billion": "billion",
    "version": "version", "vision": "vision", "fiction": "fiction",
    "motion": "motion", "notion": "notion", "lotion": "lotion",
    "potion": "potion", "portion": "portion", "caution": "caution",
    "function": "function", "question": "question",
    "information": "information", "attention": "attention",
    "condition": "condition", "tradition": "tradition",
    "position": "position", "definition": "definition",
    "petition": "petition", "edition": "edition",
    "occasion": "occasion", "illusion": "illusion",
    "dimension": "dimension", "pension": "pension", "mansion": "mansion",
    "observation": "observation", "application": "application",
    "destination": "destination", "situation": "situate",
    # -ation verbs (dictionary-only: the base regained its silent e or
    # lost -ate entirely; the generic rule keeps unknown -ation words)
    "creation": "create", "operation": "operate",
    "generation": "generate", "location": "locate",
    "education": "educate", "relation": "relate", "rotation": "rotate",
    "donation": "donate", "migration": "migrate",
    "vibration": "vibrate", "translation": "translate",
    "calculation": "calculate", "population": "populate",
    "communication": "communicate", "combination": "combine",
    "imagination": "imagine", "examination": "examine",
    "determination": "determine", "coordination": "coordinate",
    "navigation": "navigate", "celebration": "celebrate",
    "cooperation": "cooperate", "preparation": "prepare",
    "separation": "separate", "integration": "integrate",
    "innovation": "innovate", "motivation": "motivate",
    "evaluation": "evaluate", "estimation": "estimate",
    "simulation": "simulate", "optimization": "optimize",
    "provision": "provide",
    # -sion spelling changes (Latin d/de stems)
    "decision": "decide", "division": "divide", "collision": "collide",
    "conclusion": "conclude", "inclusion": "include",
    "exclusion": "exclude", "explosion": "explode",
    "invasion": "invade", "erosion": "erode", "persuasion": "persuade",
    "extension": "extend", "expansion": "expand",
    "comprehension": "comprehend", "suspension": "suspend",
    "admission": "admit", "permission": "permit",
    "transmission": "transmit", "submission": "submit",
    "emission": "emit", "omission": "omit",
}

# tails the generic -ion strip accepts bare (act, adopt, suggest,
# discuss, insert, consult): the stripped stem is itself the base verb
_ION_BARE_TAILS = ("ct", "pt", "st", "ss", "rt", "lt")


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

    # --- derivational (KStemmer nessEndings/ityEndings/mentEndings/
    # ionEndings; dictionary validation approximated by _DERIV_EXCEPTIONS
    # and orthographic gates) ---
    exc = _DERIV_EXCEPTIONS.get(word)
    if exc is not None:
        return exc
    if word.endswith("ness") and len(word) > 6:
        stem = word[:-4]
        if stem.endswith("i"):            # happiness → happy
            return stem[:-1] + "y"
        return stem                       # kindness → kind
    if word.endswith("ment") and len(word) > 6:
        # -ment attaches to the intact base (movement → move keeps its
        # 'e'); the judg-/acknowledg- contractions live in the table
        return word[:-4]
    if word.endswith("ity") and len(word) > 5:
        if word.endswith("ability"):      # availability → available
            return word[:-7] + "able"
        if word.endswith("ibility"):      # possibility → possible
            return word[:-7] + "ible"
        if word.endswith("ivity"):        # activity → active
            return word[:-5] + "ive"
        if word.endswith("icity"):        # electricity → electric,
            return word[:-3]              # ethnicity → ethnic — never
            # through _restore_e, whose ends-with-'c' rule would append
            # 'e' (electrice) — ADVICE r3
        stem = word[:-3]
        if stem.endswith("al"):           # formality → formal
            return stem
        return _restore_e(stem)           # sanity → sane, complex stays
    if word.endswith("ion") and len(word) > 5:
        if word.endswith("ization"):      # organization → organize
            return word[:-7] + "ize"
        if word.endswith("ification"):    # classification → classify
            return word[:-9] + "ify"
        stem = word[:-3]
        # -ation bases are dictionary-only (creation→create but
        # combination→combine, observation→observation): the common
        # ones live in _DERIV_EXCEPTIONS, the rest keep the word
        if not stem.endswith("at"):
            restored = _restore_e(stem)
            if restored != stem:          # confusion → confuse
                return restored
            if stem.endswith(_ION_BARE_TAILS):
                return stem               # action → act, discussion → discuss
        return word                       # unknown base: keep the word

    return word
