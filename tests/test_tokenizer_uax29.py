"""UAX#29 tokenizer fidelity fixture (VERDICT r2 #6).

Pins `_word_tokens` (the StandardTokenizer-emulating segmentation in
analysis/tokenizer.py) to documented Lucene StandardTokenizer behavior
(UAX#29 word break, standard/StandardTokenizerImpl.jflex; reference
chain EnglishAnalyzerConfigurable.java:142-165):

  WB5        letter runs                  "hello" -> [hello]
  WB6/7      MidLetter/MidNumLet between letters: ' ’ . glue
             ("can't", "example.com", "U.S.A" stay single tokens)
  WB8-10     digits join letters          "3D", "mp3", "abc123def"
  WB11/12    MidNum/MidNumLet between digits: . , glue ("3.14","1,000")
  WB13       katakana runs stay together
  WB13a/b    underscore (ExtendNumLet) joins and is kept in the token;
             joiner-only runs emit nothing
  CJK        ideographs and hiragana emit one token per character
             (<IDEOGRAPHIC>/<HIRAGANA>)

  WB4        Extend/Format never break: combining marks and Cf chars
             (ZWJ/ZWNJ/soft hyphen) are absorbed into the word token,
             and runs separated only by them fuse (r4)
  WB15/16    regional-indicator PAIRS are one token (flag emoji); an
             unpaired trailing RI stands alone (r4)

DOCUMENTED DIVERGENCES from the full UAX#29 table (not exercised as
expectations): MidLetter context checks see the literal preceding
character (a combining mark directly before an apostrophe defeats the
glue rule); non-RI emoji (pictographs, ZWJ emoji sequences) are not
emitted; marks trailing a CJK single-char token drop.
"""

from search_engines_ray.analysis.tokenizer import Analyzer, _word_tokens

# (input text, expected token list) — segmentation only (no lowercase /
# stop / stem; those are separate filters tested below and elsewhere).
CASES = [
    # --- plain words / WB5 ---
    ("hello", ["hello"]),
    ("hello world", ["hello", "world"]),
    ("Hello World", ["Hello", "World"]),
    ("x", ["x"]),
    ("a b c", ["a", "b", "c"]),
    # --- apostrophes (MidLetter ' and ’; WB6/7) ---
    ("can't", ["can't"]),
    ("don't", ["don't"]),
    ("won't", ["won't"]),
    ("it's", ["it's"]),
    ("O'Brien", ["O'Brien"]),
    ("O'Brien's", ["O'Brien's"]),
    ("can’t", ["can’t"]),
    ("O’Brien", ["O’Brien"]),
    ("rock 'n roll", ["rock", "n", "roll"]),   # leading ' drops
    ("'quoted'", ["quoted"]),
    ("''", []),
    ("tell 'em", ["tell", "em"]),
    ("y'all", ["y'all"]),
    ("ma'am", ["ma'am"]),
    ("isn't", ["isn't"]),
    ("o''clock", ["o", "clock"]),              # doubled ' breaks (no WB7a chain)
    ("a'b'c", ["a'b'c"]),
    ("end'", ["end"]),                         # trailing ' drops
    ("'start", ["start"]),
    # --- full stop between letters (MidNumLet; WB6/7) ---
    ("example.com", ["example.com"]),
    ("www.example.com", ["www.example.com"]),
    ("U.S.A", ["U.S.A"]),
    ("U.S.", ["U.S"]),                         # trailing . drops
    ("e.g.", ["e.g"]),
    ("i.e.", ["i.e"]),
    ("end.", ["end"]),
    ("a.b.c", ["a.b.c"]),
    ("one. two", ["one", "two"]),              # . before space breaks
    ("one .two", ["one", "two"]),              # . after space breaks
    ("a..b", ["a", "b"]),                      # doubled . breaks
    # --- numbers (MidNum , and MidNumLet . between digits; WB11/12) ---
    ("3.14", ["3.14"]),
    ("1,000", ["1,000"]),
    ("1,000,000", ["1,000,000"]),
    ("10,000.50", ["10,000.50"]),
    ("1.2.3", ["1.2.3"]),
    ("0.5", ["0.5"]),
    ("3,", ["3"]),                             # trailing , drops
    (",3", ["3"]),
    ("1, 2", ["1", "2"]),
    ("1 ,2", ["1", "2"]),
    ("1,,2", ["1", "2"]),                      # doubled , breaks
    ("3.x", ["3", "x"]),                       # . between digit and letter breaks
    ("x.3", ["x", "3"]),
    ("1,x", ["1", "x"]),                       # , glues digits only
    # --- letter/digit transitions (WB9/10) ---
    ("3D", ["3D"]),
    ("mp3", ["mp3"]),
    ("abc123def", ["abc123def"]),
    ("a1.2", ["a1.2"]),                        # digit-side . still glues
    ("1.2a", ["1.2a"]),
    ("B2B", ["B2B"]),
    ("route66", ["route66"]),
    # --- underscore = ExtendNumLet (WB13a/b): joins, kept in token ---
    ("foo_bar", ["foo_bar"]),
    ("x86_64", ["x86_64"]),
    ("_private", ["_private"]),
    ("trailing_", ["trailing_"]),
    ("_x_", ["_x_"]),
    ("a_1", ["a_1"]),
    ("___", []),                               # joiner-only run: no token
    ("_", []),
    ("__ __", []),
    ("snake_case_name", ["snake_case_name"]),
    # --- punctuation breaks (everything not in a WB rule) ---
    ("near-death", ["near", "death"]),
    ("Wi-Fi", ["Wi", "Fi"]),
    ("state-of-the-art", ["state", "of", "the", "art"]),
    ("a/b", ["a", "b"]),
    ("a\\b", ["a", "b"]),
    ("a+b", ["a", "b"]),
    ("a&b", ["a", "b"]),
    ("a@b", ["a", "b"]),                       # no UAX29URLEmail handling
    ("a:b", ["a", "b"]),                       # colon not MidLetter here
    ("a;b", ["a", "b"]),
    ("(parens)", ["parens"]),
    ("[brackets]", ["brackets"]),
    ("semi;colon", ["semi", "colon"]),
    ("tab\tsep", ["tab", "sep"]),
    ("new\nline", ["new", "line"]),
    ("!!!", []),
    ("", []),
    ("   ", []),
    # --- unicode letters stay glued ---
    ("naïve", ["naïve"]),
    ("café", ["café"]),
    ("über", ["über"]),
    ("résumé", ["résumé"]),
    ("Ελληνικά", ["Ελληνικά"]),
    ("русский", ["русский"]),
    ("עברית", ["עברית"]),
    ("العربية", ["العربية"]),
    # --- CJK: ideographs + hiragana one per char; katakana/hangul runs ---
    ("日本語", ["日", "本", "語"]),
    ("中文", ["中", "文"]),
    ("ひらがな", ["ひ", "ら", "が", "な"]),
    ("カタカナ", ["カタカナ"]),
    ("한국어", ["한국어"]),
    ("日本language", ["日", "本", "language"]),
    ("漢字123", ["漢", "字", "123"]),
    ("テスト test", ["テスト", "test"]),
    # --- mixed sentences ---
    ("The U.S. economy grew 3.5% in Q2",
     ["The", "U.S", "economy", "grew", "3.5", "in", "Q2"]),
    ("visit example.com, it's great!",
     ["visit", "example.com", "it's", "great"]),
    ("price: 1,299.99 USD", ["price", "1,299.99", "USD"]),
    ("file_name.txt", ["file_name.txt"]),      # . between letters glues
    ("v2.0.1_beta", ["v2.0.1_beta"]),
    ("foo(bar)baz", ["foo", "bar", "baz"]),
]



# --- WB4 Extend/Format + WB15/16 regional indicators (r4) ---
WB4_RI_CASES = [
    # decomposed combining mark inside a word: runs fuse, span kept
    ("e\u0301tude", ["e\u0301tude"]),
    # trailing mark absorbed into the token
    ("cafe\u0301 x", ["cafe\u0301", "x"]),
    # ZWNJ (Cf) joins two letter runs
    ("ab\u200ccd", ["ab\u200ccd"]),
    # ZWJ (Cf) joins
    ("ab\u200dcd", ["ab\u200dcd"]),
    # soft hyphen (Cf) joins
    ("co\u00adoperate", ["co\u00adoperate"]),
    # marks never start a token
    ("\u0301abc", ["abc"]),
    # RI pair = one flag token; two pairs = two tokens; lone RI stands
    ("\U0001F1FA\U0001F1F8 usa", ["\U0001F1FA\U0001F1F8", "usa"]),
    ("\U0001F1FA\U0001F1F8\U0001F1E9\U0001F1EA",
     ["\U0001F1FA\U0001F1F8", "\U0001F1E9\U0001F1EA"]),
    ("\U0001F1FA x", ["\U0001F1FA", "x"]),
    # RI tokens never fuse with neighboring words through marks
    ("ab\u0301\U0001F1FA\U0001F1F8", ["ab\u0301",
                                         "\U0001F1FA\U0001F1F8"]),
]


def test_uax29_wb4_and_regional_indicators():
    for text, want in WB4_RI_CASES:
        assert _word_tokens(text) == want, (text, _word_tokens(text), want)


def test_uax29_segmentation():
    assert len(CASES) >= 100
    bad = [(t, exp, _word_tokens(t)) for t, exp in CASES
           if _word_tokens(t) != exp]
    assert not bad, f"{len(bad)} divergences: {bad[:10]}"


def test_possessive_filter_curly():
    """EnglishPossessiveFilter strips 's after either apostrophe."""
    an = Analyzer(stem=False, remove_stopwords=False)
    assert an.analyze("O'Brien's")[0] == ["o'brien"]
    assert an.analyze("O’Brien’s")[0] == ["o’brien"]


def test_analyze_number_token_passthrough():
    """Numeric tokens survive the stem filter unchanged (KStem skips
    tokens with digits) and stopword slots still burn positions."""
    an = Analyzer()
    terms, positions, flen = an.analyze("the price is 3.14 dollars")
    assert terms == ["price", "3.14", "dollar"]
    assert positions == [1, 3, 4]
    assert flen == 5
