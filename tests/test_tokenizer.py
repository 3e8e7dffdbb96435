from search_engines_ray.analysis import Analyzer, LUCENE_STOP_WORDS, analyze, simple_tokenize
from search_engines_ray.analysis.kstem import kstem


def test_gap_preserving_positions():
    # "The" and "over"/"the" are stopwords: they burn position slots and
    # count toward field length (reference Idx.java:87-90 semantics).
    terms, pos, flen = analyze("The quick brown fox jumps over the lazy dog")
    assert terms == ["quick", "brown", "fox", "jump", "over", "lazy", "dog"]
    assert pos == [1, 2, 3, 4, 5, 7, 8]
    assert flen == 9


def test_possessive_and_hyphen():
    # StandardTokenizer splits on '-'; possessive filter strips 's
    # (QryParser.java:162-171 relies on multi-token expansion).
    terms, pos, flen = analyze("The Doctor's near-death experience")
    assert terms == ["doctor", "near", "death", "experience"]
    assert pos == [1, 2, 3, 4]
    assert flen == 5


def test_empty_and_stopword_only():
    assert analyze("") == ([], [], 0)
    terms, pos, flen = analyze("the of and to a")
    assert terms == [] and pos == [] and flen == 5


def test_stop_set_is_lucene_standard():
    assert len(LUCENE_STOP_WORDS) == 33
    for w in ("the", "a", "an", "into", "such", "will", "their"):
        assert w in LUCENE_STOP_WORDS
    assert "dog" not in LUCENE_STOP_WORDS


def test_kstem_rules():
    assert kstem("dogs") == "dog"
    assert kstem("cities") == "city"
    assert kstem("boxes") == "box"
    assert kstem("running") == "run"
    assert kstem("stopped") == "stop"
    assert kstem("creating") == "create"
    assert kstem("created") == "create"
    assert kstem("agreed") == "agreed" or kstem("agreed") == "agree"
    assert kstem("glass") == "glass"          # -ss never stripped
    assert kstem("children") == "child"
    assert kstem("x1") == "x1"                # digits pass through
    assert kstem("king") == "king"            # exception: not k+ing


def test_query_token_expansion():
    a = Analyzer()
    assert a.analyze_query_token("near-death") == ["near", "death"]
    assert a.analyze_query_token("the") == []
    assert a.analyze_query_token("Dogs") == ["dog"]


def test_simple_tokenize_matches_duckdb():
    import duckdb
    for text in ("Hello, World 42!", "a-b c_d", "", "ÜBER strasse"):
        sql = duckdb.sql(
            "select list_filter(string_split_regex(lower($t), '[^a-z0-9]+'), "
            "x -> len(x) > 0) as toks", params={"t": text}).fetchone()[0]
        assert simple_tokenize(text) == sql, text


def test_analyzer_deterministic():
    a1, a2 = Analyzer(), Analyzer()
    s = "Dogs running quickly; the cats' toys near-death 42nd"
    assert a1.analyze(s) == a2.analyze(s)
