import pytest

from search_engines_ray.query.parser import QueryParseError, QueryParser
from search_engines_ray.query.plan import (
    IopNode, ScoreNode, SopNode, TermNode, plan_repr,
)


@pytest.fixture(scope="module")
def p():
    return QueryParser()


def test_default_op_wrap(p):
    plan = p.parse("apple pie", default_op="#sum")
    assert isinstance(plan, SopNode) and plan.op == "sum"
    assert [a.child.term for a in plan.args] == ["apple", "pie"]
    assert all(isinstance(a, ScoreNode) for a in plan.args)


def test_field_suffix(p):
    plan = p.parse("apple.title", default_op="#or")
    # single-arg op collapses (QryParser.java:224-261)
    assert isinstance(plan, TermNode)
    assert plan.term == "apple" and plan.field == "title"


def test_multi_term_token_expands(p):
    plan = p.parse("near-death", default_op="#sum")
    assert isinstance(plan, SopNode)
    assert [a.child.term for a in plan.args] == ["near", "death"]


def test_stopword_only_subquery_pruned(p):
    # '#NEAR/1(of the)' is stopword-only -> removed entirely
    plan = p.parse("#or(apple #near/1(of the))", default_op=None)
    assert isinstance(plan, TermNode) and plan.term == "apple"
    assert p.parse("the of", default_op="#sum") is None


def test_near_window_dist(p):
    plan = p.parse("#near/3(quick fox)")
    assert isinstance(plan, IopNode) and plan.op == "near" and plan.dist == 3
    plan = p.parse("#window/8(quick fox)")
    assert plan.op == "window" and plan.dist == 8


def test_weighted_parsing(p):
    plan = p.parse("#wand( 0.7 apple 0.3 #and( pie crust ) )")
    assert isinstance(plan, SopNode) and plan.op == "wand"
    assert plan.weights == [0.7, 0.3]
    # multi-term token under a weighted op: weight duplicated per arg
    plan = p.parse("#wsum( 0.5 near-death 0.5 experience )")
    assert plan.weights == [0.5, 0.5, 0.5]
    assert len(plan.args) == 3


def test_weighted_stopword_drops_weight(p):
    plan = p.parse("#wand( 0.7 apple 0.3 the )")
    # 'the' vanishes with its weight; single arg collapses
    assert isinstance(plan, TermNode) and plan.term == "apple"


def test_score_insertion_and_iop_nesting(p):
    plan = p.parse("#sum(#near/1(apple pie) crust)")
    assert isinstance(plan.args[0], ScoreNode)
    assert isinstance(plan.args[0].child, IopNode)
    assert isinstance(plan.args[1], ScoreNode)
    assert isinstance(plan.args[1].child, TermNode)


def test_sdm_shape(p):
    q = ("#wand( 0.7 #and( apple pie ) 0.2 #and( #near/1( apple pie ) ) "
         "0.1 #and( #window/8( apple pie ) ) )")
    plan = p.parse(q)
    assert plan.op == "wand" and len(plan.args) == 3
    assert plan_repr(plan).startswith("#wand(0.7 #and(")


def test_errors(p):
    with pytest.raises(QueryParseError):
        p.parse("#bogus(a b)")
    with pytest.raises(QueryParseError):
        p.parse("#and(a b")            # unclosed
    with pytest.raises(QueryParseError):
        p.parse("#wand(a b)")          # missing weights
    with pytest.raises(QueryParseError):
        p.parse("#near/1(apple.title pie)")   # mixed fields under Iop


def test_field_mismatch_same_field_ok(p):
    plan = p.parse("#near/2(apple.title pie.title)")
    assert plan.field_name == "title"


def test_sdm_generator(p):
    from search_engines_ray.query.sdm import sdm_query
    q = sdm_query("fast sort merge")
    assert q.startswith("#wand ( 0.7 #and( fast sort merge )")
    assert "#near/1( fast sort )" in q and "#near/1( sort merge )" in q
    assert "#window/8( fast sort )" in q
    # generated queries must parse under Indri
    plan = p.parse(q)
    assert plan is not None
    assert sdm_query("single") == "single"
    fq = sdm_query("a b c", full=True)
    assert "#near/1( a c )" in fq


def test_phrase_sugar(p):
    # quoted phrase = #NEAR/1 over the analyzed terms
    plan = p.parse('"apple pie"')
    assert isinstance(plan, IopNode) and plan.op == "near" and plan.dist == 1
    assert [t.term for t in plan.args] == ["apple", "pie"]
    # stopwords drop inside a phrase like in any multi-term token
    plan = p.parse('"apple of pie"')
    assert [t.term for t in plan.args] == ["apple", "pie"]
    # one surviving term collapses via the optimizer
    plan = p.parse('"the apple"')
    assert isinstance(plan, TermNode) and plan.term == "apple"
    # all-stopword phrase optimizes away
    assert p.parse('"of the"') is None
    # composes under a model default op with implicit #SCORE
    plan = p.parse('"apple pie" cake', default_op="#sum")
    assert isinstance(plan, SopNode) and plan.op == "sum"
    assert isinstance(plan.args[0], ScoreNode)
    assert isinstance(plan.args[0].child, IopNode)
    # markers are literal inside phrases: no wildcard expansion marker
    plan = p.parse('"apple* pie"')
    assert [t.term for t in plan.args] == ["apple", "pie"]


def test_phrase_slop(p):
    # "a b"~n relaxes adjacency to #NEAR/n (in-order sloppy phrase)
    plan = p.parse('"apple pie"~3')
    assert isinstance(plan, IopNode) and plan.op == "near" and plan.dist == 3
    assert [t.term for t in plan.args] == ["apple", "pie"]
    # ~0 clamps to adjacency; a bare trailing ~n composes under ops
    assert p.parse('"apple pie"~0').dist == 1
    plan = p.parse('#sum("apple pie"~2 cake)')
    assert plan.args[0].child.dist == 2
    # non-numeric suffix after the quote is NOT slop (falls to terms)
    plan = p.parse('"apple pie" cake', default_op="#sum")
    assert len(plan.args) == 2


def test_split_negations():
    from search_engines_ray.query.parser import split_negations
    pos, neg = split_negations("dup line -merge -hash")
    assert pos.split() == ["dup", "line"] and neg == ["merge", "hash"]
    # inside parens / phrases: untouched
    pos, neg = split_negations('#wsum(-0.5 a 1.0 b)')
    assert neg == [] and "-0.5" in pos
    pos, neg = split_negations('"a -b" c')
    assert neg == [] and "-b" in pos
    # multi-term token at top level is a term, not a negation
    pos, neg = split_negations("near-death exp")
    assert neg == [] and "near-death" in pos
    # pure-negative query: empty positive part
    pos, neg = split_negations("-merge")
    assert pos.strip() == "" and neg == ["merge"]


def test_phrase_errors(p):
    with pytest.raises(QueryParseError):
        p.parse('"apple pie')            # unclosed quote
    with pytest.raises(QueryParseError):
        p.parse('"apple #near/1(a b)"')  # operator inside phrase


def test_fuzzy_marker(p):
    plan = p.parse("apple~1")
    assert isinstance(plan, TermNode) and plan.term == "apple~1"
    plan = p.parse("apple~")             # bare ~ = Lucene default d=2
    assert plan.term == "apple~2"
    plan = p.parse("apple~2.title")
    assert plan.term == "apple~2" and plan.field == "title"
