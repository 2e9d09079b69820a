"""Basic-graph-pattern matcher tests vs a fresh-Python brute-force
binder (dict-based backtracking over the triple list)."""

import itertools

import pytest

from cello_spark.operators.bgp import match_bgp

TRIPLES = [
    ("c1", "in_nation", "de"),
    ("c2", "in_nation", "de"),
    ("c3", "in_nation", "fr"),
    ("c4", "in_nation", "us"),
    ("s1", "supplies_in", "de"),
    ("s2", "supplies_in", "fr"),
    ("s3", "supplies_in", "us"),
    ("de", "in_region", "europe"),
    ("fr", "in_region", "europe"),
    ("us", "in_region", "america"),
    ("de", "borders", "fr"),
    ("fr", "borders", "de"),
    ("nl", "borders", "nl"),  # self-loop for repeated-var template
]


def _oracle(patterns):
    """All bindings via brute force: try every triple for every slot."""
    results = set()

    def bind(i, env):
        if i == len(patterns):
            results.add(tuple(sorted(env.items())))
            return
        s, p, o = patterns[i]
        for ts, tp, to in TRIPLES:
            e = dict(env)
            ok = True
            for term, val in ((s, ts), (p, tp), (o, to)):
                if term.startswith("?"):
                    v = term[1:]
                    if v in e and e[v] != val:
                        ok = False
                        break
                    e[v] = val
                elif term != val:
                    ok = False
                    break
            if ok:
                bind(i + 1, e)

    bind(0, {})
    return results


@pytest.fixture(scope="module")
def triples_df(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string"
    ).cache()


def _run(triples_df, patterns):
    rows = match_bgp(triples_df, patterns).collect()
    return {tuple(sorted(r.asDict().items())) for r in rows}


def test_join_chain_shared_var(spark, triples_df):
    pats = [
        ("?c", "in_nation", "?n"),
        ("?s", "supplies_in", "?n"),
        ("?n", "in_region", "europe"),
    ]
    assert _run(triples_df, pats) == _oracle(pats)
    # sanity: c1/c2 pair with s1 in de, c3 with s2 in fr
    got = _run(triples_df, pats)
    assert (("c", "c1"), ("n", "de"), ("s", "s1")) in got
    assert len(got) == 3


def test_constant_subject_and_var_pred(spark, triples_df):
    pats = [("de", "?p", "?x")]
    assert _run(triples_df, pats) == _oracle(pats)


def test_repeated_var_in_one_template(spark, triples_df):
    pats = [("?x", "borders", "?x")]
    got = _run(triples_df, pats)
    assert got == _oracle(pats) == {(("x", "nl"),)}


def test_cartesian_when_no_shared_var(spark, triples_df):
    pats = [("?a", "in_region", "europe"), ("?b", "in_region", "america")]
    got = _run(triples_df, pats)
    assert got == _oracle(pats)
    assert len(got) == 2  # {de,fr} x {us}


def test_ask_style_constant_template(spark, triples_df):
    # existence constraint keeps / drops the other bindings wholesale
    keep = _run(
        triples_df,
        [("?n", "in_region", "europe"), ("de", "borders", "fr")],
    )
    assert {dict(t)["n"] for t in keep} == {"de", "fr"}
    drop = _run(
        triples_df,
        [("?n", "in_region", "europe"), ("de", "borders", "us")],
    )
    assert drop == set()


def test_bag_vs_distinct(spark, triples_df):
    # two customers in de -> ?n=de appears twice under bag semantics
    pats = [("?c", "in_nation", "?n")]
    bag = match_bgp(triples_df, pats, distinct=False).select("n").collect()
    assert sorted(r.n for r in bag) == ["de", "de", "fr", "us"]


def test_errors(spark, triples_df):
    with pytest.raises(ValueError):
        match_bgp(triples_df, [])
    with pytest.raises(ValueError):
        match_bgp(triples_df, [("?x", "in_nation")])
    with pytest.raises(ValueError):
        match_bgp(triples_df, [("?", "in_nation", "?x")])


def test_output_column_order_is_first_appearance(spark, triples_df):
    df = match_bgp(
        triples_df,
        [
            ("?c", "in_nation", "?n"),
            ("?s", "supplies_in", "?n"),
            ("?n", "in_region", "europe"),
        ],
    )
    assert df.columns == ["c", "n", "s"]


def test_bgp_over_real_kg_pipeline_output(spark, tmp_path_factory, onto):
    """Integration: query the ACTUAL triple table the KG pipeline
    materializes — (?doc rdf:type ?term)(?term is_a ?parent) must
    reproduce the join of typing triples with ontology edges."""
    from cello_spark.plans.kg import build_kg_pipeline
    from cello_spark.sources.fixtures import (
        make_documents,
        make_model_weights,
        make_thresholds,
    )

    work = str(tmp_path_factory.mktemp("bgp_kg"))
    docs, feats, _ = make_documents(onto, n_docs=80)
    pipe = build_kg_pipeline(
        spark,
        work,
        spark.createDataFrame(docs),
        spark.createDataFrame(feats),
        onto,
        make_model_weights(onto),
        make_thresholds(onto),
    )
    pipe.run()
    triples = pipe.output("triples")
    got = {
        (r.d, r.t, r.p)
        for r in match_bgp(
            triples,
            [("?d", "rdf:type", "?t"), ("?t", "is_a", "?p")],
        ).collect()
    }
    typing = {(r.subj, r.obj) for r in triples.filter("pred = 'rdf:type'").collect()}
    isa = {}
    for r in triples.filter("pred = 'is_a'").collect():
        isa.setdefault(r.subj, set()).add(r.obj)
    want = {
        (d, t, p) for d, t in typing for p in isa.get(t, ())
    }
    assert got == want and len(got) > 0


def test_ask_then_variable_pattern_no_cartesian_warning(spark, triples_df, caplog):
    # an ASK-style constant pattern first, variables second: the
    # crossJoin is against a 1-row existence frame — correct results,
    # and NO spurious cartesian-product warning
    import logging

    with caplog.at_level(logging.WARNING, logger="cello_spark.operators.bgp"):
        got = _run(
            triples_df,
            [("de", "borders", "fr"), ("?n", "in_region", "europe")],
        )
    assert {dict(t)["n"] for t in got} == {"de", "fr"}
    assert not [r for r in caplog.records if "cartesian" in r.message]
