"""KG maintenance operator tests vs fresh-Python set/degree oracles."""

import pytest

from cello_spark.operators.kgops import kg_degree_stats, kg_diff, kg_diff_summary

OLD = [
    ("a", "is_a", "b"),
    ("b", "is_a", "c"),
    ("x", "part_of", "y"),
    ("x", "part_of", "y"),  # duplicate row: counts once
    ("q", "is_a", "c"),
]
NEW = [
    ("a", "is_a", "b"),
    ("b", "is_a", "c"),
    ("x", "part_of", "z"),   # y -> z rewired
    ("n1", "is_a", "c"),     # new triple
]


@pytest.fixture(scope="module")
def dfs(spark):
    mk = lambda rows: spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )
    return mk(OLD), mk(NEW)


def test_kg_diff_matches_set_oracle(spark, dfs):
    old, new = dfs
    so, sn = set(OLD), set(NEW)
    got = {(r.op, r.subj, r.pred, r.obj) for r in kg_diff(old, new).collect()}
    want = {("added", *t) for t in sn - so} | {("removed", *t) for t in so - sn}
    assert got == want
    assert ("removed", "x", "part_of", "y") in got
    assert ("added", "x", "part_of", "z") in got


def test_kg_diff_summary(spark, dfs):
    old, new = dfs
    got = {r.pred: (r.n_added, r.n_removed, r.n_unchanged)
           for r in kg_diff_summary(old, new).collect()}
    assert got == {"is_a": (1, 1, 2), "part_of": (1, 1, 0)}


def test_kg_degree_stats_vs_oracle(spark, dfs):
    old, _ = dfs
    got = {r.pred: r.asDict() for r in kg_degree_stats(old).collect()}
    # is_a: triples {(a,b),(b,c),(q,c)} — subj a,b,q; obj b,c; max in-deg c=2
    assert got["is_a"]["n_triples"] == 3
    assert got["is_a"]["n_subjects"] == 3
    assert got["is_a"]["n_objects"] == 2
    assert got["is_a"]["max_out_degree"] == 1
    assert got["is_a"]["max_in_degree"] == 2
    assert abs(got["is_a"]["avg_out_degree"] - 1.0) < 1e-9
    # part_of: the duplicate row counts once
    assert got["part_of"]["n_triples"] == 1


def test_degree_stats_hub_detection(spark):
    """A star graph (everything is_a hub) shows up as max_in_degree =
    n, exactly the salting signal."""
    n = 50
    rows = [(f"t{i}", "is_a", "hub") for i in range(n)]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    r = kg_degree_stats(df).collect()[0]
    assert r.max_in_degree == n and r.n_objects == 1


def _neg_oracle(triples, k, seed, corrupt):
    import hashlib

    t = sorted(set(triples))
    doms = {}
    for s, p, o in t:
        doms.setdefault(p, set()).add(o if corrupt == "obj" else s)
    doms = {p: sorted(v) for p, v in doms.items()}
    true = set(t)
    out = set()
    for s, p, o in t:
        dom = doms[p]
        for i in range(k):
            key = "\x01".join([s, p, o, str(seed), str(i)])
            h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
            ent = dom[h % len(dom)]
            if corrupt == "obj":
                if ent == o:
                    continue
                cand = (s, p, ent)
            else:
                if ent == s:
                    continue
                cand = (ent, p, o)
            if cand in true:
                continue
            out.add((s, p, o, i, cand[0], cand[2]))
    return out


def test_kg_negative_samples_vs_oracle(spark):
    from cello_spark.operators.kgops import kg_negative_samples

    rows = [
        (f"e{i}", "is_a", f"e{(i * 3 + 1) % 17}") for i in range(17)
    ] + [
        (f"e{i}", "part_of", f"g{i % 5}") for i in range(12)
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    for corrupt in ("obj", "subj"):
        got = {
            (r.pos_subj, r.pred, r.pos_obj, r.draw, r.neg_subj, r.neg_obj)
            for r in kg_negative_samples(
                df, k=3, seed=7, corrupt=corrupt
            ).collect()
        }
        want = _neg_oracle(rows, k=3, seed=7, corrupt=corrupt)
        assert got == want, (corrupt, len(got), len(want))
        # every emitted negative is genuinely false and type-consistent
        true = set(rows)
        doms = {}
        for s, p, o in rows:
            doms.setdefault(p, set()).add(o if corrupt == "obj" else s)
        for ps, p, po, d, ns, no in got:
            assert (ns, p, no) not in true
            assert (no if corrupt == "obj" else ns) in doms[p]


def test_kg_negative_samples_deterministic(spark):
    from cello_spark.operators.kgops import kg_negative_samples

    rows = [(f"a{i}", "r", f"b{i % 4}") for i in range(10)]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    one = set(map(tuple, kg_negative_samples(df, k=2, seed=1).collect()))
    two = set(map(tuple, kg_negative_samples(df.repartition(7), k=2, seed=1).collect()))
    assert one == two and len(one) > 0
    other_seed = set(map(tuple, kg_negative_samples(df, k=2, seed=2).collect()))
    assert one != other_seed


def _walk_oracle(edges, walk_len, walks_per_node, seed):
    import hashlib

    e = sorted(set(edges))
    adj = {}
    for s, o in e:
        adj.setdefault(s, []).append(o)
    adj = {k: sorted(v) for k, v in adj.items()}
    out = set()
    for start in sorted({s for s, _ in e}):
        for w in range(walks_per_node):
            cur, path, steps = start, [start], 0
            for t in range(1, walk_len + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    continue  # stalled: later steps also no-op
                key = "\x01".join([start, str(w), str(t), cur, str(seed)])
                h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
                cur = nbrs[h % len(nbrs)]
                path.append(cur)
                steps += 1
            out.add((start, w, "->".join(path), steps))
    return out


def test_kg_random_walks_vs_oracle(spark):
    from cello_spark.operators.kgops import kg_random_walks

    edges = (
        [(f"n{i}", f"n{(i + 1) % 8}") for i in range(8)]     # cycle
        + [(f"n{i}", f"n{(i + 3) % 8}") for i in range(8)]   # chords
        + [("n0", "sink"), ("n4", "sink")]                   # sink node
    )
    df = spark.createDataFrame(
        [(s, "r", o) for s, o in edges], "subj string, pred string, obj string"
    )
    got = {
        (r.start, r.walk, r.path, r.n_steps)
        for r in kg_random_walks(
            df, walk_len=4, walks_per_node=2, seed=9
        ).collect()
    }
    want = _walk_oracle(edges, walk_len=4, walks_per_node=2, seed=9)
    assert got == want
    # structure: every hop in every path is a real edge
    eset = set(edges)
    for _, _, path, n_steps in got:
        nodes = path.split("->")
        assert len(nodes) == n_steps + 1
        for a, b in zip(nodes, nodes[1:]):
            assert (a, b) in eset


def test_kg_random_walks_deterministic_across_partitioning(spark):
    from cello_spark.operators.kgops import kg_random_walks

    rows = [(f"a{i}", "r", f"a{(i * 5 + 2) % 23}") for i in range(23)]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    one = set(map(tuple, kg_random_walks(df, walk_len=3).collect()))
    two = set(map(tuple, kg_random_walks(df.repartition(11), walk_len=3).collect()))
    assert one == two and len(one) == 23


def _chains_oracle(triples, chains, max_iter=50):
    allt = set(triples)
    for _ in range(max_iter):
        new = set()
        for r1, r2, out in chains:
            lefts = [(s, o) for s, p, o in allt if p == r1]
            rights = {}
            for s, p, o in allt:
                if p == r2:
                    rights.setdefault(s, []).append(o)
            for s, y in lefts:
                for z in rights.get(y, []):
                    cand = (s, out, z)
                    if cand not in allt:
                        new.add(cand)
        if not new:
            return allt
        allt |= new
    raise AssertionError("oracle did not converge")


def test_infer_property_chains_vs_oracle(spark):
    from cello_spark.operators.kgops import infer_property_chains

    # a part_of chain up an is_a tower: part_of o is_a -> part_of
    rows = (
        [("organelle", "part_of", "cell1")]
        + [(f"cell{i}", "is_a", f"cell{i+1}") for i in range(1, 5)]
        + [("cellA", "is_a", "cell3")]
    )
    chains = [("part_of", "is_a", "part_of")]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        (r.subj, r.pred, r.obj)
        for r in infer_property_chains(df, chains).collect()
    }
    want = _chains_oracle(rows, chains)
    assert got == want
    # the derived up-propagation reached the tower top
    assert ("organelle", "part_of", "cell5") in got
    # is_a itself was not closed transitively (not in the rule set)
    assert ("cell1", "is_a", "cell3") not in got


def test_infer_property_chains_two_rules(spark):
    from cello_spark.operators.kgops import infer_property_chains

    rows = [
        ("a", "located_in", "b"),
        ("b", "part_of", "c"),
        ("c", "part_of", "d"),
    ]
    chains = [
        ("located_in", "part_of", "located_in"),
        ("part_of", "part_of", "part_of"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        (r.subj, r.pred, r.obj)
        for r in infer_property_chains(df, chains).collect()
    }
    assert got == _chains_oracle(rows, chains)
    assert ("a", "located_in", "d") in got and ("b", "part_of", "d") in got


def test_validate_kg_all_three_kinds(spark):
    from cello_spark.operators.kgops import validate_kg

    triples = spark.createDataFrame(
        [
            ("c1", "in_nation", "n1"),
            ("c1", "in_nation", "n2"),   # functional violation (2 objs)
            ("c2", "in_nation", "r1"),   # range violation (r1 not a nation)
            ("n1", "in_nation", "n2"),   # domain violation (n1 not a customer)
            ("c3", "in_nation", "n1"),   # clean
            ("x", "unconstrained", "y"),  # no constraint row -> ignored
        ],
        "subj string, pred string, obj string",
    )
    types = spark.createDataFrame(
        [("c1", "customer"), ("c2", "customer"), ("c3", "customer"),
         ("n1", "nation"), ("n2", "nation"), ("r1", "region")],
        "node string, type string",
    )
    constraints = spark.createDataFrame(
        [("in_nation", "customer", "nation")],
        "pred string, domain_type string, range_type string",
    )
    got = {
        (r.violation, r.subj, r.pred, r.obj, r.detail)
        for r in validate_kg(
            triples, types, constraints, functional_preds=("in_nation",)
        ).collect()
    }
    assert got == {
        ("range", "c2", "in_nation", "r1", "nation"),
        ("domain", "n1", "in_nation", "n2", "customer"),
        ("functional", "c1", "in_nation", None, "2"),
    }


def test_guards_reject_nonpositive_counts(spark):
    from cello_spark.operators.kgops import (
        kg_negative_samples,
        kg_random_walks,
    )

    df = spark.createDataFrame(
        [("a", "r", "b")], "subj string, pred string, obj string"
    )
    with pytest.raises(ValueError):
        kg_negative_samples(df, k=0)
    with pytest.raises(ValueError):
        kg_random_walks(df, walks_per_node=0)
    with pytest.raises(ValueError):
        kg_random_walks(df, walk_len=0)
