"""De-hubbed per-group ranking: the three operators that used a
single `row_number().over(partitionBy(hub_key))` window
(kg_negative_samples' per-predicate entity domain, kg_random_walks'
per-node adjacency, cap_per_stratum's per-stratum rank) now route
through partitioning.per_group_sorted_index / capped_per_group.
These tests pin BOTH halves of the claim:

- semantics unchanged: on a deliberately hub-skewed input (one key
  with ~100x the rows of the others) the outputs are identical to
  the naive single-window formulation computed inline here;
- the plan is de-hubbed: every row_number window in the physical
  plan is partitioned by (__rpid | __bkt, group), never by the bare
  group key — i.e. no single task sorts the hub.
"""

from __future__ import annotations

import re

from pyspark.sql import Window, functions as F

from cello_spark.operators.corpus import cap_per_stratum
from cello_spark.operators.kgops import kg_negative_samples, kg_random_walks
from cello_spark.partitioning import capped_per_group, per_group_sorted_index

_RN_SPEC = re.compile(r"row_number\(\) windowspecdefinition\(([^)]*)")


def _assert_no_bare_group_window(df, allow_bounded_final=False):
    """Every row_number window in the executed plan must carry a
    range-partition id or salt bucket in its partition spec. With
    allow_bounded_final=True (the two-phase cap shape) a bare-group
    window is tolerated PROVIDED the plan also contains the
    __bkt-partitioned pre-cap window and WindowGroupLimit rank
    pushdown — i.e. the final window only ever sees the
    parameter-bounded survivor set, never the raw hub."""
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    specs = _RN_SPEC.findall(plan)
    assert specs, "expected at least one row_number window in the plan"
    bare = [
        s for s in specs if "__rpid#" not in s and "__bkt#" not in s
    ]
    if allow_bounded_final:
        assert any("__bkt#" in s for s in specs), (
            "no salt-bucketed pre-cap window in plan"
        )
        if bare:
            assert "WindowGroupLimit" in plan, (
                "bare-group final window without rank-limit pushdown"
            )
    else:
        assert not bare, (
            "row_number window partitioned by a bare (hub-able) key:\n"
            + bare[0]
        )


def _hub_triples(spark):
    # 'type' is the hub predicate: 600 distinct objects; the other
    # predicates have 6 each
    rows = [(f"s{i}", "type", f"klass{i}") for i in range(600)]
    for p in ("is_a", "part_of"):
        rows += [(f"s{i}", p, f"o{i % 6}") for i in range(60)]
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def test_per_group_sorted_index_matches_naive_window(spark):
    df = _hub_triples(spark).select(
        "pred", F.col("obj").alias("ent")
    ).dropDuplicates()
    got = per_group_sorted_index(
        df, ["pred"], ["ent"], idx_col="idx", num_partitions=7,
        probe_skew=False,
    )
    naive = df.withColumn(
        "idx",
        F.row_number().over(Window.partitionBy("pred").orderBy("ent")) - 1,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )
    _assert_no_bare_group_window(got)


def test_per_group_sorted_index_null_group_keys(spark):
    # NULL group keys must rank as their own group (window semantics),
    # not be dropped by the offsets join (ADVICE r3: null-unsafe join)
    rows = [(None, f"e{i}") for i in range(9)] + [
        ("p", f"e{i}") for i in range(4)
    ]
    df = spark.createDataFrame(rows, "pred string, ent string")
    got = per_group_sorted_index(
        df, ["pred"], ["ent"], idx_col="idx", num_partitions=5,
        probe_skew=False,
    )
    naive = df.withColumn(
        "idx",
        F.row_number().over(Window.partitionBy("pred").orderBy("ent")) - 1,
    )
    assert sorted(
        map(tuple, got.fillna("~null~").collect())
    ) == sorted(map(tuple, naive.fillna("~null~").collect()))


def test_capped_per_group_matches_naive_window(spark):
    rows = [("hub", f"d{i:04d}") for i in range(500)] + [
        ("tiny", f"t{i}") for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["stratum", "doc_id"])
    got = capped_per_group(
        df, ["stratum"], ["doc_id"], n_max=7, n_buckets=4, probe_skew=False
    )
    naive = (
        df.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("stratum").orderBy("doc_id")
            ),
        )
        .filter(F.col("rk") <= 7)
        .drop("rk")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )
    _assert_no_bare_group_window(got, allow_bounded_final=True)


def test_kg_negative_samples_dehubbed_semantics_and_plan(spark):
    t = _hub_triples(spark)
    neg = kg_negative_samples(t, k=2, seed=7, hub_rows=10)
    # inline naive-domain re-derivation: same md5 draw over the
    # single-window sorted per-pred domain
    dom = (
        t.select("pred", F.col("obj").alias("ent"))
        .dropDuplicates()
        .withColumn(
            "idx",
            F.row_number().over(Window.partitionBy("pred").orderBy("ent")) - 1,
        )
    )
    sizes = dom.groupBy("pred").agg(F.count(F.lit(1)).alias("dom_sz"))
    reqs = (
        t.dropDuplicates()
        .join(sizes, "pred")
        .select(
            "subj",
            "pred",
            "obj",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, 1), i -> "
                    "cast(conv(substring(md5(concat_ws(chr(1), subj, pred, "
                    "obj, '7', cast(i AS string))), 1, 15), 16, 10) "
                    "AS bigint) % dom_sz)"
                )
            ).alias("draw", "idx"),
        )
        .withColumn("idx", F.col("idx").cast("int"))
    )
    naive = (
        reqs.join(dom, ["pred", "idx"])
        .filter(F.col("ent") != F.col("obj"))
        .select(
            F.col("subj").alias("pos_subj"),
            "pred",
            F.col("obj").alias("pos_obj"),
            "draw",
            F.col("subj").alias("neg_subj"),
            F.col("ent").alias("neg_obj"),
        )
        .join(
            t.select(
                F.col("subj").alias("neg_subj"),
                "pred",
                F.col("obj").alias("neg_obj"),
            ),
            ["neg_subj", "pred", "neg_obj"],
            "left_anti",
        )
    )
    assert sorted(map(tuple, neg.collect())) == sorted(
        map(tuple, naive.select(*neg.columns).collect())
    )
    _assert_no_bare_group_window(neg)


def test_kg_random_walks_dehubbed_plan_and_determinism(spark):
    # hub node with out-degree 300 + a small chain graph
    rows = [("hub", "linksto", f"n{i}") for i in range(300)]
    rows += [(f"n{i}", "linksto", f"n{i+1}") for i in range(40)]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    w1 = kg_random_walks(t, walk_len=3, walks_per_node=2, seed=11,
                         hub_rows=10)
    w2 = kg_random_walks(
        t.repartition(13), walk_len=3, walks_per_node=2, seed=11,
        hub_rows=10,
    )
    r1 = sorted(map(tuple, w1.collect()))
    assert r1 == sorted(map(tuple, w2.collect()))
    # hub's walks exist and stay within its real neighbor set
    hub_paths = [r for r in r1 if r[0] == "hub"]
    assert len(hub_paths) == 2
    for _, _, path, n_steps in hub_paths:
        hop1 = path.split("->")[1]
        assert hop1.startswith("n")
        assert n_steps >= 1
    _assert_no_bare_group_window(w1)


def test_cap_per_stratum_dehubbed_matches_naive(spark):
    rows = [("bighost.com", f"d{i:05d}") for i in range(400)] + [
        ("small.org", f"s{i}") for i in range(9)
    ]
    docs = spark.createDataFrame(rows, ["source", "doc_id"])
    got = cap_per_stratum(docs, n_max=11, hub_rows=10)
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    naive = (
        docs.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    h.asc(), F.col("doc_id").asc()
                )
            ),
        )
        .filter(F.col("rk") <= 11)
        .drop("rk")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )
    assert got.columns == docs.columns
    _assert_no_bare_group_window(got, allow_bounded_final=True)


def test_per_group_sorted_index_partition_invariance(spark):
    """The emitted rank must be identical for ANY num_partitions —
    the range boundaries are sampled, so this is the determinism claim
    the docstring makes, exercised across degenerate (1) and
    row-exceeding (97) partition counts and random group shapes."""
    import numpy as np

    rng = np.random.default_rng(99)
    rows = [
        (f"g{rng.integers(4)}", f"v{rng.integers(1000):04d}")
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        sorted(set(rows)), ["grp", "val"]
    )
    base = None
    for n_parts in (1, 2, 7, 97):
        got = sorted(
            map(
                tuple,
                per_group_sorted_index(
                    df, ["grp"], ["val"], idx_col="idx",
                    num_partitions=n_parts, probe_skew=False,
                ).collect(),
            )
        )
        if base is None:
            base = got
            # ranks are dense 0..n-1 per group
            from collections import defaultdict

            per = defaultdict(list)
            for g, v, i in got:
                per[g].append((v, i))
            for g, pairs in per.items():
                pairs.sort()
                assert [i for _, i in pairs] == list(range(len(pairs))), g
        else:
            assert got == base, n_parts


def test_skew_probe_picks_plain_window_when_even(spark):
    """Default probe: an input with no hub group gets the single
    row_number window (one shuffle, no __rpid machinery) and the exact
    same ranks; a hub input (hub_rows forced low) gets the de-hubbed
    plan. Same contract for capped_per_group."""
    rows = [(f"g{i % 8}", f"v{i:04d}") for i in range(400)]
    df = spark.createDataFrame(rows, ["grp", "val"])
    got = per_group_sorted_index(df, ["grp"], ["val"], idx_col="idx")
    plan = got._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "__rpid" not in plan, "probe should have chosen the plain window"
    naive = df.withColumn(
        "idx",
        F.row_number().over(Window.partitionBy("grp").orderBy("val")) - 1,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )
    forced = per_group_sorted_index(
        df, ["grp"], ["val"], idx_col="idx", hub_rows=10
    )
    _assert_no_bare_group_window(forced)
    assert sorted(map(tuple, forced.collect())) == sorted(
        map(tuple, naive.collect())
    )
    capped = capped_per_group(df, ["grp"], ["val"], n_max=3)
    cplan = capped._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "__bkt" not in cplan, "probe should have skipped the salt phase"
    naive_cap = (
        df.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("grp").orderBy("val")),
        )
        .filter(F.col("rk") <= 3)
        .drop("rk")
    )
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, naive_cap.collect())
    )
