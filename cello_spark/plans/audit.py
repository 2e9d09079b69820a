"""Physical-plan audit: make 'the plan is the one we want' a TESTED
invariant instead of a one-off .explain() glance.

`plan_stats(df)` parses the executed physical plan into counts of the
features the scale design cares about — shuffles (Exchange), join
strategies (broadcast vs sort-merge vs nested-loop), whole-stage
codegen spans, parquet scans and their pushed filters. Tests assert
structural properties ("the document side never sort-merge joins",
"the scrub is exchange-free", "this filter reaches the scan") so a
plan regression — a lost broadcast hint, a pushdown broken by an
expression change, an accidental cartesian — fails CI instead of
shipping as a 100 TB surprise.

With execute=True the DataFrame is materialized first (foreach no-op)
so AQE's FINAL plan is inspected — under adaptive execution the
pre-run plan may still carry isFinalPlan=false placeholders.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_EXCHANGE_RE = re.compile(
    r"Exchange (hashpartitioning|rangepartitioning|SinglePartition|"
    r"RoundRobinPartitioning)"
)
# executedPlan().toString() marks codegen stages as `*(id) Node`;
# the long form "WholeStageCodegen (id)" appears in formatted explain
_CODEGEN_RE = re.compile(r"\*\((\d+)\)|WholeStageCodegen \((\d+)\)")
# no closing-bracket requirement: long filter lists are TRUNCATED by
# spark.sql.maxMetadataStringLength before the ']' — requiring it
# would report "no pushdown" for healthy plans
_PUSHED_RE = re.compile(r"PushedFilters: \[([^\]\n]*)")
# every Python-eval plan node Spark 4 can emit — a rewrite that moves
# work into Python must trip this no matter which API it used
_PYTHON_NODES = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "FlatMapGroupsInPandasWithState",
    "WindowInPandas",
    "AggregateInPandas",
)


def plan_stats(df: DataFrame, execute: bool = True) -> dict:
    """Parse the (final, if execute=True) physical plan into a dict of
    structural counts. Parsing the plan string is deliberate: it is
    the same stable surface `.explain()` prints, and it works across
    AQE replanning without touching Spark internals."""
    if execute:
        # JVM-only materialization: executing the physical plan's RDD
        # finalizes AQE without serializing a single row to Python
        # (df.foreach would ship every row through Python workers)
        try:
            df._jdf.queryExecution().executedPlan().execute().count()  # noqa: SLF001
        except Exception:
            df.foreach(lambda _row: None)
    s = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    # under AQE the string carries the pre-adaptive plan again below an
    # "== Initial Plan ==" marker — count only the final plan
    s = s.split("== Initial Plan ==")[0]
    # a ReusedExchange line embeds the referenced exchange's text —
    # counting it would report one shuffle as two
    exchange_lines = "\n".join(
        ln for ln in s.splitlines() if "ReusedExchange" not in ln
    )
    pushed = [m.group(1) for m in _PUSHED_RE.finditer(s)]
    return {
        "exchanges": len(_EXCHANGE_RE.findall(exchange_lines)),
        "broadcast_hash_joins": s.count("BroadcastHashJoin"),
        "sort_merge_joins": s.count("SortMergeJoin"),
        "shuffled_hash_joins": s.count("ShuffledHashJoin"),
        # broadcast NLJ (one side tiny and replicated — the legitimate
        # plan for e.g. a broadcast query-set score) is tracked apart
        # from CartesianProduct (both sides big — the blow-up)
        "broadcast_nested_loop_joins": s.count("BroadcastNestedLoopJoin"),
        "cartesian_products": s.count("CartesianProduct"),
        "codegen_spans": len(
            {a or b for a, b in _CODEGEN_RE.findall(s)}
        ),
        "parquet_scans": s.count("Scan parquet"),
        "pushed_filters": [p for p in pushed if p.strip()],
        "has_python_eval": any(node in s for node in _PYTHON_NODES),
        "plan": s,
    }


def assert_no_cartesian(df: DataFrame, execute: bool = True) -> dict:
    """Convenience gate: fail if the plan contains a CartesianProduct
    (both sides big — the classic accidental blow-up). A broadcast
    nested-loop join does NOT trip this: with a tiny replicated side
    it is a deliberate strategy, not an accident."""
    stats = plan_stats(df, execute=execute)
    if stats["cartesian_products"]:
        raise AssertionError(
            "plan contains a cartesian product:\n" + stats["plan"]
        )
    return stats
