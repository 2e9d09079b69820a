"""Basic-graph-pattern (BGP) matching over a (subj, pred, obj) triple
table — the query side of the knowledge graph this engine constructs.

A pattern is a list of (s, p, o) triple templates; terms beginning
with '?' are variables, everything else is a constant. The result is
one row per binding of the variables, one column per variable — i.e.
the SELECT of a SPARQL basic graph pattern, re-expressed as a chain
of Catalyst equi-joins:

    match_bgp(triples, [("?c", "in_nation", "?n"),
                        ("?s", "in_nation", "?n"),
                        ("?n", "in_region", "EUROPE")])
    -> DataFrame(c, s, n)

Scale design:
- each template becomes a FILTERED SCAN of the triple table (constant
  terms push down to parquet/Iceberg as `pred = ...` / `obj = ...`
  predicates — the triple sink partitions by pred, so constant-pred
  templates prune partitions);
- templates then join pairwise on their shared variables; Catalyst
  is free to reorder the joins (CBO/AQE pick the small side first);
- a template sharing no variable with what came before is a
  cross-join (cartesian) — allowed but logged, as in SPARQL;
- repeated variables within one template (e.g. (?x, likes, ?x))
  become a self-equality filter before the join.

No reference analog (CellO materializes classifications, it has no
graph query language); this is the natural query surface for the
triple table `plans/kg.py` emits, and every term of it is standard
public SPARQL/Datalog semantics.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

_log = logging.getLogger(__name__)

_POS_COLS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def match_bgp(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    distinct: bool = True,
) -> DataFrame:
    """Return all variable bindings satisfying every pattern. Output
    columns are the variable names without '?', in first-appearance
    order. distinct=True collapses duplicate bindings (SPARQL SELECT
    DISTINCT); distinct=False keeps multiplicity (bag semantics)."""
    if not patterns:
        raise ValueError("empty basic graph pattern")
    out: DataFrame | None = None
    bound: list[str] = []
    for idx, pat in enumerate(patterns):
        if len(pat) != 3:
            raise ValueError(f"pattern {pat!r} is not a triple")
        t = triples
        # constant terms -> pushed-down filters
        for col, term in zip(_POS_COLS, pat):
            if not _is_var(term):
                t = t.filter(F.col(col) == F.lit(term))
        # variable terms -> rename to the variable; repeated variable
        # within the template -> self-equality filter first
        names: dict[str, str] = {}
        for col, term in zip(_POS_COLS, pat):
            if _is_var(term):
                v = term[1:]
                if not v:
                    raise ValueError(f"bare '?' in pattern {pat!r}")
                if v in names:
                    t = t.filter(F.col(col) == F.col(names[v]))
                else:
                    names[v] = col
        if not names:
            # all-constant template: an existence (ASK) constraint —
            # keep previous bindings iff any matching triple exists
            t = t.limit(1).select(F.lit(1).alias("__exists"))
            out = (t if out is None else out.crossJoin(t)).drop("__exists")
            continue
        t = t.select(*[F.col(c).alias(v) for v, c in
                       sorted(names.items(), key=lambda kv: _POS_COLS.index(kv[1]))])
        if out is None:
            out = t
            bound = list(t.columns)
            continue
        shared = [v for v in t.columns if v in bound]
        if shared:
            out = out.join(t, on=shared, how="inner")
        else:
            if bound:
                # genuinely disjoint variable sets — a real blow-up
                _log.warning(
                    "match_bgp: pattern %d (%r) shares no variable with "
                    "the preceding patterns — cartesian product", idx, pat
                )
            # else: `out` is a zero-column existence frame (only ASK
            # constraints so far) — the crossJoin is against at most
            # one row, the intended cheap plan, not a blow-up
            out = out.crossJoin(t)
        bound += [v for v in t.columns if v not in bound]
    assert out is not None
    if bound:
        # join(on=shared) moves join keys first — restore the
        # documented first-appearance column order
        out = out.select(*bound)
    return out.dropDuplicates() if distinct else out
