"""Skew-handling join helpers.

When the dimension side is small we always `F.broadcast` (no shuffle,
no skew). When both sides must shuffle and the fact side has hub keys
(the reference ontology's root 'cell' term matches a large share of
all mentions), AQE's skew-join splitting handles *sort-merge* skew,
but a many-to-many mention⋈term join can still concentrate one key in
one task. `salted_join` makes the split explicit and deterministic:

    fact:  salt = pmod(xxhash64(salt_from), k)
    dim:   exploded k ways (one row per salt value)
    join on (key, salt)

This multiplies the dim side by k (fine for dims up to ~millions of
rows) and divides each hub key's fact rows across k tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    k: int = 16,
    salt_from: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on `key` with k-way salt. `salt_from` is the
    fact column whose hash spreads rows (defaults to the key itself —
    prefer a high-cardinality column like doc_id).

    `how` is restricted to joins that preserve at most the fact side:
    the dim side is exploded k ways before the join, so a right/full
    outer would emit k copies of every unmatched dim row."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "cross"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the k-way salt "
            "explode on the dim side would duplicate unmatched dim "
            "rows under right/full outer joins"
        )
    salt_src = salt_from or key
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(k)))
    d = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))).withColumn(
        "__salt", F.col("__salt").cast("long")
    )
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")
