"""PII detection and redaction for training-data pipelines.

No analog exists in the reference (CellO processes expression
matrices, not free text), but web-scale corpus preparation scrubs
personally identifying strings before training (see e.g. the C4
pipeline's blocklist pass, Raffel et al. 2020 §2.2, and BigScience
ROTS PII filtering) — this is the same table-stakes class as the
quality/dedup operators.

Scale design: everything here is a per-row column expression —
`regexp_count` / chained `regexp_replace` inside WholeStageCodegen,
ZERO shuffles, trivially partition-parallel at 100 TB. Patterns are
deliberately restricted to the common subset of Java regex (Spark)
and RE2 (DuckDB): no lookaround, no backreferences, no possessive
quantifiers — so the DuckDB oracle can run the *identical* pattern
strings and the cross-engine hash check verifies real behavior, not
a lookalike.

Rule order matters for redaction (each rule rewrites the previous
rule's output); replacement tokens contain no characters any rule
matches, so redaction cannot cascade. Counts are always computed on
the ORIGINAL text, independent per rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (name, pattern, replacement) — Java-regex/RE2 common subset only.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
        "<PHONE>",
    ),
)


def _count_cols(text_col: str, rules) -> list:
    return [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in rules
    ]


def _total_col(text_col: str, rules):
    """Sum of the per-rule count expressions, aliased n_pii — shared
    by pii_signals and pii_redact so the columns cannot diverge."""
    total = None
    for _, pat, _tok in rules:
        c = F.regexp_count(F.col(text_col), F.lit(pat))
        total = c if total is None else total + c
    return total.alias("n_pii")


def pii_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rules: tuple[tuple[str, str, str], ...] = PII_RULES,
) -> DataFrame:
    """(id, n_<rule>..., n_pii): per-document PII match counts, one
    per rule plus the total. Pure per-row expressions, no shuffle."""
    counts = _count_cols(text_col, rules)
    return docs.select(
        F.col(id_col).alias(id_col), *counts, _total_col(text_col, rules)
    )


def pii_redact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rules: tuple[tuple[str, str, str], ...] = PII_RULES,
) -> DataFrame:
    """(id, n_<rule>..., n_pii, redacted): counts on the original text
    plus the text with every rule's matches replaced by its token,
    applied in rule order. Still zero-shuffle per-row codegen."""
    red = F.col(text_col)
    for _, pat, token in rules:
        red = F.regexp_replace(red, pat, token)
    return docs.select(
        F.col(id_col).alias(id_col),
        *_count_cols(text_col, rules),
        _total_col(text_col, rules),
        red.alias("redacted"),
    )
