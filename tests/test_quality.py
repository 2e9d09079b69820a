"""Quality operators (operators/quality.py) vs fresh-Python oracles.

The oracles re-derive every signal from plain Python string ops and
collections.Counter — no shared code with the Spark implementations.
"""

from __future__ import annotations

from collections import Counter

import pytest

from cello_spark.operators.quality import (
    decontaminate,
    gopher_quality_filter,
    repetition_stats,
)

DOCS = [
    # id, text
    (0, "the cat sat on the mat the cat sat on the mat"),  # heavy repeats
    (1, "alpha beta gamma delta epsilon zeta eta theta"),  # all distinct
    (2, "spam spam spam spam spam spam"),  # one token repeated
    (3, "line one\nline two\nline one\nline three"),  # dup lines
    (4, ""),  # empty
    (5, "solo"),  # too short for any n-gram
    (6, "a b a b a b a b c d"),  # dominant 2-gram
]


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().replace("\t", " ").replace("\n", " ").replace("\r", " ").split(" ") if t]


def _grams(text: str, n: int) -> list[str]:
    t = _toks(text)
    return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]


def _rep_oracle(text: str, n: int) -> tuple[float, float]:
    c = Counter(_grams(text, n))
    tot = sum(c.values())
    if tot == 0:
        return 0.0, 0.0
    top = max(c.values()) / tot
    dup = sum(v for v in c.values() if v > 1) / tot
    return round(top, 6), round(dup, 6)


def _line_oracle(text: str) -> tuple[int, float]:
    lines = text.split("\n")
    return len(lines), round(1.0 - len(set(lines)) / len(lines), 6)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_repetition_stats_vs_python_oracle(spark, docs_df):
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs_df).collect()}
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        n_lines, dup_line = _line_oracle(text)
        row = got[doc_id]
        assert row["n_lines"] == n_lines, (doc_id, "n_lines")
        assert row["dup_line_frac"] == pytest.approx(dup_line, abs=1e-6)
        for n in (2, 3):
            top, dup = _rep_oracle(text, n)
            assert row[f"top{n}gram_frac"] == pytest.approx(top, abs=1e-6), (
                doc_id,
                n,
            )
            assert row[f"dup{n}gram_frac"] == pytest.approx(dup, abs=1e-6), (
                doc_id,
                n,
            )


def test_repetition_known_values(spark, docs_df):
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs_df).collect()}
    # doc 2: "spam" x6 → five identical 2-grams: top=dup=1.0
    assert got[2]["top2gram_frac"] == pytest.approx(1.0)
    assert got[2]["dup2gram_frac"] == pytest.approx(1.0)
    # doc 1: all distinct → 0 repetition
    assert got[1]["top2gram_frac"] == pytest.approx(1 / 7)
    assert got[1]["dup2gram_frac"] == 0.0
    # doc 3: 4 lines, "line one" twice → dup_line_frac = 1 - 3/4
    assert got[3]["n_lines"] == 4
    assert got[3]["dup_line_frac"] == pytest.approx(0.25)
    # doc 4/5: too short → all-zero fracs, not null
    for d in (4, 5):
        for c in ("top2gram_frac", "dup2gram_frac", "top3gram_frac", "dup3gram_frac"):
            assert got[d][c] == 0.0


def test_gopher_filter_keeps_clean_rejects_repetitive(spark):
    # a "clean" doc: 60 words, no repeated n-gram (every phrase carries
    # indexed words), stopword floor met by the recurring "the"
    clean = " ".join(
        f"the alpha{i} meets beta{i} under gamma{i}" for i in range(10)
    )
    spammy = " ".join(["buy now"] * 30)
    short = "too short"
    df = spark.createDataFrame(
        [(0, clean), (1, spammy), (2, short)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_quality_filter(df).collect()}
    assert got[0]["keep"] is True
    assert got[1]["keep"] is False  # top2gram_frac ≈ 1.0 > 0.20
    assert got[2]["keep"] is False  # n_words < 50
    # signals present and sane
    assert got[0]["n_words"] == 60
    assert got[1]["top2gram_frac"] > 0.4


def test_decontaminate_flags_benchmark_docs(spark, docs_df):
    bench = spark.createDataFrame(
        [(100, "the cat sat on the mat")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in decontaminate(docs_df, bench, n=3, threshold=0.5).collect()
    }
    assert set(out) == {d for d, _ in DOCS}
    # doc 0 repeats the benchmark sentence: every distinct 3-gram of
    # doc 0 except the wrap-around ones appears in the benchmark
    assert out[0]["contaminated"] is True
    assert out[0]["overlap_frac"] >= 0.5
    # doc 1 shares nothing
    assert out[1]["n_matched"] == 0
    assert out[1]["contaminated"] is False
    # empty doc: zero shingles, 0.0 frac, not contaminated, still present
    assert out[4]["n_shingles"] == 0
    assert out[4]["overlap_frac"] == 0.0
    assert out[4]["contaminated"] is False


def test_decontaminate_python_oracle(spark, docs_df):
    bench_texts = ["the cat sat on the mat", "alpha beta gamma"]
    bench = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench_texts)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in decontaminate(docs_df, bench, n=2, threshold=0.3).collect()
    }
    bench_sh = set()
    for t in bench_texts:
        bench_sh.update(_grams(t, 2) or ([" ".join(_toks(t))] if _toks(t) else []))
    for doc_id, text in DOCS:
        # shingles() falls back to the whole text when len(toks) < n
        sh = set(_grams(text, 2))
        if not sh and _toks(text):
            sh = {" ".join(_toks(text))}
        n_matched = len(sh & bench_sh)
        assert got[doc_id]["n_shingles"] == len(sh), doc_id
        assert got[doc_id]["n_matched"] == n_matched, doc_id
        frac = round(n_matched / len(sh), 6) if sh else 0.0
        assert got[doc_id]["overlap_frac"] == pytest.approx(frac, abs=1e-6)
        assert got[doc_id]["contaminated"] is (len(sh) > 0 and frac >= 0.3)


def test_decontaminate_shuffle_join_parity(spark, docs_df):
    """broadcast_benchmark=False must give identical results."""
    bench = spark.createDataFrame(
        [(100, "the cat sat on the mat")], "doc_id long, text string"
    )
    a = sorted(
        map(tuple, decontaminate(docs_df, bench, n=3, threshold=0.5).collect())
    )
    b = sorted(
        map(
            tuple,
            decontaminate(
                docs_df, bench, n=3, threshold=0.5, broadcast_benchmark=False
            ).collect(),
        )
    )
    assert a == b


def test_repetition_and_decontaminate_random_docs(spark):
    """Randomized parity sweep: 40 docs drawn from a 12-word vocab
    (heavy gram collisions) vs the same fresh-Python oracles."""
    import numpy as np

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab, size=int(rng.integers(0, 25)))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    for doc_id, text in docs:
        for n in (2, 3):
            top, dup = _rep_oracle(text, n)
            assert got[doc_id][f"top{n}gram_frac"] == pytest.approx(top, abs=1e-6)
            assert got[doc_id][f"dup{n}gram_frac"] == pytest.approx(dup, abs=1e-6)

    bench = spark.createDataFrame(docs[:5], "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in decontaminate(df, bench, n=2, threshold=0.4).collect()
    }
    bench_sh = set()
    for _, t in docs[:5]:
        sh = set(_grams(t, 2))
        if not sh and _toks(t):
            sh = {" ".join(_toks(t))}
        bench_sh |= sh
    for doc_id, text in docs:
        sh = set(_grams(text, 2))
        if not sh and _toks(text):
            sh = {" ".join(_toks(text))}
        assert out[doc_id]["n_shingles"] == len(sh), doc_id
        assert out[doc_id]["n_matched"] == len(sh & bench_sh), doc_id
