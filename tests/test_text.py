"""Text-analysis function tests (all JVM-side expressions)."""

import pytest
from pyspark.sql import functions as F

from cello_spark.functions import text as X

ROWS = [
    (1, "The quick brown fox is one of the animals that it jumps for fun."),
    (2, "Der Hund ist ein Tier und das ist gut für die Katze im Haus."),
    (3, "le chat est dans la maison et il est pour les animaux du jardin"),
    (4, "el gato es un animal y la casa es de los animales en el jardín"),
    (5, "zzz qqq xxx"),  # no stopwords → und
    (6, ""),
]


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string").cache()


def test_token_counts(spark, tdf):
    got = {
        r.doc_id: (r.ws, r.bpe)
        for r in tdf.select(
            "doc_id",
            X.token_count_ws("text").alias("ws"),
            X.token_count_bpe("text").alias("bpe"),
        ).collect()
    }
    assert got[1][0] == 14  # whitespace tokens
    assert got[1][1] == 15  # + trailing '.' symbol token
    assert got[6] == (0, 0)


def test_detect_language(spark, tdf):
    got = {r.doc_id: r.lang for r in tdf.select("doc_id", X.detect_language("text").alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "es"
    assert got[5] == "und"
    assert got[6] == "und"


def test_quality_score_bounds_and_ordering(spark, tdf):
    got = {r.doc_id: r.q for r in tdf.select("doc_id", X.quality_score("text").alias("q")).collect()}
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got[1] > got[5]  # fluent English beats consonant soup
    assert got[6] < 0.5  # empty text scores low


def test_fingerprints(spark, tdf):
    fp = tdf.select(
        "doc_id",
        X.fingerprint_md5("text").alias("m"),
        X.fingerprint_rolling("text").alias("r"),
    )
    rows = {r.doc_id: (r.m, r.r) for r in fp.collect()}
    # deterministic across evaluations
    rows2 = {r.doc_id: (r.m, r.r) for r in fp.collect()}
    assert rows == rows2
    # distinct texts → distinct fingerprints (on this corpus)
    ms = [v[0] for k, v in rows.items() if k != 6]
    assert len(set(ms)) == len(ms)
    # md5 normalization: case/whitespace-insensitive
    two = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world")], "doc_id long, text string"
    ).select(X.fingerprint_md5("text").alias("m")).collect()
    assert two[0].m == two[1].m


def test_all_jvm_side(spark, tdf):
    """None of the text functions may fall back to Python UDFs."""
    q = tdf.select(
        X.token_count_ws("text"),
        X.token_count_bpe("text"),
        X.detect_language("text"),
        X.quality_score("text"),
        X.fingerprint_md5("text"),
        X.fingerprint_rolling("text"),
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_on_testdata_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = docs.select(
        "doc_id",
        X.token_count_ws("text").alias("n_tokens"),
        X.detect_language("text").alias("lang"),
        X.quality_score("text").alias("q"),
    )
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(r.n_tokens > 0 for r in rows)
