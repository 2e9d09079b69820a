"""Predict-path prep + the reference-shaped end-to-end predict plan.

Covers: units normalization (cello_predict.py:224-237), model-order
feature assembly (cello.py:517-519), and plans.predict
.predict_expression parity with direct link_documents.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cello_spark.operators.linking import LinkingModel, link_documents
from cello_spark.sources.expression import (
    COUNTS_UNITS,
    FULL_LENGTH_ASSAY,
    LOG1_TPM_UNITS,
    TPM_UNITS,
    features_vector,
    normalize_units,
)


def _long_df(spark, rows):
    return spark.createDataFrame(
        rows, "sample_id string, gene_id string, value double"
    )


def test_normalize_counts_matches_numpy_golden(spark):
    """COUNTS → per-sample CPM → log1p (scanpy normalize_total +
    log1p equivalent)."""
    rows = [
        ("s1", "g1", 10.0),
        ("s1", "g2", 30.0),
        ("s2", "g1", 5.0),
    ]
    got = {
        (r.sample_id, r.gene_id): r.value
        for r in normalize_units(
            _long_df(spark, rows), COUNTS_UNITS
        ).collect()
    }
    want = {
        ("s1", "g1"): np.log1p(10.0 / 40.0 * 1e6),
        ("s1", "g2"): np.log1p(30.0 / 40.0 * 1e6),
        ("s2", "g1"): np.log1p(5.0 / 5.0 * 1e6),
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_normalize_tpm_log1p_and_passthrough(spark):
    rows = [("s1", "g1", 3.0)]
    tpm = normalize_units(_long_df(spark, rows), TPM_UNITS).collect()[0].value
    assert tpm == pytest.approx(np.log1p(3.0))
    raw = normalize_units(
        _long_df(spark, rows), LOG1_TPM_UNITS
    ).collect()[0].value
    assert raw == 3.0


def test_full_length_rejects_count_units(spark):
    with pytest.raises(ValueError, match="full-length"):
        normalize_units(
            _long_df(spark, [("s1", "g1", 1.0)]),
            COUNTS_UNITS,
            assay=FULL_LENGTH_ASSAY,
        )


def test_features_vector_model_order_missing_and_duplicates(spark):
    rows = [
        ("s1", "gB", 2.0),
        ("s1", "gA", 1.0),
        ("s1", "gA", 4.0),  # duplicate gene rows sum
        ("s2", "gC", 7.0),  # gC not a model gene → dropped
        ("s2", "gB", 9.0),
    ]
    out = {
        r.doc_id: r.features
        for r in features_vector(
            _long_df(spark, rows), ["gA", "gB", "gZ"]
        ).collect()
    }
    assert out["s1"] == [5.0, 2.0, 0.0]  # model order, missing gZ → 0
    assert out["s2"] == [0.0, 9.0, 0.0]


def test_features_vector_keeps_all_zero_samples(spark):
    """A sample whose nonzero genes are ALL outside the model gene set
    must still appear, scored as the all-zero vector (the reference's
    dense AnnData slice semantics) — not silently vanish at the dim
    join."""
    rows = [
        ("s1", "gA", 1.0),
        ("s2", "gX", 7.0),  # no model genes at all
        ("s2", "gY", 3.0),
    ]
    out = {
        r.doc_id: r.features
        for r in features_vector(
            _long_df(spark, rows), ["gA", "gB"]
        ).collect()
    }
    assert set(out) == {"s1", "s2"}
    assert out["s1"] == [1.0, 0.0]
    assert out["s2"] == [0.0, 0.0]


def test_predict_expression_matches_direct_linking(
    spark, small_world, label_edges
):
    """The full plan (TPM long table → normalize → assemble → link)
    must equal link_documents on the fixture feature arrays: the long
    table stores expm1(features) as TPM, so normalize_units(TPM)
    reconstructs the features exactly."""
    from cello_spark.plans.predict import predict_expression

    model = LinkingModel.from_tables(
        small_world["weights"], small_world["thresholds"], label_edges
    )
    feats_pdf = small_world["features"].iloc[:60]
    genes = [f"g{i:03d}" for i in range(len(feats_pdf.features.iloc[0]))]
    rows = [
        (r.doc_id, genes[i], float(np.expm1(v)))
        for r in feats_pdf.itertuples(index=False)
        for i, v in enumerate(r.features)
        if v != 0.0  # sparse long table: absent genes must read as 0
    ]
    out = predict_expression(
        _long_df(spark, rows),
        model,
        features=genes,
        units=TPM_UNITS,
        strict=False,  # sparse input: not every gene appears
    )
    want = {
        r.doc_id: (r.most_specific, list(r.final_labels))
        for r in link_documents(
            spark.createDataFrame(feats_pdf), model
        ).collect()
    }
    got_ms = {r.doc_id: r.label for r in out["most_specific"].collect()}
    for doc, (ms, _) in want.items():
        if ms:
            assert got_ms.get(doc) == ms
        else:
            assert doc not in got_ms
    got_prob = out["probability"].toPandas()
    assert set(got_prob.columns) == {"doc_id", "label", "prob"}
    assert len(got_prob) == len(feats_pdf) * len(model.labels)
    # binary agrees with the wide kernel's final decision counts
    n_pos = out["binary"].filter("bin = 1").count()
    assert n_pos > 0


def test_predict_expression_rename_and_strict_gate(
    spark, small_world, label_edges, onto
):
    from cello_spark.plans.predict import predict_expression

    model = LinkingModel.from_tables(
        small_world["weights"], small_world["thresholds"], label_edges
    )
    feats_pdf = small_world["features"].iloc[:5]
    genes = [f"g{i:03d}" for i in range(len(feats_pdf.features.iloc[0]))]
    rows = [
        (r.doc_id, genes[i], float(np.expm1(v)))
        for r in feats_pdf.itertuples(index=False)
        for i, v in enumerate(r.features)
    ]
    terms = spark.createDataFrame(
        onto.terms[["term_id", "name"]]
    )
    out = predict_expression(
        _long_df(spark, rows),
        model,
        features=genes,
        units=TPM_UNITS,
        terms=terms,
        strict=True,  # dense input: every model gene present
    )
    ms = out["most_specific"].collect()
    assert ms and all("(" in r.label and r.label.endswith(")") for r in ms)
    # strict gate trips when a model gene is absent everywhere
    with pytest.raises(ValueError, match="incompatible"):
        predict_expression(
            _long_df(spark, rows),
            model,
            features=genes + ["gene_not_present"],
            units=TPM_UNITS,
        )


def test_write_outputs_roundtrip(spark, small_world, label_edges, tmp_path):
    from cello_spark.plans.predict import predict_expression, write_outputs

    model = LinkingModel.from_tables(
        small_world["weights"], small_world["thresholds"], label_edges
    )
    feats_pdf = small_world["features"].iloc[:10]
    genes = [f"g{i:03d}" for i in range(len(feats_pdf.features.iloc[0]))]
    rows = [
        (r.doc_id, genes[i], float(np.expm1(v)))
        for r in feats_pdf.itertuples(index=False)
        for i, v in enumerate(r.features)
    ]
    out = predict_expression(
        _long_df(spark, rows), model, features=genes, units=TPM_UNITS
    )
    for fmt in ("parquet", "tsv"):
        d = str(tmp_path / fmt)
        write_outputs(out, d, fmt=fmt)
        if fmt == "parquet":
            back = spark.read.parquet(d + "/probability")
        else:
            back = spark.read.option("sep", "\t").option(
                "header", "true"
            ).csv(d + "/probability")
        assert back.count() == out["probability"].count()
        assert set(back.columns) == {"doc_id", "label", "prob"}
    with pytest.raises(ValueError, match="fmt"):
        write_outputs(out, str(tmp_path / "x"), fmt="xlsx")
