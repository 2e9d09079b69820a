"""Expression sources (S1/S2/S4) and expression operators (P3, A1) vs
hand-computed goldens mirroring the reference's semantics."""

import os

import numpy as np
import pytest

from cello_spark.sources.expression import (
    aggregate_expression,
    load_expression,
    read_10x,
    read_matrix_csv,
    sum_duplicate_genes,
)


@pytest.fixture(scope="module")
def tenx_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tenx")
    # genes g1..g3, cells c1..c2; 1-based MatrixMarket triplets
    (d / "genes.tsv").write_text("g1\tGene1\ng2\tGene2\ng3\tGene3\n")
    (d / "barcodes.tsv").write_text("c1\nc2\n")
    (d / "matrix.mtx").write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "% comment line\n"
        "3 2 4\n"
        "1 1 5.0\n"
        "2 1 1.5\n"
        "3 2 2.0\n"
        "1 2 7.0\n"
    )
    return str(d)


def test_read_10x(spark, tenx_dir):
    got = {
        (r["sample_id"], r["gene_id"]): r["value"]
        for r in read_10x(spark, tenx_dir).collect()
    }
    assert got == {
        ("c1", "g1"): 5.0,
        ("c1", "g2"): 1.5,
        ("c2", "g3"): 2.0,
        ("c2", "g1"): 7.0,
    }


def test_read_matrix_csv_both_orientations(spark, tmp_path):
    p = tmp_path / "m.csv"
    p.write_text("id,g1,g2\ns1,1.0,2.0\ns2,3.0,4.0\n")
    got = {
        (r["sample_id"], r["gene_id"]): r["value"]
        for r in read_matrix_csv(spark, str(p), rows_cells=True).collect()
    }
    assert got[("s1", "g2")] == 2.0 and got[("s2", "g1")] == 3.0
    # transposed convention: rows are genes
    got_t = {
        (r["sample_id"], r["gene_id"]): r["value"]
        for r in read_matrix_csv(spark, str(p), rows_cells=False).collect()
    }
    assert got_t[("g1", "s1")] == 1.0 and got_t[("g2", "s2")] == 4.0


def test_load_expression_dispatch(spark, tenx_dir):
    assert load_expression(spark, tenx_dir, "10x").count() == 4
    with pytest.raises(ValueError):
        load_expression(spark, tenx_dir, "nope")


def test_sum_duplicate_genes(spark):
    """P3 semantics (cello/cello.py:162-173): several input genes
    mapping to one training gene sum their expression."""
    long_df = spark.createDataFrame(
        [("s1", "a", 1.0), ("s1", "b", 2.0), ("s1", "c", 10.0),
         ("s2", "a", 5.0), ("s2", "c", 1.0)],
        "sample_id string, gene_id string, value double",
    )
    gmap = spark.createDataFrame(
        [("a", "T1"), ("b", "T1"), ("c", "T2")],
        "gene_id string, train_gene_id string",
    )
    got = {
        (r["sample_id"], r["gene_id"]): r["value"]
        for r in sum_duplicate_genes(long_df, gmap).collect()
    }
    assert got == {
        ("s1", "T1"): 3.0,
        ("s1", "T2"): 10.0,
        ("s2", "T1"): 5.0,
        ("s2", "T2"): 1.0,
    }


def test_aggregate_expression_golden(spark):
    """A1 (cello/cello.py:554-576): expm1 → per-cluster gene sums →
    renormalize cluster total to 1e6 → log1p; golden computed by hand
    with numpy on a 3-cell, 2-gene example."""
    X = {  # log1p units
        ("s1", "g1"): 1.0, ("s1", "g2"): 2.0,
        ("s2", "g1"): 0.5, ("s2", "g2"): 0.0,
        ("s3", "g1"): 3.0, ("s3", "g2"): 1.0,
    }
    long_df = spark.createDataFrame(
        [(s, g, v) for (s, g), v in X.items()],
        "sample_id string, gene_id string, value double",
    )
    clusters = spark.createDataFrame(
        [("s1", 0), ("s2", 0), ("s3", 1)], "sample_id string, cluster int"
    )
    got = {
        (r["cluster"], r["gene_id"]): r["value"]
        for r in aggregate_expression(long_df, clusters).collect()
    }
    # numpy oracle
    for cl, samples in ((0, ["s1", "s2"]), (1, ["s3"])):
        raw = {
            g: sum(np.expm1(X[(s, g)]) for s in samples) for g in ("g1", "g2")
        }
        tot = sum(raw.values())
        for g in ("g1", "g2"):
            want = np.log1p(raw[g] * 1e6 / tot)
            assert abs(got[(cl, g)] - want) < 1e-9, (cl, g)


def test_qc_filters(spark):
    rows = [
        ("s1", "g1", 5.0), ("s1", "g2", 1.0), ("s1", "g3", 1.0),
        ("s2", "g1", 0.5),
        ("s3", "g2", 100.0), ("s3", "g3", 2.0),
    ]
    long_df = spark.createDataFrame(
        rows, "sample_id string, gene_id string, value double"
    )
    from cello_spark.sources.expression import filter_cells, filter_genes

    kept = filter_cells(long_df, min_genes=2, min_counts=3.0)
    assert {r["sample_id"] for r in kept.collect()} == {"s1", "s3"}
    capped = filter_cells(long_df, min_genes=2, min_counts=3.0, max_counts=50.0)
    assert {r["sample_id"] for r in capped.collect()} == {"s1"}
    genes = filter_genes(long_df, min_cells=2)
    assert {r["gene_id"] for r in genes.collect()} == {"g1", "g2", "g3"}
    genes2 = filter_genes(filter_cells(long_df, min_genes=2), min_cells=2)
    assert {r["gene_id"] for r in genes2.collect()} == {"g2", "g3"}


def test_gene_dialect_inference_and_matching(spark):
    """P2 (cello/cello.py:925-1004): three dialects — bare ENSG,
    versioned ENSG (version stripped), HGNC symbols (probe-set
    detection + 1:N biomart fan-out) — each restricted to the training
    gene universe."""
    from cello_spark.sources.expression import (
        infer_gene_dialect,
        match_genes,
    )

    meta = spark.createDataFrame(
        [
            ("ENSG00000001", "CD14"),
            ("ENSG00000002", "SOX2"),
            ("ENSG00000003", "NANOG"),
            ("ENSG00000004", "PECAM1"),
            ("ENSG00000005", "DUP"),
            ("ENSG00000006", "DUP"),  # symbol fans out to two ids
        ],
        "gene_id string, symbol string",
    )
    train = spark.createDataFrame(
        [(f"ENSG0000000{i}",) for i in range(1, 6)], "gene_id string"
    )  # ...06 NOT in the training universe

    ensg = spark.createDataFrame(
        [("ENSG00000001",), ("ENSG00000009",)], "gene string"
    )
    assert infer_gene_dialect(ensg) == "ENSG"
    got = {
        (r.gene, r.gene_id) for r in match_genes(ensg, meta, train).collect()
    }
    assert got == {("ENSG00000001", "ENSG00000001")}  # 09 not in train

    ver = spark.createDataFrame(
        [("ENSG00000002.7",), ("ENSG00000005.12",)], "gene string"
    )
    assert infer_gene_dialect(ver) == "ENSG_VERSION"
    got = {
        (r.gene, r.gene_id) for r in match_genes(ver, meta, train).collect()
    }
    assert got == {
        ("ENSG00000002.7", "ENSG00000002"),
        ("ENSG00000005.12", "ENSG00000005"),
    }

    sym = spark.createDataFrame(
        [("CD14",), ("SOX2",), ("NANOG",), ("PECAM1",), ("DUP",), ("NOPE",)],
        "gene string",
    )
    assert infer_gene_dialect(sym) == "HGNC_SYMBOL"
    got = {
        (r.gene, r.gene_id) for r in match_genes(sym, meta, train).collect()
    }
    # DUP keeps only its in-universe id; NOPE matches nothing
    assert got == {
        ("CD14", "ENSG00000001"),
        ("SOX2", "ENSG00000002"),
        ("NANOG", "ENSG00000003"),
        ("PECAM1", "ENSG00000004"),
        ("DUP", "ENSG00000005"),
    }

    # missing ONE probe symbol → not a symbol matrix → no dialect
    partial = spark.createDataFrame(
        [("CD14",), ("SOX2",), ("NANOG",)], "gene string"
    )
    with pytest.raises(ValueError):
        infer_gene_dialect(partial)


def test_select_hvg_matches_dense_numpy(spark):
    """HVG top-N (new_cello/preprocess/__init__.py:244-266): moments
    over the DENSE matrix (long table omits zeros), dispersion =
    var/(mean+1e-5), top-N, output re-sorted by gene id."""
    from cello_spark.sources.expression import select_hvg

    rng = np.random.default_rng(9)
    n_s, n_g = 12, 20
    M = np.where(rng.random((n_s, n_g)) < 0.5, 0.0, rng.random((n_s, n_g)) * 5)
    rows = [
        (f"s{i}", f"g{j:02d}", float(M[i, j]))
        for i in range(n_s)
        for j in range(n_g)
        if M[i, j] != 0.0
    ]
    long_df = spark.createDataFrame(
        rows, "sample_id string, gene_id string, value double"
    )
    got = select_hvg(long_df, n_top=5).toPandas()
    means = M.mean(axis=0)
    variances = M.var(axis=0)
    disp = variances / (means + 1e-5)
    top = sorted(np.argsort(-disp)[:5])
    assert got.gene_id.tolist() == [f"g{j:02d}" for j in top]
    np.testing.assert_allclose(
        got["mean"].to_numpy(), means[top], atol=1e-12
    )
    np.testing.assert_allclose(got["var"].to_numpy(), variances[top], atol=1e-12)


def test_check_compatibility(spark):
    """P4 (cello/cello.py:474-487): model genes ⊆ data genes."""
    from cello_spark.sources.expression import check_compatibility

    avail = spark.createDataFrame(
        [("g1",), ("g2",), ("g3",)], "gene_id string"
    )
    check_compatibility(avail, ["g1", "g3"])  # no raise
    with pytest.raises(ValueError, match="missing"):
        check_compatibility(avail, ["g1", "g9"])


def test_infer_dialect_ignores_duplicate_probe_rows(spark):
    """A long-format gene column can repeat one probe symbol many
    times; row counting would misread 'CD14 x4' as all-probes-present.
    The rule is the probe SET being a subset of the distinct genes."""
    from cello_spark.sources.expression import (
        DIALECT_ENSG,
        infer_gene_dialect,
    )

    rows = [("ENSG00000001",), ("ENSG00000002,",)][:1] + [("CD14",)] * 6 + [
        ("ENSG00000003",)
    ]
    df = spark.createDataFrame(rows, "gene string")
    assert infer_gene_dialect(df) == DIALECT_ENSG


# -- S3 scale path: binaryFile + mapInPandas per-file HDF5 decode ----------


def _make_fake_h5_decoder():
    """Deterministic stand-in parser for the injectable decode hook:
    the file payload is JSON {cells, genes, x}. Built as a nested
    function so cloudpickle ships it BY VALUE (a test-module function
    pickles by reference, which executors cannot import)."""

    def dec(buf):
        import json

        import numpy as np

        d = json.loads(buf.decode())
        return d["cells"], d["genes"], np.asarray(d["x"], dtype=float)

    return dec


def _write_fake_bundles(tmp_path, n_files=3):
    import json

    expected = []
    for fi in range(n_files):
        cells = [f"cell{fi}_{i}" for i in range(4 + fi)]
        genes = [f"g{j}" for j in range(3)]
        x = [
            [float(fi * 100 + i * 10 + j) for j in range(3)]
            for i in range(len(cells))
        ]
        p = tmp_path / f"bundle{fi}.h5"
        p.write_text(json.dumps({"cells": cells, "genes": genes, "x": x}))
        for i, c in enumerate(cells):
            for j, g in enumerate(genes):
                expected.append((c, g, x[i][j]))
    return expected


def test_read_hdf5_distributed_plumbing(spark, tmp_path):
    """3 synthetic bundle files through the real binaryFile +
    mapInPandas path (fake decoder; h5py absent in this container):
    long-table output matches the per-file matrices exactly, and tiny
    Arrow batches (cells_per_batch=2) reassemble losslessly."""
    from cello_spark.sources.expression import read_hdf5_distributed

    expected = _write_fake_bundles(tmp_path)
    out = read_hdf5_distributed(
        spark,
        str(tmp_path / "*.h5"),
        cells_per_batch=2,
        decoder=_make_fake_h5_decoder(),
    )
    assert out.columns == ["file", "sample_id", "gene_id", "value"]
    got = sorted(
        (r.sample_id, r.gene_id, r.value) for r in out.collect()
    )
    assert got == sorted(expected)
    # file column carries real per-file provenance
    n_files = out.select("file").distinct().count()
    assert n_files == 3


def test_read_hdf5_distributed_shape_mismatch_is_loud(spark, tmp_path):
    import json

    from cello_spark.sources.expression import read_hdf5_distributed

    p = tmp_path / "bad.h5"
    p.write_text(
        json.dumps({"cells": ["a", "b"], "genes": ["g"], "x": [[1.0]]})
    )
    out = read_hdf5_distributed(
        spark, str(p), decoder=_make_fake_h5_decoder()
    )
    with pytest.raises(Exception, match="shape"):
        out.collect()


def test_read_hdf5_distributed_real_h5py(spark, tmp_path):
    """With h5py present, the default decoder must reproduce the
    driver-side read_hdf5 long table file-for-file."""
    h5py = pytest.importorskip("h5py")
    from cello_spark.sources.expression import (
        read_hdf5,
        read_hdf5_distributed,
    )

    rng = np.random.default_rng(7)
    for fi in range(3):
        with h5py.File(tmp_path / f"b{fi}.h5", "w") as f:
            f["experiment"] = [f"c{fi}_{i}".encode() for i in range(5)]
            f["gene_id"] = [f"g{j}".encode() for j in range(4)]
            f["expression"] = rng.random((5, 4))
    dist = read_hdf5_distributed(spark, str(tmp_path / "*.h5"))
    driver_rows = []
    for fi in range(3):
        driver_rows += [
            tuple(r)
            for r in read_hdf5(spark, str(tmp_path / f"b{fi}.h5")).collect()
        ]
    got = sorted((r.sample_id, r.gene_id, r.value) for r in dist.collect())
    assert got == sorted(driver_rows)
