"""Model training: per-label logistic ensemble over the label DAG.

Re-expresses the reference's training path Spark-first:

- positive / negative example sets (SO1/SO2,
  ensemble_binary_classifiers.py:258-297): DataFrame joins against the
  label closure — positives are items carrying the label or any of its
  descendants; negatives are everything else EXCEPT ambiguous items
  whose most-specific labels sit strictly above the target label.
- study-group weighting (M9/J4, ensemble_binary_classifiers.py:238-251):
  sample_weight = 1 / |study|, a groupBy + broadcast join.
- the per-label fit loop (M3/M4, binary_classifier.py:9-49,
  ensemble_binary_classifiers.py:58-142) becomes ONE distributed IRLS
  (Newton) solver for ALL labels simultaneously: each Arrow batch
  computes partial Hessians X'S_lX and gradients X'r_l for every label
  in vectorized numpy; the driver sums partials (deterministic order)
  and solves L small (d+1)x(d+1) systems per iteration. One Spark pass
  per Newton iteration — at 100 TB this is a handful of map-side-only
  scans, no shuffle, no per-label job storm.
- labels with no negative examples are 'trivial' (constant prob 1.0,
  ensemble_binary_classifiers.py:122-128).
- class_weight='balanced' (binary_classifier.py:22-29): w_pos =
  n/(2*n_pos), w_neg = n/(2*n_neg), computed in the same first pass.
- intercept is unregularized (the reference's intercept_scaling=1000
  makes the bias effectively penalty-free).

Output matches `LinkingModel.from_tables` weights format
(label, coef, intercept, is_trivial) so a trained model drops straight
into the linking stage.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from cello_spark.functions.hierarchy import sigmoid


# ---------------------------------------------------------------------------
# SO1 / SO2 — positive & negative example sets as DataFrame ops
# ---------------------------------------------------------------------------


def positive_examples(labels_long: DataFrame, closure: DataFrame) -> DataFrame:
    """SO1 (_compute_positive_examples,
    ensemble_binary_classifiers.py:258-273): item is positive for label
    L iff it carries L or any descendant of L. `labels_long` =
    (item, label); `closure` = strict (descendant, ancestor) pairs
    (small, broadcast). Output (item, label) distinct."""
    lifted = labels_long.join(
        F.broadcast(closure),
        labels_long.label == closure.descendant,
    ).select("item", F.col("ancestor").alias("label"))
    return labels_long.select("item", "label").union(lifted).distinct()


def negative_examples(
    labels_long: DataFrame,
    closure: DataFrame,
    ms_labels_long: DataFrame,
    all_labels: DataFrame,
) -> DataFrame:
    """SO2 (_compute_negative_examples,
    ensemble_binary_classifiers.py:277-297): negatives for label L =
    all items − positives(L) − ambiguous items (those having a
    most-specific label that is a STRICT ancestor of L — they might be
    an unresolved L). `all_labels` = 1-column (label) dim (tiny).
    Output (item, label) distinct.

    Scale note: this materializes |items| x |labels| candidate rows —
    fine for queries/tests; the distributed fit never materializes it
    (masks are computed per Arrow batch from the broadcast closure)."""
    items = labels_long.select("item").distinct()
    universe = items.crossJoin(F.broadcast(all_labels))
    pos = positive_examples(labels_long, closure)
    ambig = (
        ms_labels_long.join(
            F.broadcast(closure),
            ms_labels_long.ms_label == closure.ancestor,
        )
        .select("item", F.col("descendant").alias("label"))
        .distinct()
    )
    return (
        universe.join(pos, ["item", "label"], "left_anti")
        .join(ambig, ["item", "label"], "left_anti")
        .distinct()
    )


def cdc_training_sets(
    labels_long: DataFrame,  # (item, label)
    closure: DataFrame,  # strict (descendant, ancestor) over the label DAG
    parent_edges: DataFrame,  # DIRECT (child, parent) label-graph edges
    mode: str = "assert_ambiguous_negative",
) -> DataFrame:
    """SO3: CDC per-label training sets (reference
    cascaded_discriminative_classifiers.py:196-261). Output
    (item, label, y) with y=1 positives, y=0 negatives.

      pos(L) = items carrying L or any descendant (restricted to
               labels that have items — label_to_items keys);
      neg(L) = items whose label set contains ALL direct parents of L
               (the all-parents predicate; roots: every item), minus
               pos(L);
      mode="remove_ambiguous" additionally drops negatives whose
               MOST-SPECIFIC label set contains all direct parents of
               L (they might be an unresolved L) — reference
               :253-261. Roots lose all negatives in this mode (the
               empty parent set is a subset of anything).

    Plan shape: the item side shuffles once per aggregate on
    (label, item); parent edges and the label dim are broadcast."""
    label_dim = labels_long.select("label").distinct()
    item_labels = labels_long.select("item", "label").distinct()
    pos = positive_examples(labels_long, closure).join(
        F.broadcast(label_dim), "label", "left_semi"
    )

    parents = parent_edges.select("child", "parent").dropDuplicates().join(
        F.broadcast(label_dim.withColumnRenamed("label", "child")),
        "child",
        "left_semi",
    )
    n_par = parents.groupBy("child").agg(F.count(F.lit(1)).alias("n_parents"))
    items = labels_long.select("item").distinct()

    def _all_parents_hits(carried: DataFrame) -> DataFrame:
        """(label=child, item) where `carried`(item,label) covers ALL
        direct parents of child — join + count == n_parents."""
        return (
            carried.join(
                F.broadcast(parents), carried.label == parents.parent
            )
            .groupBy(F.col("child"), F.col("item"))
            .agg(F.count_distinct(F.col("parent")).alias("hits"))
            .join(F.broadcast(n_par), "child")
            .filter(F.col("hits") == F.col("n_parents"))
            .select(F.col("item"), F.col("child").alias("label"))
        )

    neg = _all_parents_hits(item_labels)
    # root labels (no direct parents): the all-parents predicate is
    # vacuously true — every item qualifies
    roots = label_dim.join(
        parents.select(F.col("child").alias("label")), "label", "left_anti"
    )
    neg = neg.unionByName(items.crossJoin(F.broadcast(roots)))
    neg = neg.join(pos, ["item", "label"], "left_anti")

    if mode == "remove_ambiguous":
        from cello_spark.operators.graph import most_specific_per_group

        ms = most_specific_per_group(
            closure,
            labels_long.select(
                F.col("item").alias("gid"), F.col("label").alias("node")
            ),
        ).select(F.col("gid").alias("item"), F.col("node").alias("label"))
        ambig = _all_parents_hits(ms).unionByName(
            items.crossJoin(F.broadcast(roots))
        )
        neg = neg.join(ambig, ["item", "label"], "left_anti")
    elif mode != "assert_ambiguous_negative":
        raise ValueError(f"unknown mode {mode!r}")

    return pos.withColumn("y", F.lit(1)).unionByName(
        neg.withColumn("y", F.lit(0))
    )


def study_weights(item_study: DataFrame) -> DataFrame:
    """M9/J4 (ensemble_binary_classifiers.py:238-251): per-item sample
    weight 1/|study group| over the GLOBAL item set. `item_study` =
    (item, study). Output (item, weight).

    This is the standalone J4 operator (q_study_weights). Inside
    `fit_hierarchical_lr` the reference semantics are stricter — group
    sizes are recomputed within each label's own pos+neg training set
    — and the fit implements that exactly via a per-(label, study)
    masked count in its count pass (see `fit_hierarchical_lr`)."""
    sizes = item_study.groupBy("study").agg(F.count(F.lit(1)).alias("n"))
    return item_study.join(F.broadcast(sizes), "study").select(
        "item", (F.lit(1.0) / F.col("n")).alias("weight")
    )


# ---------------------------------------------------------------------------
# Label-space masks (driver-side, O(L²) — labels are ontology-sized)
# ---------------------------------------------------------------------------


def _ancestor_masks(labels: list[str], label_edges: list[tuple[str, str]]):
    """(anc_strict, anc_with_self) boolean LxL matrices;
    anc[i, j] = labels[j] is a (strict) ancestor of labels[i]."""
    n = len(labels)
    pos = {l: i for i, l in enumerate(labels)}
    parents: dict[int, set[int]] = {}
    for c, p in label_edges:
        if c in pos and p in pos:
            parents.setdefault(pos[c], set()).add(pos[p])
    anc = np.zeros((n, n), dtype=bool)
    for i in range(n):
        frontier = set(parents.get(i, ()))
        seen: set[int] = set()
        while frontier:
            seen |= frontier
            frontier = {g for f in frontier for g in parents.get(f, ())} - seen
        anc[i, list(seen)] = True
    return anc, anc | np.eye(n, dtype=bool)


def _batch_y_mask(
    label_lists: pd.Series,
    ms_lists: pd.Series,
    pos_of: dict[str, int],
    anc_strict: np.ndarray,
    anc_with_self: np.ndarray,
    explicit: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-batch computation of y (positives) and the
    include-mask (positives + unambiguous negatives) — the UDF-side
    mirror of SO1/SO2, O(rows x L) numpy.

    With explicit=True the two list columns are EXPLICIT per-item
    positive/negative label sets (e.g. from `cdc_training_sets`):
    y = membership in the first, mask = union of both — no ancestor
    lifting or ambiguity inference."""
    n, L = len(label_lists), anc_strict.shape[0]
    lab_ind = np.zeros((n, L), dtype=bool)
    ms_ind = np.zeros((n, L), dtype=bool)
    for i, labs in enumerate(label_lists):
        for l in labs:
            j = pos_of.get(l)
            if j is not None:
                lab_ind[i, j] = True
    for i, labs in enumerate(ms_lists):
        for l in labs:
            j = pos_of.get(l)
            if j is not None:
                ms_ind[i, j] = True
    if explicit:
        return lab_ind, lab_ind | ms_ind
    # pos[i, l] = item carries l or any descendant: lift each carried
    # label onto its ancestors-with-self
    y = (lab_ind @ anc_with_self) > 0
    # ambig[i, l] = some most-specific label of i is a strict ancestor
    # of l
    ambig = (ms_ind @ anc_strict.T) > 0
    mask = y | ~ambig
    return y, mask


# ---------------------------------------------------------------------------
# Distributed IRLS ensemble fit
# ---------------------------------------------------------------------------

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("pid", T.IntegerType()),
        T.StructField("kind", T.StringType()),  # 'counts' | 'newton'
        T.StructField("payload", T.ArrayType(T.DoubleType())),
    ]
)


def _prep_training_frame(
    features: DataFrame,  # (item, features)
    labels_long: DataFrame,  # (item, label)
    ms_labels_long: DataFrame | None,  # (item, ms_label)
    item_sidx: DataFrame | None,  # (item, study_idx) dense study index
) -> DataFrame:
    """(item, features, labels, ms_labels, study_idx) — one row per
    item (study_idx = -1 when the item has no study). The only shuffles
    in the whole fit: these groupBy(item) collects (and they are keyed
    by the same column, so they co-partition)."""
    labs = labels_long.groupBy("item").agg(
        F.array_sort(F.collect_set("label")).alias("labels")
    )
    out = features.join(labs, "item")
    if ms_labels_long is not None:
        ms = ms_labels_long.groupBy("item").agg(
            F.array_sort(F.collect_set("ms_label")).alias("ms_labels")
        )
        out = out.join(ms, "item", "left")
    else:
        out = out.withColumn("ms_labels", F.array().cast("array<string>"))
    if item_sidx is not None:
        out = out.join(item_sidx, "item", "left")
    else:
        out = out.withColumn("study_idx", F.lit(-1))
    return out.select(
        "item",
        "features",
        "labels",
        F.coalesce("ms_labels", F.array().cast("array<string>")).alias("ms_labels"),
        F.coalesce("study_idx", F.lit(-1)).cast("int").alias("study_idx"),
    )


def _study_index(item_study: DataFrame) -> tuple[DataFrame, int]:
    """(item, study_idx) with a dense deterministic study index +
    the study count. Studies are a bounded dimension (hundreds in the
    reference's resource bundle), so the dim collects driver-side and
    broadcasts back."""
    spark = item_study.sparkSession
    studies = sorted(
        r["study"] for r in item_study.select("study").distinct().collect()
    )
    sdim = spark.createDataFrame(
        [(s, i) for i, s in enumerate(studies)], "study string, study_idx int"
    )
    return (
        item_study.join(F.broadcast(sdim), "study").select("item", "study_idx"),
        len(studies),
    )


def fit_hierarchical_lr(
    features: DataFrame,  # (item, features: array<double>)
    labels_long: DataFrame,  # (item, label)
    label_edges: list[tuple[str, str]],  # (child, parent) over the label DAG
    ms_labels_long: DataFrame | None = None,  # (item, ms_label); None => labels
    item_study: DataFrame | None = None,  # (item, study) for M9 weighting
    l2: float = 1.0,
    n_iter: int = 8,
    balanced: bool = True,
    training_sets: DataFrame | None = None,  # (item, label, y) explicit sets
) -> pd.DataFrame:
    """Distributed Newton (IRLS) fit of one L2 logistic regression per
    label, all labels at once. Returns a weights frame
    (label, coef, intercept, is_trivial) for `LinkingModel.from_tables`.

    By default per-label positives/negatives follow SO1/SO2 (ancestor
    lift + ambiguity exclusion, recomputed per Arrow batch from the
    broadcast masks). Pass `training_sets` = (item, label, y∈{0,1}) to
    fit on EXPLICIT per-label sets instead (e.g. `cdc_training_sets`
    for the reference's CDC variant,
    cascaded_discriminative_classifiers.py:196-261); `labels_long` /
    `ms_labels_long` are then ignored for set construction and the
    label universe comes from `training_sets`.

    Study weighting (M9) follows the reference exactly: item weight
    for label l = 1/|items of the same study within l's OWN pos+neg
    set| (ensemble_binary_classifiers.py:238-251). The count pass
    accumulates the L×|studies| masked group sizes map-side (a few MB
    for hundreds of labels × hundreds of studies), and the Newton pass
    indexes the broadcast inverse-size matrix per (item, label).

    Per iteration: one map-side-only pass over the (cached) training
    frame; each partition ships back L packed (d+1)² Hessian partials +
    (d+1) gradient partials. Driver sums partials sorted by partition
    id (bit-deterministic), solves L small systems, rebroadcasts W.
    """
    spark = features.sparkSession
    explicit = training_sets is not None
    label_src = training_sets if explicit else labels_long
    labels = sorted(
        r["label"] for r in label_src.select("label").distinct().collect()
    )
    L = len(labels)
    pos_of = {l: i for i, l in enumerate(labels)}
    anc_strict, anc_with_self = _ancestor_masks(labels, label_edges)

    if item_study is not None:
        item_sidx, S = _study_index(item_study)
    else:
        item_sidx, S = None, 0

    if explicit:
        # one groupBy(item): pos set in `labels`, neg set in
        # `ms_labels` (collect_set drops the NULLs the CASEs emit)
        per_item = training_sets.groupBy("item").agg(
            F.array_sort(
                F.collect_set(F.when(F.col("y") == 1, F.col("label")))
            ).alias("labels"),
            F.array_sort(
                F.collect_set(F.when(F.col("y") == 0, F.col("label")))
            ).alias("ms_labels"),
        )
        train = features.join(per_item, "item")
        if item_sidx is not None:
            train = train.join(item_sidx, "item", "left")
        else:
            train = train.withColumn("study_idx", F.lit(-1))
        train = train.select(
            "item", "features", "labels", "ms_labels",
            F.coalesce("study_idx", F.lit(-1)).cast("int").alias("study_idx"),
        ).persist()
    else:
        if ms_labels_long is None:
            # default: most-specific labels = the labels themselves
            # pruned to leaves of each item's own label set; for
            # ancestor-closed label sets this equals the reference's
            # exp_to_ms_labels
            ms_labels_long = most_specific_labels(labels_long, label_edges)

        train = _prep_training_frame(
            features, labels_long, ms_labels_long, item_sidx
        ).persist()
    first = train.select("features").first()
    if first is None:
        train.unpersist()
        raise ValueError(
            "fit_hierarchical_lr: empty training frame — features ⋈ "
            "labels produced no rows (check the item keys match)"
        )
    d = len(first["features"])

    bc_masks = spark.sparkContext.broadcast(
        (pos_of, anc_strict, anc_with_self, explicit)
    )

    # ---- pass 0: per-label masked counts + per-(label, study) sizes ---
    Sn = S

    def count_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pos_of_, anc_s, anc_ws, expl = bc_masks.value
        Ln = anc_s.shape[0]
        acc = np.zeros(2 * Ln + Sn * Ln, dtype=np.float64)
        grp = acc[2 * Ln :].reshape(Sn, Ln) if Sn else None
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            y, mask = _batch_y_mask(
                pdf["labels"], pdf["ms_labels"], pos_of_, anc_s, anc_ws, expl
            )
            # UNWEIGHTED masked counts: sklearn's
            # class_weight='balanced' uses plain bincounts over each
            # label's own pos+neg set, not sample-weighted ones
            acc[:Ln] += (y & mask).sum(axis=0)
            acc[Ln : 2 * Ln] += (~y & mask).sum(axis=0)
            if Sn:
                # |group ∩ (pos ∪ neg of label)| — the exact group the
                # reference normalizes by, per label
                sidx = pdf["study_idx"].to_numpy(dtype=np.int64)
                valid = sidx >= 0
                if valid.any():
                    np.add.at(grp, sidx[valid], mask[valid].astype(np.float64))
        if seen:
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame(
                {"pid": [pid], "kind": ["counts"], "payload": [acc.tolist()]}
            )

    counts = np.zeros(2 * L + S * L)
    for row in sorted(
        train.mapInPandas(count_pass, _PARTIAL_SCHEMA).collect(),
        key=lambda r: r["pid"],
    ):
        counts += np.asarray(row["payload"])
    c_pos, c_neg = counts[:L], counts[L : 2 * L]
    trivial = c_neg <= 0.0
    if balanced:
        # balanced class weights from UNWEIGHTED per-label masked
        # counts — sklearn semantics (the reference passes
        # class_weight='balanced' to LogisticRegression,
        # binary_classifier.py:22-29)
        tot = c_pos + c_neg
        w_pos = np.where(c_pos > 0, tot / (2.0 * np.maximum(c_pos, 1e-12)), 0.0)
        w_neg = np.where(c_neg > 0, tot / (2.0 * np.maximum(c_neg, 1e-12)), 0.0)
    else:
        w_pos = np.ones(L)
        w_neg = np.ones(L)
    if S:
        # inverse per-(label, study) group sizes; an extra all-ones
        # column serves items with no study (study_idx = -1 → index S)
        sizes = counts[2 * L :].reshape(S, L).T  # (L, S)
        inv_aug = np.concatenate(
            [np.where(sizes > 0, 1.0 / np.maximum(sizes, 1e-12), 0.0),
             np.ones((L, 1))],
            axis=1,
        )
    else:
        inv_aug = None

    # ---- Newton iterations -------------------------------------------
    W = np.zeros((L, d), dtype=np.float64)
    b = np.zeros(L, dtype=np.float64)
    dd = d + 1  # bias column appended
    bc_cw = spark.sparkContext.broadcast((w_pos, w_neg, inv_aug, Sn))

    for _ in range(n_iter):
        bc_W = spark.sparkContext.broadcast((W.copy(), b.copy()))

        def newton_pass(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pos_of_, anc_s, anc_ws, expl = bc_masks.value
            Wl, bl = bc_W.value
            wp, wn, inv_g, Sn_ = bc_cw.value
            Ln = anc_s.shape[0]
            H = np.zeros((Ln, dd, dd), dtype=np.float64)
            g = np.zeros((Ln, dd), dtype=np.float64)
            seen = False
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                seen = True
                X = np.stack(
                    [np.asarray(f, dtype=np.float64) for f in pdf["features"]]
                )
                Xb = np.concatenate([X, np.ones((len(X), 1))], axis=1)
                y, mask = _batch_y_mask(
                    pdf["labels"], pdf["ms_labels"], pos_of_, anc_s, anc_ws, expl
                )
                if Sn_:
                    # per-(item, label) study weight: 1/|group within
                    # this label's pos+neg set| (index Sn_ = no study)
                    sidx = pdf["study_idx"].to_numpy(dtype=np.int64)
                    w_item = inv_g[:, np.where(sidx < 0, Sn_, sidx)].T
                else:
                    w_item = 1.0
                P = sigmoid(X @ Wl.T + bl)
                cw = np.where(y, wp[None, :], wn[None, :]) * w_item * mask
                # gradient: X'((p - y) * cw); curvature: X'diag(s)X,
                # s = p(1-p)*cw (one einsum per batch, all labels)
                R = (P - y.astype(np.float64)) * cw
                S = P * (1.0 - P) * cw
                g += np.einsum("nd,nl->ld", Xb, R)
                H += np.einsum("nl,nd,ne->lde", S, Xb, Xb)
            if seen:
                payload = np.concatenate(
                    [H.reshape(Ln * dd * dd), g.reshape(Ln * dd)]
                )
                yield pd.DataFrame(
                    {
                        "pid": [TaskContext.get().partitionId()],
                        "kind": ["newton"],
                        "payload": [payload.tolist()],
                    }
                )

        rows = train.mapInPandas(newton_pass, _PARTIAL_SCHEMA).collect()
        H = np.zeros((L, dd, dd))
        g = np.zeros((L, dd))
        # deterministic accumulation order (partition id)
        for row in sorted(rows, key=lambda r: r["pid"]):
            p = np.asarray(row["payload"])
            H += p[: L * dd * dd].reshape(L, dd, dd)
            g += p[L * dd * dd :].reshape(L, dd)
        # L2 on weights only (bias unregularized — the reference's
        # intercept_scaling=1000 effect)
        reg = l2 * np.eye(dd)
        reg[-1, -1] = 0.0
        for l in range(L):
            if trivial[l]:
                continue
            gl = g[l].copy()
            gl[:-1] += l2 * W[l]
            try:
                delta = np.linalg.solve(H[l] + reg, gl)
            except np.linalg.LinAlgError:
                # perfect separation can drive p(1-p) → 0 and leave the
                # unregularized bias row singular; least-squares keeps
                # the step finite instead of crashing the whole fit
                delta = np.linalg.lstsq(H[l] + reg, gl, rcond=None)[0]
            W[l] -= delta[:-1]
            b[l] -= delta[-1]
        bc_W.destroy()

    train.unpersist()
    return pd.DataFrame(
        {
            "label": labels,
            "coef": [W[l].tolist() for l in range(L)],
            "intercept": b.astype(np.float64),
            "is_trivial": trivial,
        }
    )


def save_model(weights_pdf: pd.DataFrame, path: str) -> None:
    """Persist a fitted weights frame (label, coef, intercept,
    is_trivial) as parquet — the reference dill-serializes the whole
    model object (cello_predict.py:148-159); a columnar table is the
    engine-portable equivalent (readable by Spark, pandas, DuckDB) and
    is what `LinkingModel.from_tables` consumes at score time."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(weights_pdf, preserve_index=False), path)


def load_model(path: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(path).to_pandas()


def most_specific_labels(
    labels_long: DataFrame, label_edges: list[tuple[str, str]]
) -> DataFrame:
    """Per-item most-specific labels (drop any label that is a strict
    ancestor of another label the item carries) — the reference's
    exp_to_ms_labels (load_training_data.py:71-76). Output
    (item, ms_label)."""
    spark = labels_long.sparkSession
    if not label_edges:
        # no hierarchy → nothing can be dominated; skip the join
        # entirely (a sentinel self-pair here would wrongly dominate an
        # item actually carrying the sentinel as a label)
        return labels_long.select("item", F.col("label").alias("ms_label"))
    labels = sorted({x for e in label_edges for x in e})
    anc_strict, _ = _ancestor_masks(labels, label_edges)
    pairs = [
        (labels[i], labels[j])
        for i in range(len(labels))
        for j in np.nonzero(anc_strict[i])[0]
    ]
    if not pairs:
        return labels_long.select("item", F.col("label").alias("ms_label"))
    closure = spark.createDataFrame(
        pairs, "descendant string, ancestor string"
    )
    dominated = (
        labels_long.alias("d")
        .join(
            F.broadcast(closure).alias("c"),
            F.col("d.label") == F.col("c.descendant"),
        )
        .select("item", F.col("c.ancestor").alias("label"))
        .distinct()
        .join(labels_long, ["item", "label"], "left_semi")
    )
    return labels_long.join(dominated, ["item", "label"], "left_anti").select(
        "item", F.col("label").alias("ms_label")
    )
