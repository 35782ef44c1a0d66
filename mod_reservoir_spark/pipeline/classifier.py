"""Trainable quality classifier — the fastText-style filter the
GPT-3/LLaMA curation recipes use (positives = a reference corpus that
looks like what you want, negatives = random crawl; score everything,
keep the high end). Logistic regression over hashed bag-of-n-gram
features, trained with full-batch gradient descent on the cluster.

Scale shape (the ``kmeans_train`` pattern): features are built ONCE
(one narrow pass + one combinable (id, bucket) aggregation, persisted);
each training iteration broadcasts the weight vector and makes one
corpus pass in which every Arrow batch emits a PARTIAL gradient sum —
what reaches the driver is tasks × (buckets+1) doubles per iteration,
never per-document rows. The driver update is a few numpy lines.
Discriminative sibling of :func:`~mod_reservoir_spark.pipeline.
sampling.dsir_model` (generative log-ratio): same features, trained
weights instead of count ratios.

Features are L1-normalized term counts (x = tf / Σtf) plus a bias —
document-length invariant, the fastText mean-of-embeddings shape with
one-hot bucket embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mod_reservoir_spark.pipeline.sampling import hashed_ngram_features


def _feature_table(
    docs: DataFrame, text_col: str, id_col: str, n_max: int, buckets: int
) -> DataFrame:
    """(id, bks array<long>, vals array<double>) sparse L1-normalized
    rows; docs with no features are DROPPED (nothing to learn/score
    from — scorers emit 500000 = the sigmoid of 0 for them)."""
    feats = hashed_ngram_features(docs, text_col, id_col, n_max, buckets)
    return (
        feats.groupBy(id_col)
        .agg(
            F.collect_list("bucket").alias("bks"),
            F.collect_list(F.col("tf").cast("double")).alias("tfs"),
        )
        # total computed ONCE per row: a lambda referencing the
        # aggregate re-evaluates it per element (no CSE inside
        # higher-order functions — the shingle-ladder lesson), turning
        # the normalization O(k²) per document
        .withColumn(
            "_tot", F.aggregate("tfs", F.lit(0.0), lambda a, x: a + x)
        )
        .select(
            id_col,
            "bks",
            F.transform("tfs", lambda t: t / F.col("_tot")).alias("vals"),
        )
    )


def logreg_train(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 2,
    buckets: int = 1 << 15,
    iterations: int = 30,
    lr: float = 2.0,
    l2: float = 1e-6,
):
    """Train the classifier; returns (weights, loss_history) where
    ``weights`` is a numpy array of length buckets+1 (bias last) and
    the history holds the mean log-loss per iteration (decreasing =
    converging). Deterministic up to float summation order — pinned
    against an in-memory numpy reference by test at rtol 1e-9."""
    import numpy as np

    pos = _feature_table(positives, text_col, id_col, n_max, buckets)
    neg = _feature_table(negatives, text_col, id_col, n_max, buckets)
    data = (
        pos.select(F.lit(1.0).alias("y"), "bks", "vals")
        .unionByName(neg.select(F.lit(0.0).alias("y"), "bks", "vals"))
        .persist()
    )
    n_rows = data.count()  # also materializes the persist
    if not n_rows:
        raise ValueError("logreg_train: no feature rows")
    sc = data.sparkSession.sparkContext
    # Size the per-iteration gradient pass to the DATA, not to the
    # union's shuffle partitioning: the cached frame keeps its build
    # partitioning (2 x shuffle.partitions from the two groupBys —
    # AQE does not re-coalesce under a cache by default), so every
    # iteration would otherwise launch that many near-empty tasks.
    # coalesce() on the cached frame is a narrow merge — no shuffle,
    # no re-materialization — and the bound is row-derived, so a
    # corpus big enough to fill the partitions keeps them all
    # (guide §2: partition counts must be scale-adaptive, not tuned
    # to either local mode or the cluster).
    rows_per_task = 20_000
    k = max(1, min(
        data.rdd.getNumPartitions(),
        -(-n_rows // rows_per_task),
    ))
    data_iter = data.coalesce(k)
    w = np.zeros(buckets + 1)
    history: list[float] = []
    dim = buckets + 1
    try:
        for _ in range(iterations):
            bc = sc.broadcast(w)

            def partials(batches, bc=bc, dim=dim):
                import pandas as pd

                wv = bc.value
                g = np.zeros(dim)
                loss = 0.0
                seen = False
                for pdf in batches:
                    if not len(pdf):
                        continue
                    seen = True
                    for y, bks, vals in zip(
                        pdf["y"], pdf["bks"], pdf["vals"]
                    ):
                        bks = np.asarray(bks, dtype=np.int64)
                        vals = np.asarray(vals, dtype=np.float64)
                        z = float(vals @ wv[bks]) + wv[-1]
                        p = 1.0 / (1.0 + np.exp(-z))
                        err = p - y
                        np.add.at(g, bks, err * vals)
                        g[-1] += err
                        loss += (
                            -np.log(max(p, 1e-12))
                            if y
                            else -np.log(max(1.0 - p, 1e-12))
                        )
                if seen:
                    yield pd.DataFrame(
                        {"g": [g.tolist()], "loss": [loss]}
                    )

            rows = data_iter.mapInPandas(
                partials, schema="g array<double>, loss double"
            ).collect()
            grad = np.zeros(dim)
            loss = 0.0
            for r in rows:
                grad += np.asarray(r["g"])
                loss += r["loss"]
            w = w - lr * (grad / n_rows + l2 * w)
            history.append(round(loss / n_rows, 8))
            bc.destroy()
    finally:
        data.unpersist()
    return w, history


def logreg_score(
    docs: DataFrame,
    weights,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 2,
    buckets: int = 1 << 15,
) -> DataFrame:
    """Score documents with trained weights: sigmoid(w·x + b) × 1e6 as
    a long (per-row deterministic quantization). Output: (id, n_feats,
    score_e6); featureless docs score sigmoid(bias). One feature pass
    + one Arrow-batched scoring map — the weight vector ships via
    broadcast, never a join."""
    import math

    import numpy as np

    wv = np.asarray(weights, dtype=np.float64)
    feats = _feature_table(docs, text_col, id_col, n_max, buckets)
    id_type = dict(docs.dtypes)[id_col]  # ids are not always long
    bc = docs.sparkSession.sparkContext.broadcast(wv)

    def score(batches, bc=bc):
        import pandas as pd

        w = bc.value
        for pdf in batches:
            out_scores = []
            out_n = []
            for bks, vals in zip(pdf["bks"], pdf["vals"]):
                bks = np.asarray(bks, dtype=np.int64)
                vals = np.asarray(vals, dtype=np.float64)
                z = float(vals @ w[bks]) + w[-1]
                out_scores.append(
                    int(round(1e6 / (1.0 + np.exp(-z))))
                )
                out_n.append(len(bks))
            yield pd.DataFrame(
                {
                    pdf.columns[0]: pdf[pdf.columns[0]],
                    "n_feats": pd.Series(out_n, dtype="int64"),
                    "score_e6": pd.Series(out_scores, dtype="int64"),
                }
            )

    scored = feats.mapInPandas(
        score, schema=f"{id_col} {id_type}, n_feats long, score_e6 long"
    )
    neutral = int(round(1e6 / (1.0 + math.exp(-float(wv[-1])))))
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("score_e6", F.lit(neutral))
            .cast("long")
            .alias("score_e6"),
        )
    )
