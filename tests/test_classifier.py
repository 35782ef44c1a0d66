"""Hashed-feature logistic quality classifier: separates topics,
matches an in-memory numpy reference, and the score path is stable."""

import numpy as np
import pytest

from mod_reservoir_spark.pipeline.classifier import (
    _feature_table,
    logreg_score,
    logreg_train,
)

B = 1 << 12


def _corpus(spark, n=120):
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, f"stellar spectra redshift galaxy survey run {i % 5}"))
        else:
            rows.append((i, f"butter flour sugar oven recipe bake batch {i % 5}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_logreg_separates_topics(spark):
    docs = _corpus(spark)
    pos = docs.filter("doc_id % 2 = 0 and doc_id < 60")
    neg = docs.filter("doc_id % 2 = 1 and doc_id < 60")
    w, hist = logreg_train(pos, neg, buckets=B, iterations=12)
    assert hist[-1] < hist[0]  # loss decreased
    held = docs.filter("doc_id >= 60")
    got = {r.doc_id: r.score_e6 for r in logreg_score(held, w, buckets=B).collect()}
    acc = sum(
        1 for d, s in got.items() if (s > 500000) == (d % 2 == 0)
    ) / len(got)
    assert acc == 1.0, acc


def test_logreg_matches_numpy_reference(spark):
    docs = _corpus(spark, 60)
    pos = docs.filter("doc_id % 2 = 0")
    neg = docs.filter("doc_id % 2 = 1")
    iters, lr, l2 = 6, 2.0, 1e-6
    w, hist = logreg_train(pos, neg, buckets=B, iterations=iters, lr=lr, l2=l2)

    # independent dense reference from the same feature table
    rows = []
    for label, side in ((1.0, pos), (0.0, neg)):
        for r in _feature_table(side, "text", "doc_id", 2, B).collect():
            x = np.zeros(B + 1)
            x[np.asarray(r.bks, dtype=np.int64)] = np.asarray(r.vals)
            x[-1] = 1.0
            rows.append((label, x))
    X = np.stack([x for _, x in rows])
    y = np.array([l for l, _ in rows])
    wr = np.zeros(B + 1)
    ref_hist = []
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ wr)))
        grad = X.T @ (p - y)
        reg = l2 * wr.copy()
        reg[-1] *= 1.0  # bias regularized identically in both impls
        wr = wr - lr * (grad / len(y) + reg)
        loss = -(y * np.log(np.maximum(p, 1e-12))
                 + (1 - y) * np.log(np.maximum(1 - p, 1e-12))).mean()
        ref_hist.append(loss)
    assert np.allclose(w, wr, rtol=1e-9, atol=1e-12)
    assert np.allclose(hist, ref_hist, rtol=1e-6)


def test_logreg_score_edge_rows(spark):
    docs = spark.createDataFrame(
        [(1, "stellar spectra galaxy"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    w = np.zeros(B + 1)
    got = {r.doc_id: r for r in logreg_score(docs, w, buckets=B).collect()}
    assert set(got) == {1, 2, 3}
    # zero weights -> sigmoid(0) for everyone, featureless included
    assert all(r.score_e6 == 500000 for r in got.values())
    assert got[2].n_feats == 0 and got[3].n_feats == 0


def test_logreg_score_string_ids(spark):
    """id_col types other than long must survive the scoring schema."""
    docs = spark.createDataFrame(
        [("u1", "stellar spectra galaxy"), ("u2", "butter flour sugar")],
        "url string, text string",
    )
    w = np.zeros(B + 1)
    got = {r.url: r.score_e6 for r in
           logreg_score(docs, w, id_col="url", buckets=B).collect()}
    assert got == {"u1": 500000, "u2": 500000}
