"""Two-level (coarse-branch) k-means assignment routing — the VERDICT
r5 fix for semantic_dedup's above-linear assignment step: past
TWO_LEVEL_MIN_CELLS cells, assignment scans ~sqrt(C) branch centroids
plus the probed branches' cells instead of all C cells.

The routing is the standard IVF/hierarchical trade: EXACT when the
centroid set has branch structure (trained centroids at scale are data
modes, which cluster), APPROXIMATE on unstructured centroid sets —
a border vector may land in a neighboring cell. SemDeDup's cells are
themselves a recall heuristic (pairs straddling cells are lost by
design, Abbas et al. 2023), and near-duplicate pairs have (near-)
identical vectors so they route IDENTICALLY — which is why the
DROP-SET is preserved even where individual assignments move. Pinned
below: exact equality on clustered data, identical-direction routing,
equal drop-set on the real corpus, bounded inertia degradation.
"""

import numpy as np
from pyspark.sql import functions as F

from mod_reservoir_spark.pipeline import similarity as sim

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _clustered(n_branches=8, per_branch=12, n_rows=400, d=16, spread=0.05):
    """Centroids with genuine branch structure (tight groups around
    well-separated anchors) + rows near those anchors — the shape
    trained centroids have at scale."""
    rng = np.random.RandomState(7)
    anchors = rng.randn(n_branches, d) * 3
    cm = np.concatenate(
        [a + rng.randn(per_branch, d) * spread for a in anchors]
    )
    rows = anchors[rng.randint(0, n_branches, n_rows)] + rng.randn(
        n_rows, d
    ) * spread
    return rows, cm


def test_nearest_cells_exact_on_clustered_centroids():
    """On branch-structured centroids the routed path returns the
    IDENTICAL (cell, score) as the flat scan — including round-6 ties
    (two identical centroids planted: lower id must win in both)."""
    vm, cm = _clustered()
    cm[41] = cm[17]  # exact tie: round-6-equal scores
    cnorm = np.sqrt((cm * cm).sum(axis=1))
    flat_cell, flat_s = sim._nearest_cells(vm, cm, cnorm, None)
    plan = sim._branch_plan(cm)
    got_cell, got_s = sim._nearest_cells(vm, cm, cnorm, plan)
    assert (flat_cell == got_cell).all()
    assert (flat_s == got_s).all()


def test_identical_directions_route_identically():
    """A vector and its positive scaling (a planted near-dup) must get
    the SAME cell — the property that preserves the drop-set: cosine
    routing is scale-invariant at every level."""
    rng = np.random.RandomState(11)
    cm = rng.randn(300, 16)
    cnorm = np.sqrt((cm * cm).sum(axis=1))
    v = rng.randn(50, 16)
    plan = sim._branch_plan(cm)
    c1, s1 = sim._nearest_cells(v, cm, cnorm, plan)
    c2, s2 = sim._nearest_cells(v * 1.5, cm, cnorm, plan)
    assert (c1 == c2).all()
    assert (s1 == s2).all()


def test_routed_never_beats_flat_and_stays_close():
    """Routed best-cosine is <= flat best-cosine per row (it scans a
    subset), and on unstructured data the degradation stays bounded
    (mean score gap small) — the honest approximation contract."""
    rng = np.random.RandomState(7)
    vm = rng.randn(400, 16)
    cm = rng.randn(100, 16)
    cnorm = np.sqrt((cm * cm).sum(axis=1))
    _fc, fs = sim._nearest_cells(vm, cm, cnorm, None)
    plan = sim._branch_plan(cm)
    _gc, gs = sim._nearest_cells(vm, cm, cnorm, plan)
    assert (gs <= fs + 1e-12).all()
    assert float(np.mean(fs - gs)) < 0.05


def test_ivf_assign_two_level_runs_and_matches_mostly(spark):
    """On the real corpus the routed ivf_assign agrees with flat on
    the overwhelming majority of rows (random synthetic embeddings are
    the WORST case for routing) and is bitwise-deterministic."""
    emb = _emb(spark)
    flat = {
        r.vec_id: r.cell
        for r in sim.ivf_assign(emb, n_centroids=25, two_level=False).collect()
    }
    routed = {
        r.vec_id: r.cell
        for r in sim.ivf_assign(emb, n_centroids=25, two_level=True).collect()
    }
    agree = sum(flat[k] == routed[k] for k in flat)
    assert agree >= 0.5 * len(flat)
    again = {
        r.vec_id: r.cell
        for r in sim.ivf_assign(emb, n_centroids=25, two_level=True).collect()
    }
    assert routed == again


def test_kmeans_two_level_inertia_close(spark):
    """Routed Lloyd converges to a clustering of comparable quality:
    final inertia within 10% of the flat trajectory's on the real
    corpus (worst-case unstructured data)."""
    emb = _emb(spark)
    _cf, h_flat = sim.kmeans_train(
        emb, n_centroids=25, iterations=3, two_level=False
    )
    _ct, h_two = sim.kmeans_train(
        emb, n_centroids=25, iterations=3, two_level=True
    )
    assert h_two[-1] <= h_flat[-1] * 1.10


def test_semantic_dedup_two_level_equal_dropset(spark):
    """The VERDICT done-criterion: equal drop-set vs the flat path on
    the real corpus (with planted scaled copies, the contract shape)."""
    emb = _emb(spark)
    planted = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.5)).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)

    def dropset(two_level):
        return {
            (r.vec_id, r.keep_id, r.is_kept)
            for r in sim.semantic_dedup(
                corpus, n_clusters=16, threshold=0.95, iterations=2,
                two_level=two_level,
            ).collect()
        }

    a = dropset(False)
    b = dropset(True)
    assert a == b
    assert any(not kept for _v, _k, kept in a)  # planted dups dropped


def test_auto_threshold_routes_only_large():
    rng = np.random.RandomState(3)
    small = rng.randn(10, 8)
    big = rng.randn(sim.TWO_LEVEL_MIN_CELLS, 8)
    assert sim._maybe_plan(small, "auto") is None
    assert sim._maybe_plan(big, "auto") is not None
    assert sim._maybe_plan(small, True) is not None
    assert sim._maybe_plan(big, False) is None
