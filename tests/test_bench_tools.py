"""The bench band check + band-refresh fold (VERDICT r11 Next #1):
bench.py compares every row's draw against BENCH_ADJUDICATED's
[min, max] band and writes violations into the sidecar mechanically;
tools/bench_median.py --fold appends fresh independent draws as a new
box period so a row whose code changed (or a fresh promotion) gets its
band re-drawn the same round. No Spark needed — both are pure-JSON
logic tested against synthetic artifacts."""

import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))


ADJ = {
    "protocol": "synthetic",
    "metric": "headline_total",
    "sf": 0.1,
    "periods": {"first": [20.0, 21.0]},
    "headline": {"median": 20.5, "min": 20.0, "max": 21.0,
                 "runs": [20.0, 21.0]},
    "queries": {
        "q_stable": {"median": 1.0, "min": 0.9, "max": 1.1,
                     "runs": [0.9, 1.1]},
        "q_drifty": {"median": 2.0, "min": 1.8, "max": 2.2,
                     "runs": [1.8, 2.2]},
    },
}


@pytest.fixture()
def adj_file(tmp_path):
    import bench

    dest = tmp_path / "BENCH_ADJUDICATED.json"
    dest.write_text(json.dumps(ADJ))
    return bench, str(dest)


def test_band_check_flags_violations_and_fresh_rows(adj_file):
    bench, path = adj_file
    out = bench.band_check(
        {"q_stable": 1.0, "q_drifty": 3.1, "q_new": 0.4},
        20.5,
        "0.1",
        path=path,
    )
    assert out is not None
    assert out["no_band"] == ["q_new"]
    assert [v["query"] for v in out["violations"]] == ["q_drifty"]
    v = out["violations"][0]
    assert v["side"] == "above" and v["band"] == [1.8, 2.2]
    assert out["headline"]["in_band"] is True


def test_band_check_skips_mismatched_sf(adj_file):
    bench, path = adj_file
    assert (
        bench.band_check({"q_stable": 1.0}, 20.5, "0.01", path=path)
        is None
    )


def test_band_check_missing_artifact_is_none():
    import bench

    assert (
        bench.band_check({"q": 1.0}, 1.0, "0.1", path="/nonexistent.json")
        is None
    )


def test_band_check_below_side(adj_file):
    bench, path = adj_file
    out = bench.band_check({"q_drifty": 0.5}, 20.5, "0.1", path=path)
    assert out["violations"][0]["side"] == "below"


def test_fold_appends_period_and_recomputes(tmp_path):
    import bench_median

    dest = str(tmp_path / "adj.json")
    with open(dest, "w") as f:
        json.dump(ADJ, f)
    runs = [
        {"value": 22.0, "sf": 0.1, "metric": "headline_total",
         "queries": {"q_stable": 1.3, "q_new": 0.4}},
        {"value": 19.0, "sf": 0.1, "metric": "headline_total",
         "queries": {"q_stable": 0.8, "q_new": 0.5}},
    ]
    art = bench_median.fold(dest, runs, "r12")
    assert art["periods"]["r12"] == [22.0, 19.0]
    # widened band over ALL runs, not just the fresh ones
    q = art["queries"]["q_stable"]
    assert q["runs"] == [0.9, 1.1, 1.3, 0.8]
    assert (q["min"], q["max"]) == (0.8, 1.3)
    # fresh promotion gets its first band from the fold alone
    assert art["queries"]["q_new"]["runs"] == [0.4, 0.5]
    # a query that left the contract keeps its historical band
    assert art["queries"]["q_drifty"]["runs"] == [1.8, 2.2]
    assert len(art["headline"]["runs"]) == 4


def test_fold_refuses_cross_sf_and_duplicate_period(tmp_path):
    import bench_median

    dest = str(tmp_path / "adj.json")
    with open(dest, "w") as f:
        json.dump(ADJ, f)
    bad_sf = [{"value": 1.0, "sf": 0.01, "metric": "headline_total",
               "queries": {}}]
    with pytest.raises(RuntimeError, match="scale factors"):
        bench_median.fold(dest, bad_sf, None)
    dup = [{"value": 1.0, "sf": 0.1, "metric": "headline_total",
            "queries": {}}]
    with pytest.raises(RuntimeError, match="already recorded"):
        bench_median.fold(dest, dup, "first")


def test_merge_write_sidecar_preserves_foreign_keys(tmp_path):
    """VERDICT r12 finding #1: the per-round CC telemetry write used to
    rewrite CC_TELEMETRY.json wholesale, destroying the hand-recorded
    `adversarial_hub_10m` decade point. The sidecar writer must refresh
    only the keys it owns and let foreign keys survive."""
    import bench

    p = str(tmp_path / "side.json")
    with open(p, "w") as f:
        json.dump({"foreign_10m": {"seconds": 33.47}, "owned": 1}, f)
    merged = bench.merge_write_sidecar(p, {"owned": 2, "fresh": "x"})
    assert merged == {
        "foreign_10m": {"seconds": 33.47}, "owned": 2, "fresh": "x"
    }
    with open(p) as f:
        assert json.load(f) == merged
    # corrupt file starts fresh instead of raising
    with open(p, "w") as f:
        f.write("{not json")
    assert bench.merge_write_sidecar(p, {"a": 1}) == {"a": 1}
    # missing file is created
    p2 = str(tmp_path / "new.json")
    assert bench.merge_write_sidecar(p2, {"b": 2}) == {"b": 2}


def test_committed_cc_telemetry_carries_the_10m_point():
    """The restored artifact of record must keep both hub entries —
    this is the regression the merge-writer exists to prevent."""
    with open(os.path.join(ROOT, "CC_TELEMETRY.json")) as f:
        art = json.load(f)
    assert "adversarial_hub" in art
    assert art["adversarial_hub_10m"]["hub_fanout"] == 10_000_000


def test_fold_refuses_unadjudicated_regression(tmp_path):
    """VERDICT r13 Next #9: a fold must never silently absorb a draw
    set whose median is >1.5x the existing band median (the kn_logprob
    lesson — regressed r13 draws refolded the band so band_check could
    no longer flag the regression)."""
    import bench_median

    dest = str(tmp_path / "adj.json")
    with open(dest, "w") as f:
        json.dump(ADJ, f)
    runs = [
        {"value": 22.0, "sf": 0.1, "metric": "headline_total",
         "queries": {"q_stable": 1.9}},
        {"value": 23.0, "sf": 0.1, "metric": "headline_total",
         "queries": {"q_stable": 2.1}},
    ]
    with pytest.raises(RuntimeError, match="q_stable"):
        bench_median.fold(dest, runs, "r14")
    # the refusal happened before any mutation
    with open(dest) as f:
        art = json.load(f)
    assert "r14" not in art.get("periods", {})
    assert art["queries"]["q_stable"]["runs"] == [0.9, 1.1]
    # an explicit adjudication folds and is recorded in the artifact
    art = bench_median.fold(dest, runs, "r14", adjudicated={"q_stable"})
    assert art["queries"]["q_stable"]["runs"] == [0.9, 1.1, 1.9, 2.1]
    assert art["adjudications"]["q_stable"] == ["r14"]


def test_fold_purges_named_rows_before_folding(tmp_path):
    """--purge rebuilds a band from post-fix draws only (the r13 kn /
    bm25 bands polluted by regressed-code draws)."""
    import bench_median

    dest = str(tmp_path / "adj.json")
    with open(dest, "w") as f:
        json.dump(ADJ, f)
    runs = [
        {"value": 20.0, "sf": 0.1, "metric": "headline_total",
         "queries": {"q_drifty": 1.0}},
        {"value": 20.5, "sf": 0.1, "metric": "headline_total",
         "queries": {"q_drifty": 1.2}},
    ]
    art = bench_median.fold(dest, runs, "r14", purge={"q_drifty"})
    q = art["queries"]["q_drifty"]
    assert q["runs"] == [1.0, 1.2]  # historical 1.8/2.2 purged
    assert art["purged"]["q_drifty"] == ["r14"]
