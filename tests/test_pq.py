"""Product-quantized ANN (pipeline/pq.py): cross-engine DuckDB
oracles for encode + ADC serving, exact equivalences, recall pins,
and the JVM-only serving plan guard. Everything is deterministic
(smallest-id seeds, round-6 + lowest-index ties), so recall numbers
are pinned, not thresholds-with-slack."""

import duckdb
import pytest

from mod_reservoir_spark.pipeline.pq import (
    _code_type,
    ivf_pq_topk,
    pq_encode,
    pq_index,
    pq_topk,
    pq_train,
)
from mod_reservoir_spark.pipeline.similarity import cosine_topk, kmeans_train
from tools.oracle_check import arrow_rows, table_hash

SF = "/root/testdata/sf0.001"
EMB = f"{SF}/embeddings.parquet"


def _cb_values(codebooks):
    """DuckDB VALUES rows (sub, cid, center DOUBLE[]) — full-precision
    repr literals so both engines start from identical float64s."""
    rows = []
    for sub, centers in enumerate(codebooks):
        for cid, c in enumerate(centers):
            arr = ", ".join(repr(x) for x in c)
            rows.append(f"({sub}, {cid}, [{arr}]::DOUBLE[])")
    return ",\n".join(rows)


def _encode_sql(codebooks, dsub):
    """codes per vec_id: per-subspace argmin of round-6 squared L2,
    ties -> lowest cid (the pq_encode rule)."""
    return f"""
WITH cb(sub, cid, center) AS (VALUES {_cb_values(codebooks)}),
dist AS (
  SELECT e.vec_id, cb.sub, cb.cid,
    round(list_sum(list_transform(range(1, {dsub} + 1),
      i -> (e.embedding[cb.sub * {dsub} + i]::DOUBLE - cb.center[i]) ^ 2)),
      6) AS d2
  FROM embeddings e, cb
),
best AS (
  SELECT vec_id, sub, cid,
    row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
  FROM dist
)
SELECT vec_id, list(cid ORDER BY sub) AS codes
FROM best WHERE rn = 1 GROUP BY vec_id
"""


def _adc_sql(codebooks, dsub, k, max_query_id):
    """Full ADC top-k: per-query LUT of subspace inner products, score
    = sum of m picked entries / (|q| * sqrt(sum of picked |c|^2)),
    round-6, rank by (score DESC, neighbor_id), self excluded."""
    return f"""
WITH cb(sub, cid, center) AS (VALUES {_cb_values(codebooks)}),
codes AS ({_encode_sql(codebooks, dsub)}),
q AS (SELECT vec_id AS query_id, embedding FROM embeddings
      WHERE vec_id < {max_query_id}),
lut AS (
  SELECT q.query_id, cb.sub, cb.cid,
    list_sum(list_transform(range(1, {dsub} + 1),
      i -> q.embedding[cb.sub * {dsub} + i]::DOUBLE * cb.center[i])) AS ip,
    list_sum(list_transform(cb.center, x -> x * x)) AS n2
  FROM q, cb
),
qn AS (
  SELECT vec_id AS query_id,
    round(sqrt(list_sum(list_transform(embedding,
      x -> x::DOUBLE * x::DOUBLE))), 9) AS qnorm
  FROM embeddings WHERE vec_id < {max_query_id}
),
terms AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, s.sub,
    c.codes[s.sub + 1] AS cid
  FROM (SELECT DISTINCT query_id FROM qn) q,
       codes c,
       (SELECT DISTINCT sub FROM cb) s
  WHERE c.vec_id <> q.query_id
),
scored AS (
  SELECT t.query_id, t.neighbor_id,
    SUM(l.ip) AS ip_sum, SUM(l.n2) AS n2_sum
  FROM terms t
  JOIN lut l ON l.query_id = t.query_id
            AND l.sub = t.sub AND l.cid = t.cid
  GROUP BY t.query_id, t.neighbor_id
),
final AS (
  SELECT s.query_id, s.neighbor_id,
    round(s.ip_sum / (qn.qnorm * sqrt(s.n2_sum)), 6) AS score
  FROM scored s JOIN qn ON qn.query_id = s.query_id
)
SELECT query_id, neighbor_id, score,
  row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, neighbor_id) AS rank
FROM final
QUALIFY rank <= {k}
"""


@pytest.fixture(scope="module")
def small_cb(spark):
    """m=8/ksub=8 codebooks trained on sf0.001 — small enough that
    the DuckDB oracle's vec×codebook cross join stays trivial."""
    emb = spark.read.parquet(EMB)
    cb, hist = pq_train(emb, m=8, ksub=8, iterations=2)
    return cb, hist


def _duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{EMB}')"
    )
    return con


def test_pq_train_inertia_and_determinism(spark, small_cb):
    emb = spark.read.parquet(EMB)
    cb, hist = small_cb
    assert len(hist) == 2 and hist[1] <= hist[0]
    cb2, hist2 = pq_train(emb, m=8, ksub=8, iterations=2)
    assert cb == cb2 and hist == hist2
    assert len(cb) == 8 and len(cb[0]) == 8 and len(cb[0][0]) == 8


def test_pq_train_one_step_matches_numpy(spark):
    """One Lloyd step on a tiny frame vs an independent driver-side
    recomputation: centroids must be the per-(sub, cid) means of the
    seed-assigned subvectors."""
    import numpy as np

    vecs = [
        (0, [1.0, 0.0, 0.0, 10.0]),
        (1, [0.0, 1.0, 10.0, 0.0]),
        (2, [1.1, 0.1, 0.2, 9.0]),
        (3, [0.2, 0.9, 9.5, 0.5]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cb, hist = pq_train(df, m=2, ksub=2, iterations=1)
    vm = np.array([v for _, v in vecs])
    seeds = vm[:2].reshape(2, 2, 2).transpose(1, 0, 2)
    for sub in range(2):
        r = vm.reshape(4, 2, 2)[:, sub, :]
        d2 = np.round(
            ((r[:, None, :] - seeds[sub][None, :, :]) ** 2).sum(-1), 6
        )
        code = d2.argmin(axis=1)
        for cid in range(2):
            exp = r[code == cid].mean(axis=0)
            assert np.allclose(cb[sub][cid], exp)


def test_pq_encode_matches_duckdb(spark, small_cb):
    cb, _ = small_cb
    emb = spark.read.parquet(EMB)
    sdf = pq_encode(emb, cb).selectExpr(
        "vec_id", "transform(codes, c -> cast(c as bigint)) as codes"
    )
    scols, srows, stags = arrow_rows(sdf.toArrow())
    con = _duck()
    dcols, drows, dtags = arrow_rows(
        con.execute(_encode_sql(cb, 8)).arrow()
    )
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows) == 500
    assert table_hash(srows, scols, stags) == table_hash(drows, dcols, dtags)


def test_pq_topk_matches_duckdb(spark, small_cb):
    cb, _ = small_cb
    emb = spark.read.parquet(EMB)
    codes = pq_encode(emb, cb)
    q = emb.filter("vec_id < 10")
    sdf = pq_topk(codes, q, cb, k=5)
    scols, srows, stags = arrow_rows(sdf.toArrow())
    con = _duck()
    dcols, drows, dtags = arrow_rows(
        con.execute(_adc_sql(cb, 8, 5, 10)).arrow()
    )
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows) == 50
    assert table_hash(srows, scols, stags) == table_hash(drows, dcols, dtags)


def test_ivf_pq_full_probe_equals_brute(spark, small_cb):
    cb, _ = small_cb
    emb = spark.read.parquet(EMB)
    codes = pq_encode(emb, cb)
    cents, _h = kmeans_train(emb, n_centroids=8, iterations=2)
    idx = pq_index(emb, cb, cents)
    q = emb.filter("vec_id < 10")
    brute = sorted(map(tuple, pq_topk(codes, q, cb, k=5).collect()))
    full = sorted(
        map(tuple, ivf_pq_topk(idx, q, cb, cents, k=5, nprobe=8).collect())
    )
    assert brute == full


def test_pq_recall_pins(spark):
    """Deterministic recall of the default-budget PQ (m=16, ksub=32)
    against exact cosine top-5 over 20 queries: the raw ADC ranking
    and the rescored two-stage ranking. These are pins, not bounds —
    every input and tie-break is deterministic."""
    emb = spark.read.parquet(EMB)
    q = emb.filter("vec_id < 20")
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()
    }
    cb, _ = pq_train(emb, m=16, ksub=32, iterations=4)
    codes = pq_encode(emb, cb)
    raw = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(codes, q, cb, k=5).collect()
    }
    rescored = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(codes, q, cb, k=5, rescore=emb).collect()
    }
    assert len(raw & exact) / len(exact) >= 0.50
    assert len(rescored & exact) / len(exact) >= 0.90
    # rescored scores are EXACT cosine: its top-k pairs must score
    # identically to the exact ranking wherever they overlap
    exact_scores = {
        (r.query_id, r.neighbor_id): r.score
        for r in cosine_topk(emb, q, k=5).collect()
    }
    for r in pq_topk(codes, q, cb, k=5, rescore=emb).collect():
        key = (r.query_id, r.neighbor_id)
        if key in exact_scores:
            assert r.score == exact_scores[key]


def test_pq_serving_plan_reads_codes_only(spark, tmp_path, small_cb):
    """The 100 TB serving claims: (a) scoring FROM a written codes
    table is one Arrow-batched pass with NO row-at-a-time Python and
    NO shuffle before the top-k window; (b) the codes scan reads only
    (vec_id, codes) — never float vectors."""
    cb, _ = small_cb
    emb = spark.read.parquet(EMB)
    path = str(tmp_path / "codes")
    pq_encode(emb, cb).write.parquet(path)
    codes = spark.read.parquet(path)
    q = emb.filter("vec_id < 5")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pq_topk(codes, q, cb, k=5).explain("formatted")
    p = buf.getvalue()
    import re

    assert "BatchEvalPython" not in p  # never row-at-a-time Python
    # ONE Arrow scoring pass; the only Exchange is the top-k window's
    # partitionBy(query_id) (formatted mode prints each node twice —
    # tree + details — so count the numbered detail headers)
    assert len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 1
    for line in p.splitlines():
        if "ReadSchema" in line:
            assert "embedding" not in line


def test_pq_topk_both_paths_identical(spark, small_cb):
    """The broadcast (numpy LUT) and past-cutover (JVM expression)
    scoring paths must produce identical round-6 rankings — the
    lsh_topk_quantized routing contract."""
    cb, _ = small_cb
    emb = spark.read.parquet(EMB)
    codes = pq_encode(emb, cb)
    q = emb.filter("vec_id < 10")
    fast = sorted(map(tuple, pq_topk(codes, q, cb, k=5).collect()))
    slow = sorted(
        map(
            tuple,
            pq_topk(codes, q, cb, k=5, max_broadcast_queries=2).collect(),
        )
    )
    assert fast == slow
    cents, _h = kmeans_train(emb, n_centroids=8, iterations=2)
    idx = pq_index(emb, cb, cents)
    fast_i = sorted(
        map(tuple, ivf_pq_topk(idx, q, cb, cents, k=5, nprobe=3).collect())
    )
    slow_i = sorted(
        map(
            tuple,
            ivf_pq_topk(
                idx, q, cb, cents, k=5, nprobe=3, max_broadcast_queries=2
            ).collect(),
        )
    )
    assert fast_i == slow_i


def test_write_read_pq_index_roundtrip(spark, tmp_path, small_cb):
    """The self-describing serving artifact (write_text_index
    symmetry): codes + codebooks + centroids round-trip through one
    path and serve ivf_pq_topk identically to the in-memory originals;
    the codes layout is one partition directory per coarse cell."""
    import os

    from mod_reservoir_spark.pipeline.pq import (
        read_pq_index,
        write_pq_index,
    )

    cb, _ = small_cb
    emb = spark.read.parquet(EMB)
    cents, _h = kmeans_train(emb, n_centroids=8, iterations=2)
    idx = pq_index(emb, cb, cents)
    path = str(tmp_path / "ivfpq")
    write_pq_index(idx, cb, cents, path)
    r_idx, r_cb, r_cents = read_pq_index(spark, path)
    assert r_cb == cb and r_cents == cents
    q = emb.filter("vec_id < 10")
    direct = sorted(
        map(tuple, ivf_pq_topk(idx, q, cb, cents, k=5, nprobe=3).collect())
    )
    served = sorted(
        map(
            tuple,
            ivf_pq_topk(r_idx, q, r_cb, r_cents, k=5, nprobe=3).collect(),
        )
    )
    assert direct == served
    assert {d for d in os.listdir(f"{path}/codes") if d.startswith("cell=")}


REAL_EMB = "tests/fixtures/real/embeddings.parquet"


@pytest.mark.skipif(
    not __import__("os").path.exists(REAL_EMB),
    reason="real embedding fixture absent (REQUESTS.md #3)",
)
def test_real_corpus_recall(spark):
    """Activates when the real embedding fixture appears: IVF-PQ
    rescored recall@10 on STRUCTURED vectors must clear 0.8 at the
    default budget (on the synthetic random vectors — the worst case —
    the same config measures 0.54–0.81 at sf10; see SCALE.md)."""
    emb = spark.read.parquet(REAL_EMB)
    q = emb.orderBy("vec_id").limit(100)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, q, k=10).collect()
    }
    cb, _ = pq_train(emb)
    n_cells = max(16, emb.count() // 1000)
    cents, _h = kmeans_train(emb, n_centroids=n_cells, iterations=2)
    idx = pq_index(emb, cb, cents)
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_pq_topk(
            idx, q, cb, cents, k=10, nprobe=16, rescore=emb, shortlist=16
        ).collect()
    }
    recall = len(got & exact) / len(exact)
    print(f"real-corpus IVF-PQ rescored recall@10 = {recall:.3f}")
    assert recall >= 0.8


def test_pq_code_width_and_dim_guard(spark):
    assert _code_type(128) == "tinyint"
    assert _code_type(129) == "smallint"
    emb = spark.read.parquet(EMB)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7)
    # a >128-entry codebook (untrained literal is fine) widens storage
    cb = [[[float(j)] * 32 for j in range(130)] for _ in range(2)]
    out = pq_encode(emb, cb)
    assert "array<smallint>" in out.schema.simpleString()


def test_adc_per_batch_cap_exact_across_batches(spark, small_cb):
    """The per-batch top-cap reduction inside _adc_scored_broadcast
    (the fix for the sf10 dense-emit OOM, SCALE.md r10) must be
    invisible in results: global top-k over per-batch survivors equals
    top-k over the full dense emit, across MANY batches (repartition
    forces one mapInPandas batch per partition), with and without the
    exact-cosine rescore (whose shortlist needs cap = shortlist*k)."""
    from mod_reservoir_spark.pipeline.pq import (
        _adc_scored_broadcast,
        _nan_floor,
    )
    from mod_reservoir_spark.pipeline.similarity import _topk

    cb, _ = small_cb
    emb = spark.read.parquet(EMB)
    codes = pq_encode(emb, cb).repartition(7)
    q = emb.filter("vec_id % 17 = 0")
    q_rows = q.select("vec_id", "embedding").collect()

    dense = _nan_floor(
        _adc_scored_broadcast(codes, q_rows, cb, "vec_id", "codes")
    )
    want = sorted(map(tuple, _topk(dense, 5).collect()))
    got = sorted(map(tuple, pq_topk(codes, q, cb, k=5).collect()))
    assert got == want

    want_r = sorted(
        map(
            tuple,
            pq_topk(
                codes, q, cb, k=3, rescore=emb, shortlist=4,
                max_broadcast_queries=1,  # distributed path = uncapped
            ).collect(),
        )
    )
    got_r = sorted(
        map(
            tuple,
            pq_topk(codes, q, cb, k=3, rescore=emb, shortlist=4).collect(),
        )
    )
    assert got_r == want_r


def test_adc_cap_key_order_with_extreme_ids(spark):
    """ADVICE r10: the composite selection key must keep (score desc,
    id asc) total order even when one batch mixes a large NEGATIVE id
    with a large positive one (id delta > 2^41 — a 2^41-wide score
    bucket lets the lower-scored pair outrank the higher-scored one).
    Two unit centroids whose query cosines differ by exactly 1e-6 at
    round-6; the HIGHER-scored candidate carries id +(2^41-3), the
    decoy -(2^41-3); cap=1 must keep the higher score."""
    import math

    hi, lo = (1 << 41) - 3, -((1 << 41) - 3)
    cb = [[
        [0.5, math.sqrt(1 - 0.25)],
        [0.499999, math.sqrt(1 - 0.499999**2)],
    ]]
    codes = spark.createDataFrame(
        [(hi, [0]), (lo, [1])], "vec_id long, codes array<tinyint>"
    ).coalesce(1)
    queries = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = pq_topk(codes, queries, cb, k=1).collect()
    assert [(r.neighbor_id, r.score) for r in got] == [(hi, 0.5)]


def test_adc_cap_int64_min_id_falls_back(spark):
    """ADVICE r10: np.abs(int64.min) overflows back to int64.min, so
    an abs-based bound let the sentinel id through into overflowing
    key arithmetic. The explicit min/max guard must route such a
    batch to the unreduced emit and still rank correctly."""
    import math

    imin = -(1 << 63)
    cb = [[
        [0.5, math.sqrt(1 - 0.25)],
        [0.499999, math.sqrt(1 - 0.499999**2)],
        [0.3, math.sqrt(1 - 0.09)],
    ]]
    codes = spark.createDataFrame(
        [(imin, [1]), (5, [0]), (6, [2])],
        "vec_id long, codes array<tinyint>",
    ).coalesce(1)
    queries = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = pq_topk(codes, queries, cb, k=2).collect()
    assert [(r.neighbor_id, r.score) for r in got] == [
        (5, 0.5),
        (imin, 0.499999),
    ]


def test_cap_select_out_of_range_scores_fall_back():
    """ADVICE r11: _cap_select's int64 composite key silently assumed
    scores in [-1, 1]; a future caller with unbounded scores must get
    the same None fallback out-of-range ids do, never wrapped-key
    ordering. NaN-only batches stay on the fast path (the sentinel
    handles them)."""
    import numpy as np

    from mod_reservoir_spark.pipeline.pq import _cap_select

    nids = np.array([1, 2, 3], dtype=np.int64)
    qids = np.array([9], dtype=np.int64)
    ok = np.array([[0.5, np.nan, -1.0]])
    assert _cap_select(ok, nids, qids, 2) is not None
    too_big = np.array([[0.5, 3.7, -1.0]])
    assert _cap_select(too_big, nids, qids, 2) is None
    too_small = np.array([[0.5, -3.7, 1.0]])
    assert _cap_select(too_small, nids, qids, 2) is None
    all_nan = np.full((1, 3), np.nan)
    assert _cap_select(all_nan, nids, qids, 2) is not None


def test_cap_select_zero_size_matrix_falls_back():
    """ADVICE r12: a zero-size score matrix (empty query batch, or no
    candidate rows) used to crash the fmin/fmax range guard with a
    ValueError on the executor; it must hit the same None fallback as
    out-of-range ids so the unreduced emit handles the degenerate
    shape."""
    import numpy as np

    from mod_reservoir_spark.pipeline.pq import _cap_select

    nids = np.array([1, 2, 3], dtype=np.int64)
    empty = np.array([], dtype=np.int64)
    assert _cap_select(np.zeros((0, 3)), nids, empty, 2) is None
    assert _cap_select(np.zeros((1, 0)), empty,
                       np.array([9], dtype=np.int64), 2) is None
