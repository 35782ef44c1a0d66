"""Embedding quantization: oracle-exact codes, bounded reconstruction
error, ANN recall preserved over quantized storage."""

import numpy as np


def test_quantize_oracle_and_roundtrip(spark):
    """Codes hash-match a DuckDB replica of the quantizer on the real
    embeddings; dequantized vectors are within scale/2 per element."""
    import duckdb

    from mod_reservoir_spark.pipeline.similarity import (
        dequantize_expr,
        quantize_embeddings,
    )
    from tools.oracle_check import arrow_rows, table_hash

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    out = quantize_embeddings(emb)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    sql = """
        WITH v AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings),
        s AS (
          SELECT vec_id, e,
                 CASE WHEN list_max(list_transform(e, x -> abs(x))) > 0
                      THEN list_max(list_transform(e, x -> abs(x))) / 127.0
                      ELSE 0.0 END AS scale
          FROM v)
        SELECT vec_id,
               list_transform(e, x -> CAST(CASE WHEN scale > 0
                    THEN round(x / scale) ELSE 0.0 END AS INT)) AS codes,
               scale,
               CAST(len(e) AS BIGINT) AS dim
        FROM s
    """
    scols, srows, stags = arrow_rows(out.toArrow())
    dcols, drows, dtags = arrow_rows(con.execute(sql).arrow())
    assert sorted(scols) == sorted(dcols)
    assert table_hash(srows, scols, stags) == table_hash(drows, dcols, dtags)

    # reconstruction bound: |x - q*scale| <= scale/2 per element
    deq = out.select("vec_id", dequantize_expr().alias("xhat"), "scale")
    orig = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    for r in deq.collect():
        err = np.abs(orig[r.vec_id] - np.array(r.xhat))
        assert (err <= r.scale / 2 + 1e-12).all()


def test_quantized_ann_recall(spark):
    """Brute-force cosine top-10 over dequantized int8 vectors agrees
    with full precision on >= 8 of 10 neighbors per query (the
    candidate re-score path's guarantee)."""
    from mod_reservoir_spark.pipeline.similarity import (
        cosine_topk,
        dequantize_expr,
        quantize_embeddings,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.limit(5)
    full = cosine_topk(emb, queries, k=10)
    q = quantize_embeddings(emb)
    deq = q.select("vec_id", dequantize_expr().alias("embedding"))
    approx = cosine_topk(deq, deq.limit(5), k=10)
    f = {}
    for r in full.collect():
        f.setdefault(r.query_id, set()).add(r.neighbor_id)
    a = {}
    for r in approx.collect():
        a.setdefault(r.query_id, set()).add(r.neighbor_id)
    for qid in f:
        assert len(f[qid] & a[qid]) >= 8, (qid, f[qid], a[qid])


def test_quantize_zero_vector(spark):
    from mod_reservoir_spark.pipeline.similarity import (
        dequantize_expr,
        quantize_embeddings,
    )

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in quantize_embeddings(emb).collect()}
    assert out[1].codes == [0, 0, 0] and out[1].scale == 0.0
    deq = {
        r.vec_id: r.xhat
        for r in quantize_embeddings(emb)
        .select("vec_id", dequantize_expr().alias("xhat"))
        .collect()
    }
    assert deq[1] == [0.0, 0.0, 0.0]
    assert abs(deq[2][1] - (-2.0)) < 1e-9  # max-abs element exact


def test_lsh_topk_quantized_oracle(spark):
    """The quantized-storage ANN path (buckets AND re-score from int8
    codes, float only on the query side) hash-matches a DuckDB oracle
    that rebuilds the identical chain: quantize -> plane signs on
    codes -> bucket join -> cosine(query_float, codes) re-score."""
    import duckdb

    from mod_reservoir_spark.pipeline.similarity import (
        _plane_component,
        lsh_topk_quantized,
        quantize_embeddings,
    )
    from tools.oracle_check import arrow_rows, table_hash

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    codes = quantize_embeddings(emb)
    queries = emb.filter("vec_id % 50 = 0")
    out = lsh_topk_quantized(
        codes, queries, k=5, n_planes=10, n_tables=4
    )

    dim, n_planes, n_tables = 64, 10, 4

    def plane_lit(t, p):
        vals = ", ".join(
            repr(_plane_component(t, p, d)) for d in range(dim)
        )
        return f"[{vals}]"

    bucket_exprs = []
    for t in range(n_tables):
        bits = " || ".join(
            f"(CASE WHEN list_dot_product(c, {plane_lit(t, p)}) >= 0 "
            "THEN '1' ELSE '0' END)"
            for p in range(n_planes)
        )
        bucket_exprs.append(
            f"SELECT vec_id, {t} AS tbl, {bits} AS bucket FROM q8"
        )
    buckets_sql = "\n      UNION ALL ".join(bucket_exprs)
    sql = f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
      SELECT vec_id, v,
             CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
                  THEN list_max(list_transform(v, x -> abs(x))) / 127.0
                  ELSE 0.0 END AS scale
      FROM e),
    q8 AS (
      SELECT vec_id,
             list_transform(v, x -> CASE WHEN scale > 0
                  THEN round(x / scale) ELSE 0.0 END) AS c
      FROM s),
    buckets AS (
      {buckets_sql}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
      FROM buckets a JOIN buckets b
        ON a.tbl = b.tbl AND a.bucket = b.bucket
      WHERE a.vec_id % 50 = 0 AND a.vec_id <> b.vec_id),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             round(list_dot_product(q.v, n.c) /
                   (sqrt(list_dot_product(q.v, q.v)) *
                    sqrt(list_dot_product(n.c, n.c))), 6) AS score
      FROM cand c
      JOIN e q ON q.vec_id = c.query_id
      JOIN q8 n ON n.vec_id = c.neighbor_id)
    SELECT query_id, neighbor_id, score, rn AS "rank"
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
      FROM scored)
    WHERE rn <= 5
    """
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    scols, srows, stags = arrow_rows(out.toArrow())
    dcols, drows, dtags = arrow_rows(con.execute(sql).arrow())
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert table_hash(srows, scols, stags) == table_hash(drows, dcols, dtags)


def test_lsh_topk_quantized_recall_vs_float(spark):
    """End-to-end from int8 storage: >= 8/10 of the float LSH
    pipeline's neighbors per query, on the real embeddings."""
    from mod_reservoir_spark.pipeline.similarity import (
        lsh_topk,
        lsh_topk_quantized,
        quantize_embeddings,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.filter("vec_id % 100 = 0")
    full = lsh_topk(emb, queries, k=10, n_planes=10, n_tables=4)
    quant = lsh_topk_quantized(
        quantize_embeddings(emb), queries, k=10, n_planes=10, n_tables=4
    )
    f, a = {}, {}
    for r in full.collect():
        f.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in quant.collect():
        a.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(f) == set(a)
    for q in f:
        # a sparse bucket can yield fewer than k candidates (for both
        # paths alike); the floor is 8/10 of what the float path found
        floor = min(8, len(f[q]))
        assert len(f[q] & a[q]) >= floor, (q, f[q], a[q])


def test_quantized_storage_is_smaller_and_servable(spark, tmp_path):
    """The materialized codes table (tinyint elements since the ADVICE
    r4 fix) is genuinely smaller on disk than the float table, and the
    ANN path serves straight from that parquet scan."""
    from mod_reservoir_spark.pipeline.similarity import (
        lsh_topk_quantized,
        quantize_embeddings,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    fdir, qdir = str(tmp_path / "float"), str(tmp_path / "codes")
    emb.write.parquet(fdir)
    codes = quantize_embeddings(emb)
    assert dict(codes.dtypes)["codes"] == "array<tinyint>"
    codes.write.parquet(qdir)

    def nbytes(d):
        import os

        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    assert nbytes(qdir) < 0.45 * nbytes(fdir), (nbytes(qdir), nbytes(fdir))

    stored = spark.read.parquet(qdir)
    queries = emb.filter("vec_id % 100 = 0")
    out = lsh_topk_quantized(stored, queries, k=5, n_planes=10, n_tables=4)
    assert out.count() > 0


def test_lsh_topk_quantized_hint_and_single_action_parity(spark):
    """n_queries hint and the folded probe-collect return the same
    rows as each other and route to the distributed path past the
    cutover (VERDICT r6 'What's wrong #4')."""
    from mod_reservoir_spark.pipeline import similarity as sim

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    codes = sim.quantize_embeddings(emb)
    qs = emb.filter("vec_id % 20 = 0")
    nq = qs.count()
    base = sim.lsh_topk_quantized(codes, qs, k=3, n_planes=8).collect()
    hinted = sim.lsh_topk_quantized(
        codes, qs, k=3, n_planes=8, n_queries=nq
    ).collect()
    routed = sim.lsh_topk_quantized(
        codes, qs, k=3, n_planes=8, max_broadcast_queries=1
    ).collect()
    assert sorted(map(tuple, hinted)) == sorted(map(tuple, base))
    # the distributed route returns the same (query, neighbor) pairs
    pk = lambda rows: sorted((r.query_id, r.neighbor_id) for r in rows)
    assert pk(routed) == pk(base)
