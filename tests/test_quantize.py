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
