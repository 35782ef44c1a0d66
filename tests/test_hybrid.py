"""Hybrid (BM25 + embedding cosine) retrieval with reciprocal-rank
fusion (pipeline/similarity.py hybrid_search) vs a single DuckDB
oracle composing both arms, plus behavioral pins."""

import duckdb

from mod_reservoir_spark.pipeline import similarity as sim
from tests.test_pipeline import _hash_vs_oracle

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _oracle_sql(qterms, k, k_each, rrf_k, query_id):
    qlist = ", ".join(f"'{t}'" for t in sorted(set(qterms)))
    return f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') AS toks
          FROM documents),
        stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(coalesce(len(toks), 0)) AS DOUBLE) / count(*)
                   AS avgdl
          FROM t),
        posting AS (
          SELECT doc_id, CAST(coalesce(len(toks), 0) AS BIGINT) AS dl,
                 unnest(list_filter(toks, x -> x IN ({qlist}))) AS term
          FROM t),
        tf AS (
          SELECT doc_id, term, dl, CAST(count(*) AS BIGINT) AS tf
          FROM posting GROUP BY 1, 2, 3),
        dft AS (
          SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        bm25 AS (
          SELECT tf.doc_id,
                 CAST(round(sum(
                   ln((s.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))
                 ) * 1000000) AS BIGINT) AS score_e6
          FROM tf JOIN dft USING (term) CROSS JOIN stats s
          GROUP BY 1
          ORDER BY score_e6 DESC, doc_id ASC LIMIT {k_each}),
        lex AS (
          SELECT doc_id, CAST(row_number() OVER (
            ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS lex_rank
          FROM bm25),
        qv AS (
          SELECT embedding::DOUBLE[] AS v FROM embeddings
          WHERE vec_id = {query_id}),
        scored AS (
          SELECT vec_id AS doc_id,
                 round(list_dot_product(qv.v, embedding::DOUBLE[]) /
                       (sqrt(list_dot_product(qv.v, qv.v)) *
                        sqrt(list_dot_product(embedding::DOUBLE[],
                                              embedding::DOUBLE[]))),
                       6) AS score
          FROM embeddings, qv WHERE vec_id <> {query_id}),
        sem AS (
          SELECT doc_id, CAST(rn AS BIGINT) AS sem_rank FROM (
            SELECT doc_id, row_number() OVER (
              ORDER BY score DESC, doc_id) AS rn
            FROM scored) WHERE rn <= {k_each}),
        fused AS (
          SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
                 l.lex_rank, s.sem_rank,
                 coalesce(1000000000 // ({rrf_k} + l.lex_rank), 0)
                 + coalesce(1000000000 // ({rrf_k} + s.sem_rank), 0)
                   AS rrf_e9
          FROM lex l FULL OUTER JOIN sem s USING (doc_id))
        SELECT doc_id, lex_rank, sem_rank, rrf_e9 FROM fused
        ORDER BY rrf_e9 DESC, doc_id ASC LIMIT {k}
    """


def test_hybrid_oracle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = emb.filter("vec_id = 0").select("embedding").first()[0]
    out = sim.hybrid_search(
        docs, emb, "spark window merge", qvec, k=20, k_each=50, query_id=0
    )
    _hash_vs_oracle(
        out,
        _con(),
        _oracle_sql(
            ["spark", "window", "merge"], 20, 50, 60, query_id=0
        ),
    )


def test_hybrid_behavior(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = emb.filter("vec_id = 0").select("embedding").first()[0]
    rows = sim.hybrid_search(
        docs, emb, "spark window merge", qvec, k=20, k_each=10, query_id=0
    ).collect()
    assert len(rows) == 20
    # fused score is monotone in the output order
    scores = [r.rrf_e9 for r in rows]
    assert scores == sorted(scores, reverse=True)
    # a doc in BOTH lists outranks rank-equivalent single-list docs:
    # every row with both ranks non-null beats the best possible
    # single-list score at those ranks
    for r in rows:
        if r.lex_rank is not None and r.sem_rank is not None:
            assert r.rrf_e9 == (
                1000000000 // (60 + r.lex_rank)
                + 1000000000 // (60 + r.sem_rank)
            )
        elif r.lex_rank is not None:
            assert r.rrf_e9 == 1000000000 // (60 + r.lex_rank)
        else:
            assert r.rrf_e9 == 1000000000 // (60 + r.sem_rank)
    # self vector excluded from the semantic arm
    sem_docs = {r.doc_id for r in rows if r.sem_rank is not None}
    assert 0 not in sem_docs or all(
        r.sem_rank is None for r in rows if r.doc_id == 0
    )


def test_hybrid_lsh_arm(spark):
    """ann='lsh' (more-like-this-document serving form): the semantic
    arm's ranks equal a direct lsh_topk call, the lexical arm is
    unchanged from the brute run, and the fusion arithmetic holds."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    rows = sim.hybrid_search(
        docs, emb, "spark window merge", None, k=30, k_each=20,
        query_id=0, ann="lsh", n_planes=8, n_tables=4,
    ).collect()
    assert rows

    direct = {
        r.neighbor_id: r.rank
        for r in sim.lsh_topk(
            emb, emb.filter("vec_id = 0"), k=20, n_planes=8, n_tables=4
        ).collect()
    }
    brute_lex = {
        r.doc_id: r.lex_rank
        for r in sim.hybrid_search(
            docs, emb, "spark window merge",
            emb.filter("vec_id = 0").select("embedding").first()[0],
            k=30, k_each=20, query_id=0,
        ).collect()
        if r.lex_rank is not None
    }
    for r in rows:
        if r.sem_rank is not None:
            assert direct[r.doc_id] == r.sem_rank
        if r.lex_rank is not None:
            assert brute_lex.get(r.doc_id, r.lex_rank) == r.lex_rank
        expected = 0
        if r.lex_rank is not None:
            expected += 1000000000 // (60 + r.lex_rank)
        if r.sem_rank is not None:
            expected += 1000000000 // (60 + r.sem_rank)
        assert r.rrf_e9 == expected
    # every direct-lsh neighbor appears in a big-enough fused cut
    fused_sem = {r.doc_id for r in rows if r.sem_rank is not None}
    assert set(direct) <= fused_sem | {
        r.doc_id for r in rows
    } or len(rows) == 30


def test_hybrid_brute_requires_vec(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    import pytest as _pt

    with _pt.raises(ValueError):
        sim.hybrid_search(docs, emb, "x", None, ann="brute")
    with _pt.raises(ValueError):
        sim.hybrid_search(docs, emb, "x", [0.0], ann="nope")
