"""Persisted LM models (pipeline/lm_model.py): one prefix-closed
parquet table carries every order's counts; scoring under the persisted
model is bit-identical to scoring under freshly built tables; the
short-doc backoff default and strata round-trip."""

SF = "/root/testdata/sf0.001"


def test_lm_model_roundtrip_tables_equal(spark, tmp_path):
    from mod_reservoir_spark.pipeline.lm_model import (
        build_lm_prefix,
        lm_model_tables,
        write_lm_model,
    )
    from mod_reservoir_spark.pipeline.text import ngram_count_tables

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    for strata in ((), ("lang",)):
        path = str(tmp_path / f"m{len(strata)}")
        prefix = build_lm_prefix(docs, 4, strata=strata)
        write_lm_model(prefix, 4, path, strata=strata)
        got = lm_model_tables(spark, path)
        want = ngram_count_tables(docs, 4, strata=strata)
        assert len(got) == len(want)
        for i, (g, w) in enumerate(zip(got, want)):
            assert sorted(g.columns) == sorted(w.columns), i
            rg = sorted(map(tuple, g.select(*sorted(g.columns)).collect()))
            rw = sorted(map(tuple, w.select(*sorted(w.columns)).collect()))
            assert rg == rw, (strata, i)


def test_score_under_model_equals_fresh_tables(spark, tmp_path):
    """The whole CCNet serving path: persist a reference model from a
    clean corpus, score a crawl under it — bit-identical to scoring
    under freshly built tables, the backoff default covers short docs
    (a 2-token OOV doc gets the worst band instead of a free pass),
    and strata recorded at write time are honored."""
    from mod_reservoir_spark.pipeline.lm_model import (
        build_lm_prefix,
        score_under_model,
        write_lm_model,
    )
    from mod_reservoir_spark.pipeline.text import (
        ngram_count_tables,
        ngram_logprob_against,
    )

    clean = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "ref")
    write_lm_model(build_lm_prefix(clean, 5), 5, path)

    crawl = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "zzq qxx"),       # short + OOV
         (2, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_ngrams, r.mean_nll_e6)
        for r in score_under_model(crawl, spark, path).collect()
    }
    want = {
        r.doc_id: (r.n_ngrams, r.mean_nll_e6)
        for r in ngram_logprob_against(
            crawl, ngram_count_tables(clean, 5), short_docs="backoff"
        ).collect()
    }
    assert got == want
    assert got[1][0] == 1 and got[1][1] > 13_000_000
    assert got[2] == (0, 0)

    # strata: per-language reference, scored per-language
    clean_l = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    path2 = str(tmp_path / "ref_lang")
    write_lm_model(
        build_lm_prefix(clean_l, 2, strata=("lang",)), 2, path2,
        strata=("lang",),
    )
    crawl_l = clean_l.filter("doc_id < 20")  # not limit(): plan-stable
    got2 = {
        r.doc_id: r.mean_nll_e6
        for r in score_under_model(crawl_l, spark, path2).collect()
    }
    from mod_reservoir_spark.pipeline.text import lm_count_tables

    want2 = {
        r.doc_id: r.mean_nll_e6
        for r in ngram_logprob_against(
            crawl_l,
            list(lm_count_tables(clean_l, strata=("lang",))),
            strata=("lang",),
            short_docs="backoff",
        ).collect()
    }
    assert got2 == want2


def test_lm_model_validates_shape(spark, tmp_path):
    """A desynced (order, strata) vs the prefix frame would silently
    derive wrong tables — both write and derive reject it up front."""
    import pytest

    from mod_reservoir_spark.pipeline.lm_model import (
        build_lm_prefix,
        prefix_tables,
        write_lm_model,
    )

    docs = spark.createDataFrame(
        [(0, "a b c")], "doc_id long, text string"
    )
    prefix = build_lm_prefix(docs, 3)
    with pytest.raises(ValueError):
        prefix_tables(prefix, 4)
    with pytest.raises(ValueError):
        prefix_tables(prefix, 3, strata=("lang",))
    with pytest.raises(ValueError):
        write_lm_model(prefix, 2, str(tmp_path / "x"))
    # the matching shape still round-trips
    assert len(prefix_tables(prefix, 3)) == 3
