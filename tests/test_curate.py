"""curate() — the composed funnel must equal the hand-chained stage
operators (same survivor sets, same first-drop attribution), and the
ledger/funnel must account for every input document exactly once."""

import pyspark.sql.functions as F
import pytest

from mod_reservoir_spark.pipeline.curate import curate, curation_funnel


def _hand_chain(spark, docs, benchmark, near_kwargs):
    """Independent sequential composition of the stage operators."""
    from mod_reservoir_spark.pipeline.dedup import (
        exact_duplicates,
        near_dedup_keep,
    )
    from mod_reservoir_spark.pipeline.text import (
        contamination,
        fingerprint,
        quality_filter,
    )

    drops = {}
    q = quality_filter(docs)
    q_fail = {r.doc_id for r in q.filter("keep = 0").collect()}
    for d in q_fail:
        drops[d] = "quality"
    surv = docs.filter(~F.col("doc_id").isin(q_fail) if q_fail else F.lit(True))

    fps = {r.doc_id: r.fingerprint for r in fingerprint(surv).collect()}
    keeper = {
        r.fingerprint: r.keeper_doc_id
        for r in exact_duplicates(surv).collect()
    }
    e_fail = {d for d, f in fps.items() if keeper[f] != d}
    for d in sorted(e_fail):
        drops[d] = "exact_dup"
    surv = surv.filter(
        ~F.col("doc_id").isin(e_fail) if e_fail else F.lit(True)
    )

    n = near_dedup_keep(surv, **near_kwargs)
    n_fail = {r.doc_id for r in n.filter("is_kept = 0").collect()}
    for d in sorted(n_fail):
        drops[d] = "near_dup"
    surv = surv.filter(
        ~F.col("doc_id").isin(n_fail) if n_fail else F.lit(True)
    )

    if benchmark is not None:
        c = contamination(surv, benchmark)
        c_fail = {r.doc_id for r in c.filter("contamination_ppm > 0").collect()}
        for d in sorted(c_fail):
            drops[d] = "contaminated"
        surv = surv.filter(
            ~F.col("doc_id").isin(c_fail) if c_fail else F.lit(True)
        )
    return drops, {r.doc_id for r in surv.select("doc_id").collect()}


def _filler(tag):
    """≥ 40 distinct tokens so the quality rules pass but documents
    with different tags share (almost) no shingles."""
    return " ".join(f"{tag}w{i} {tag}x{i} {tag}y{i} {tag}z{i}" for i in range(10))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, _filler("a") + " original document body"),
        (1, _filler("a") + " original document body"),   # exact dup of 0
        (2, _filler("a") + " original document bodily"), # near dup of 0
        (3, "tiny"),                                     # quality: too_short
        (4, _filler("d") + " the quick brown fox jumps over the lazy dog today"),
        (5, _filler("e") + " reach me at bob@example.com for details thanks"),
        (6, _filler("f") + " fully independent content about glacier moraines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_docs(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )


NEAR = dict(shingle_n=2, threshold_ppm=500000)


def test_curate_equals_hand_chain(spark, corpus, bench_docs):
    ledger = curate(corpus, benchmark=bench_docs, near_kwargs=NEAR).cache()
    got_drops = {
        r.doc_id: r.drop_stage
        for r in ledger.filter("drop_stage IS NOT NULL").collect()
    }
    got_surv = {
        r.doc_id for r in ledger.filter("drop_stage IS NULL").collect()
    }
    want_drops, want_surv = _hand_chain(spark, corpus, bench_docs, NEAR)
    assert got_drops == want_drops
    assert got_surv == want_surv
    # every stage actually fired on this corpus
    assert set(got_drops.values()) == {
        "quality", "exact_dup", "near_dup", "contaminated"
    }


def test_curate_ledger_complete_and_scrubbed(spark, corpus, bench_docs):
    ledger = curate(corpus, benchmark=bench_docs, near_kwargs=NEAR).cache()
    assert ledger.count() == corpus.count()
    rows = {r.doc_id: r for r in ledger.collect()}
    # survivors carry scrubbed text; dropped docs carry NULL text
    assert "<EMAIL>" in rows[5].text and "bob@example.com" not in rows[5].text
    for r in rows.values():
        assert (r.text is None) == (r.drop_stage is not None)
    # funnel accounts for every document once, in stage order
    funnel = {r.stage: r.n for r in curation_funnel(ledger).collect()}
    assert sum(funnel.values()) == corpus.count()
    assert funnel["kept"] == len(
        [r for r in rows.values() if r.drop_stage is None]
    )


def test_curate_real_corpus(spark, bench_docs):
    """sf0.001 end-to-end: the funnel runs on the real documents table
    and the composed result equals the hand chain."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ledger = curate(docs, benchmark=None, near_kwargs=NEAR).cache()
    got_drops = {
        r.doc_id: r.drop_stage
        for r in ledger.filter("drop_stage IS NOT NULL").collect()
    }
    want_drops, want_surv = _hand_chain(spark, docs, None, NEAR)
    assert got_drops == want_drops
    assert ledger.filter("drop_stage IS NULL").count() == len(want_surv)


def test_curate_drops_null_doc_ids(spark):
    """A NULL-id row must never leak into the survivors (it would miss
    every stage join and come out unchecked); it is dropped up front,
    matching the split family's id rule."""
    docs = spark.createDataFrame(
        [(None, "tiny"), (1, LONG_OK), (None, None)],
        "doc_id long, text string",
    )
    rows = curate(docs, near_kwargs=NEAR).collect()
    assert [r.doc_id for r in rows] == [1]


LONG_OK = " ".join(f"ok{i} fine{i} word{i} text{i}" for i in range(10))


def test_curate_null_text_is_dropped_not_leaked(spark):
    """The ledger invariant "text IS NULL ⇔ dropped" must hold for
    NULL-text inputs too: without the entry coalesce, quality_filter's
    NULL n_tokens makes every reject predicate NULL (keep=1) and the
    doc sails through dedup's empty shingle sets into the survivor set
    with drop_stage NULL and text NULL."""
    docs = spark.createDataFrame(
        [(0, None), (1, LONG_OK), (2, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in curate(docs, near_kwargs=NEAR).collect()}
    assert set(got) == {0, 1, 2}          # ledger still covers every id
    assert got[0].drop_stage == "quality"  # NULL text == empty text
    assert got[2].drop_stage == "quality"
    assert got[1].drop_stage is None
    for r in got.values():
        assert (r.text is None) == (r.drop_stage is not None)


@pytest.mark.exhaustive  # near_contamination pinned by its own pipeline tests + oracle row; the funnel wiring is pinned by the kept materialize/hand-chain tests
def test_curate_near_contaminated_stage(spark, bench_docs):
    """benchmark_near_ppm adds the paraphrase-leak stage: a document
    sharing the benchmark's shingles (sentences reordered, low 8-gram
    overlap) drops as near_contaminated, verbatim overlap still drops
    as contaminated first, everything else is unchanged."""
    s = ["the quick brown fox", "jumps over the lazy", "dog today it did"]
    bench = spark.createDataFrame(
        [(100, " ".join(s))], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (0, _filler("a") + " totally unrelated body of text here"),
            # reordered benchmark sentences (twice, mostly benchmark
            # content) -> shingle-near but verbatim-8-gram-clean
            (1, " ".join(s[::-1]) + " " + " ".join(s[::-1])),
            (2, _filler("c") + " " + " ".join(s)),  # verbatim inclusion
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.drop_stage
        for r in curate(
            docs,
            benchmark=bench,
            near_kwargs=NEAR,
            benchmark_near_ppm=250000,
        ).collect()
    }
    assert got[0] is None
    assert got[1] == "near_contaminated"
    assert got[2] == "contaminated"
    # without the flag the paraphrase survives (the gap the stage closes)
    base = {
        r.doc_id: r.drop_stage
        for r in curate(docs, benchmark=bench, near_kwargs=NEAR).collect()
    }
    assert base[1] is None
    # funnel places the new stage in order
    f = curation_funnel(
        curate(docs, benchmark=bench, near_kwargs=NEAR,
               benchmark_near_ppm=250000)
    ).collect()
    stages = [r.stage for r in f]
    assert "near_contaminated" in stages


@pytest.mark.exhaustive  # hasher-swap drop-set drift bound; xxhash64 path untouched since r6 and pinned by dedup unit tests
def test_curate_hasher_drop_set_invariant(spark):
    """curate(hasher='xxhash64') — the measured fast path for the
    funnel's dominant near-dup stage (VERDICT r6 'Next #6'). The
    honest invariant (candidates are hasher-dependent at the LSH
    S-curve margin; verification is always exact Jaccard): (1) every
    PLANTED true near-dup (Jaccard far above threshold) drops under
    BOTH hashers with identical attribution; (2) all non-near_dup
    stages attribute identically (the hasher touches nothing else);
    (3) borderline-banding drift between hashers stays a small
    fraction of the drop set."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    # planted near-dups: every 7th document re-appears with one token
    # appended under a high id — same shape the dedup suite uses
    planted = docs.filter("doc_id % 7 = 0").select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailword")).alias("text"),
    )
    corpus = docs.unionByName(planted)

    def drops(hasher):
        led = curate(corpus, benchmark=None, near_kwargs=NEAR,
                     hasher=hasher)
        return {
            (r.doc_id, r.drop_stage)
            for r in led.filter("drop_stage IS NOT NULL").collect()
        }

    d_md5 = drops("md5")
    d_xx = drops("xxhash64")
    planted_ids = {
        r.doc_id for r in planted.select("doc_id").collect()
    }
    # (1) planted true dups: one of (parent, copy) drops as near_dup
    # under BOTH hashers (whichever survives quality), identically
    planted_md5 = {(d, s) for d, s in d_md5 if d in planted_ids}
    planted_xx = {(d, s) for d, s in d_xx if d in planted_ids}
    assert planted_md5 == planted_xx
    assert {s for _, s in planted_md5} <= {"near_dup", "quality"}
    assert any(s == "near_dup" for _, s in planted_md5)
    # (2) non-near_dup attribution identical
    assert {p for p in d_md5 if p[1] != "near_dup"} == {
        p for p in d_xx if p[1] != "near_dup"
    }
    # (3) borderline drift bounded: symmetric difference is a small
    # fraction of the near_dup drops
    nd_md5 = {d for d, s in d_md5 if s == "near_dup"}
    nd_xx = {d for d, s in d_xx if s == "near_dup"}
    drift = len(nd_md5 ^ nd_xx)
    assert drift <= max(2, len(nd_md5 | nd_xx) // 5), (nd_md5, nd_xx)


def test_curate_quality_aware_keeper(spark, corpus):
    """near_kwargs keep_by flows into the funnel's near-dup stage: the
    LONGEST member of a near-dup component survives instead of the
    min id, and nothing else about the ledger changes."""
    default = curate(corpus, near_kwargs=dict(NEAR))
    longest = curate(
        corpus,
        near_kwargs=dict(NEAR, keep_by=F.length("text")),
    )
    d = {r.doc_id: r.drop_stage for r in default.collect()}
    g = {r.doc_id: r.drop_stage for r in longest.collect()}
    # doc 1 is the exact dup (dropped before the near stage either
    # way); docs 0 vs 2 are the near-dup pair — "bodily" makes doc 2
    # one char longer, so the keep-longest policy flips the survivor
    assert d[0] is None and d[2] == "near_dup"
    assert g[2] is None and g[0] == "near_dup"
    # every other attribution is untouched by the keeper policy
    assert {k: v for k, v in d.items() if k not in (0, 2)} == {
        k: v for k, v in g.items() if k not in (0, 2)
    }


def test_curate_perplexity_stage(spark, corpus):
    """lm_tables + max_nll_e6 adds the CCNet perplexity gate between
    quality and dedup: quality survivors scored under the REFERENCE
    tables, high-NLL docs drop as 'perplexity', everything downstream
    sees only perplexity survivors; lm_tables without a threshold
    raises; the default ledger is untouched."""
    from mod_reservoir_spark.pipeline.text import (
        bigram_logprob_against,
        lm_count_tables,
    )

    tables = lm_count_tables(corpus)
    scores = {
        r.doc_id: r.mean_nll_e6
        for r in bigram_logprob_against(corpus, *tables).collect()
    }
    # pick a threshold that splits the quality survivors
    default = curate(corpus, near_kwargs=dict(NEAR))
    d = {r.doc_id: r.drop_stage for r in default.collect()}
    q_surv = [i for i, s in d.items() if s != "quality"]
    cut = sorted(scores[i] for i in q_surv)[len(q_surv) // 2]

    led = curate(
        corpus, near_kwargs=dict(NEAR), lm_tables=tables, max_nll_e6=cut
    )
    g = {r.doc_id: r.drop_stage for r in led.collect()}
    expect_px = {i for i in q_surv if scores[i] > cut}
    assert {i for i, s in g.items() if s == "perplexity"} == expect_px
    # quality attribution is first and unchanged
    assert {i for i, s in g.items() if s == "quality"} == {
        i for i, s in d.items() if s == "quality"
    }
    # downstream stages only ever see perplexity survivors
    assert all(
        g[i] in (None, "quality", "perplexity") or scores[i] <= cut
        for i in g
    )
    # the funnel histogram carries the new stage in order
    hist = {r.stage: r.n for r in curation_funnel(led).collect()}
    assert hist.get("perplexity", 0) == len(expect_px)

    with pytest.raises(ValueError):
        curate(corpus, lm_tables=tables)


def test_curate_lm_model_path_equals_hand_composed(spark, corpus, tmp_path):
    """VERDICT r11 Next #3: ``curate(lm_model_path=...)`` — the CCNet
    production shape as ONE call — gates ledger-identically to the
    hand-composed lm_model_tables + curate(lm_tables=...) form, with
    the strata AND the broadcast-vs-merge decision taken from the
    model's meta sidecar (a per-language model, so a silently-dropped
    stratum set would visibly change the scores)."""
    from mod_reservoir_spark.pipeline.lm_model import (
        build_lm_prefix,
        lm_model_tables,
        score_under_model,
        write_lm_model,
    )

    docs = corpus.withColumn(
        "lang",
        F.when(F.col("doc_id") % 2 == 0, "en").otherwise("xx"),
    )
    path = str(tmp_path / "ref_model")
    write_lm_model(
        build_lm_prefix(docs, 3, strata=("lang",)), 3, path,
        strata=("lang",),
    )
    scores = {
        r.doc_id: r.mean_nll_e6
        for r in score_under_model(docs, spark, path).collect()
    }
    vals = sorted(v for v in scores.values() if v > 0)
    cut = vals[len(vals) // 2]

    led_one = curate(
        docs, near_kwargs=dict(NEAR), lm_model_path=path, max_nll_e6=cut
    )
    led_hand = curate(
        docs,
        near_kwargs=dict(NEAR),
        lm_tables=tuple(lm_model_tables(spark, path)),
        lm_strata=("lang",),
        lm_broadcast=True,  # sidecar n_windows is tiny here
        max_nll_e6=cut,
    )
    rows_one = sorted(led_one.collect(), key=lambda r: r.doc_id)
    rows_hand = sorted(led_hand.collect(), key=lambda r: r.doc_id)
    assert rows_one == rows_hand
    # the gate actually discriminated (some doc dropped as perplexity)
    assert any(r.drop_stage == "perplexity" for r in rows_one)

    with pytest.raises(ValueError, match="not both"):
        curate(
            docs,
            lm_tables=tuple(lm_model_tables(spark, path)),
            lm_model_path=path,
            max_nll_e6=cut,
        )
    with pytest.raises(ValueError, match="meta sidecar"):
        curate(
            docs, lm_model_path=path, lm_strata=("lang",), max_nll_e6=cut
        )
    # ADVICE r12: kn parameters with NO gate configured were silently
    # ignored — the caller asked for a KN gate and forgot the model
    with pytest.raises(ValueError, match="no lm_tables or lm_model_path"):
        curate(docs, lm_smoothing="kn")
    with pytest.raises(ValueError, match="no lm_tables or lm_model_path"):
        curate(docs, lm_smoothing="kn",
               lm_discounts_ppm=((750_000,),) * 3)


def test_curate_materialize_identical_and_scan_free(spark, corpus, bench_docs):
    """The DEFAULT funnel checkpoints every stage boundary (r7 verdict:
    the shipped default must be the 100 TB-feasible plan): the ledger
    is row-identical to the pure-lazy opt-out (all stages incl. the
    gate and both decontamination passes), and the DEFAULT plan reads
    checkpoints — zero source re-scans, while the lazy plan re-derives
    its source dozens of times."""
    from mod_reservoir_spark.pipeline.text import lm_count_tables

    tables = lm_count_tables(corpus)
    kw = dict(
        benchmark=bench_docs,
        near_kwargs=dict(NEAR),
        benchmark_near_ppm=400000,
        lm_tables=tables,
        max_nll_e6=10_000_000,
    )
    lazy = curate(corpus, materialize=False, **kw)
    mat = curate(corpus, **kw)  # default = materialized
    assert {tuple(r) for r in lazy.collect()} == {
        tuple(r) for r in mat.collect()
    }
    mat_plan = mat._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in mat_plan or "Scan parquet" not in mat_plan
    lazy_plan = lazy._jdf.queryExecution().executedPlan().toString()
    # the corpus here is createDataFrame-backed; count its re-derivations
    assert lazy_plan.count("Scan ExistingRDD") > mat_plan.count(
        "Scan ExistingRDD"
    )


def test_curate_url_stage_attribution(spark, bench_docs):
    """url_col= turns on the crawl-first stage 0: canonical-URL
    duplicates drop as 'url_dup' (first-drop attribution wins over
    quality/dedup), NULL-url docs keep themselves, the stage is
    ordered before quality in the funnel histogram, and omitting
    url_col leaves the ledger byte-identical to before (contract-row
    safety)."""
    rows = [
        # 1+2: same page via tracking-tagged / www variants — 2 drops
        (1, _filler("p") + " alpha", "https://www.ex.com/a?utm_source=t&b=2&a=1"),
        (2, _filler("q") + " beta", "https://ex.com/a?a=1&b=2"),
        # 3: unique URL, bad quality — drops at quality, NOT url_dup
        (3, "tiny", "https://ex.com/tiny"),
        # 4: NULL url — keeps itself at stage 0
        (4, _filler("r") + " gamma", None),
        # 5+6: distinct non-http URLs must NOT collapse (ADVICE r7)
        (5, _filler("s") + " delta", "mailto:a@ex.com"),
        (6, _filler("t") + " epsilon", "ftp://files.ex.com/x"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, url string"
    )
    led = curate(docs, near_kwargs=dict(NEAR), url_col="url").cache()
    got = {r.doc_id: r.drop_stage for r in led.collect()}
    assert got[2] == "url_dup" and got[1] is None
    assert got[3] == "quality"
    assert got[4] is None and got[5] is None and got[6] is None
    hist = {r.stage: r.n for r in curation_funnel(led).collect()}
    assert hist.get("url_dup") == 1
    # without url_col the ledger is unchanged (no url stage in plan)
    base = curate(docs.drop("url"), near_kwargs=dict(NEAR))
    assert {r.doc_id: r.drop_stage for r in base.collect()} == {
        1: None, 2: None, 3: "quality", 4: None, 5: None, 6: None,
    }


def test_curate_trigram_gate(spark, corpus):
    """A 3-tuple lm_tables switches the perplexity gate to the order-3
    scorer: drop set equals the hand-computed trigram-NLL cut among
    quality survivors, attribution and downstream stages unchanged."""
    from mod_reservoir_spark.pipeline.text import (
        trigram_count_tables,
        trigram_logprob_against,
    )

    tables = trigram_count_tables(corpus)
    scores = {
        r.doc_id: r.mean_nll_e6
        for r in trigram_logprob_against(corpus, *tables).collect()
    }
    default = curate(corpus, near_kwargs=dict(NEAR))
    d = {r.doc_id: r.drop_stage for r in default.collect()}
    q_surv = [i for i, s in d.items() if s != "quality"]
    cut = sorted(scores[i] for i in q_surv)[len(q_surv) // 2]
    led = curate(
        corpus, near_kwargs=dict(NEAR), lm_tables=tables, max_nll_e6=cut
    ).cache()
    g = {r.doc_id: r.drop_stage for r in led.collect()}
    expect_px = {i for i in q_surv if scores[i] > cut}
    assert {i for i, s in g.items() if s == "perplexity"} == expect_px
    assert {i for i, s in g.items() if s == "quality"} == {
        i for i, s in d.items() if s == "quality"
    }


def test_curate_5gram_gate(spark, corpus):
    """A 5-tuple lm_tables (ngram_count_tables(5)) switches the gate
    to the order-5 scorer — the full KenLM shape of the CCNet recipe:
    drop set equals the hand-computed 5-gram-NLL cut among quality
    survivors."""
    from mod_reservoir_spark.pipeline.text import (
        ngram_count_tables,
        ngram_logprob_against,
    )

    tables = ngram_count_tables(corpus, 5)
    scores = {
        r.doc_id: r.mean_nll_e6
        for r in ngram_logprob_against(corpus, tables).collect()
    }
    default = curate(corpus, near_kwargs=dict(NEAR))
    d = {r.doc_id: r.drop_stage for r in default.collect()}
    q_surv = [i for i, s in d.items() if s != "quality"]
    cut = sorted(scores[i] for i in q_surv)[len(q_surv) // 2]
    led = curate(
        corpus, near_kwargs=dict(NEAR), lm_tables=tuple(tables),
        max_nll_e6=cut,
    )
    g = {r.doc_id: r.drop_stage for r in led.collect()}
    expect_px = {i for i in q_surv if scores[i] > cut}
    assert {i for i, s in g.items() if s == "perplexity"} == expect_px


def test_curate_perplexity_gate_short_docs(spark):
    """The r8 bypass is closed at the funnel: with quality's
    min_tokens BELOW the LM order, a doc shorter than the order no
    longer scores (n_ngrams=0, mean_nll_e6=0) and sails through any
    threshold — it backs off to the highest order it supports, so an
    OOV short doc drops as 'perplexity' (worst band, ~13.8e6) while an
    in-vocab short doc is genuinely scored and survives; a 0-token doc
    (n_ngrams=0 even under backoff) drops explicitly instead of
    passing. The CCNet recipe (KenLM) never exempts short docs."""
    from mod_reservoir_spark.pipeline.text import trigram_count_tables

    ref = spark.createDataFrame(
        [
            (100, "the glacier moraine retreats slowly each year"),
            (101, "the glacier moraine advances slowly each winter"),
        ],
        "doc_id long, text string",
    )
    tables = trigram_count_tables(ref)  # order 3
    corpus = spark.createDataFrame(
        [
            (0, "the glacier moraine retreats slowly each year"),
            (1, "glacier moraine"),   # 2 tokens < order, in-vocab
            (2, "zzq qxx"),           # 2 tokens < order, fully OOV
            (3, ""),                  # 0 tokens: n_ngrams=0 even now
        ],
        "doc_id long, text string",
    )
    lax = dict(
        min_tokens=0,
        max_dup_line_ppm=1000000,
        max_top_bigram_ppm=1000000,
        min_distinct_ppm=0,
        max_punct_ppm=1000000,
    )
    led = curate(
        corpus,
        near_kwargs=dict(NEAR),
        quality_kwargs=lax,
        lm_tables=tables,
        max_nll_e6=13_000_000,
    )
    got = {r.doc_id: r.drop_stage for r in led.collect()}
    assert got[0] is None
    assert got[1] is None, "in-vocab short doc must be scored, not dropped"
    assert got[2] == "perplexity", "OOV short doc must not bypass the gate"
    assert got[3] == "perplexity", "0-token doc drops explicitly"


def test_curate_perplexity_gate_strata_backoff(spark):
    """The CCNet production shape end-to-end: PER-LANGUAGE reference
    models (lm_strata) + short-doc backoff in the same gate. Each doc
    scores under its own language's tables; a short OOV doc drops
    regardless of language, a short in-vocab doc survives in ITS
    language but the same bigram would be OOV under the other
    language's model — pinning that strata keys reach the padded
    backoff windows too."""
    from mod_reservoir_spark.pipeline.text import ngram_count_tables

    ref = spark.createDataFrame(
        [(100, "the glacier moraine retreats slowly each year", "en"),
         (101, "el glaciar retrocede lentamente cada anio aqui", "es")],
        "doc_id long, text string, lang string",
    )
    tables = ngram_count_tables(ref, 3, strata=("lang",))
    corpus = spark.createDataFrame(
        [(0, "the glacier moraine retreats slowly each year", "en"),
         (1, "glacier moraine", "en"),     # short, in-vocab for en
         (2, "glacier moraine", "es"),     # same text, OOV under es
         (3, "el glaciar retrocede lentamente cada anio aqui", "es")],
        "doc_id long, text string, lang string",
    )
    lax = dict(
        min_tokens=0, max_dup_line_ppm=1000000,
        max_top_bigram_ppm=1000000, min_distinct_ppm=0,
        max_punct_ppm=1000000,
    )
    led = curate(
        corpus,
        near_kwargs=dict(NEAR),
        quality_kwargs=lax,
        lm_tables=tables,
        max_nll_e6=13_000_000,
        lm_strata=("lang",),
    )
    got = {r.doc_id: r.drop_stage for r in led.collect()}
    assert got[0] is None and got[3] is None
    assert got[1] is None, "short doc scored under ITS language's model"
    assert got[2] == "perplexity", (
        "same short text under the WRONG language's model is OOV -> drops"
    )


def test_threshold_semantics_zero_vs_backoff(spark):
    """The VERDICT r9 "What's wrong" #2 trap, end to end: a
    ``max_nll_e6`` threshold picked from ``short_docs="zero"``
    perplexity buckets (where short docs score 0 and rank HEAD)
    provably MISGATES an in-vocab short doc when curate()'s gate runs
    backoff — while the documented path (pick the threshold under the
    buckets' reference-model DEFAULT, which is now backoff, i.e. the
    gate's own semantics) keeps it."""
    from mod_reservoir_spark.pipeline.text import (
        ngram_count_tables,
        perplexity_buckets,
    )

    ref = spark.createDataFrame(
        [(100, "the glacier moraine retreats slowly each year"),
         (101, "the glacier moraine advances slowly each winter")],
        "doc_id long, text string",
    )
    tables = ngram_count_tables(ref, 5)
    crawl = spark.createDataFrame(
        [(0, "the glacier moraine retreats slowly each year", "en"),
         # in-vocab words in a NOVEL order: every 5/4/3/2-gram misses,
         # only unigram mass survives -> worst NLL of the three
         (1, "year slowly the each moraine retreats glacier", "en"),
         # GOOD short doc: 3 in-vocab tokens < order 5. zero: nll=0,
         # HEAD; backoff: real (order-3) NLL, between docs 0 and 1
         (2, "the glacier moraine", "en")],
        "doc_id long, text string, lang string",
    )

    def cut_keep_non_tail(**kw):
        rows = perplexity_buckets(
            crawl, strata=(), lm_tables=tables, **kw
        ).collect()
        return max(r.mean_nll_e6 for r in rows if r.bucket != "tail")

    lax = dict(
        min_tokens=0, max_dup_line_ppm=1000000,
        max_top_bigram_ppm=1000000, min_distinct_ppm=0,
        max_punct_ppm=1000000,
    )

    def gate(cut):
        led = curate(
            crawl.select("doc_id", "text"),
            near_kwargs=dict(NEAR),
            quality_kwargs=lax,
            lm_tables=tables,
            max_nll_e6=cut,
        )
        return {r.doc_id: r.drop_stage for r in led.collect()}

    # the trap: zero-mode buckets rank the short doc HEAD (nll 0), so
    # "keep head+middle" reads off cut = doc 0's NLL — and the backoff
    # gate then drops the short doc the caller meant to keep
    zero_cut = cut_keep_non_tail(short_docs="zero")
    misgated = gate(zero_cut)
    assert misgated[0] is None
    assert misgated[1] == "perplexity"
    assert misgated[2] == "perplexity", (
        "zero-picked threshold misgates the good short doc"
    )

    # the documented path: the buckets' DEFAULT is the gate's own
    # backoff semantics, so the same "keep head+middle" read-off
    # includes the short doc's real NLL and the gate keeps it
    back_cut = cut_keep_non_tail()
    kept = gate(back_cut)
    assert kept[0] is None
    assert kept[1] == "perplexity"
    assert kept[2] is None, "backoff-picked threshold keeps the short doc"
