"""Interpolated Kneser-Ney scoring (VERDICT r11 Next #2): the KenLM
arithmetic CCNet's production gate uses, pinned against an independent
pure-Python reference (dict counts, the textbook recursion) on real
corpus text — including OOV / unseen-context / short-doc paths under a
train/eval split — plus the family contracts (validation, persisted
model, JM untouched)."""

import math
import re
from collections import Counter

import pytest

from mod_reservoir_spark.pipeline.text import (
    kn_logprob_against,
    kn_logprob_scores,
    ngram_count_tables,
)

SF = "/root/testdata/sf0.001"


def _toks(text):
    return [t for t in re.split(r"\s+", (text or "").lower()) if t]


def kn_reference(train_texts, order, d_ppms, oov_ppm=1):
    """Independent interpolated-KN model over tokenized train texts:
    returns p(window) for an order-length tuple — raw discounted
    counts at the top order, continuation counts below, continuation
    unigram base with an OOV floor, unseen contexts falling through
    with backoff weight 1. A per-order spec may be a scalar ppm
    (single discount) or a (D1, D2, D3+) ppm triple (modified KN:
    class-selected discount, class-summed backoff mass). Pure dicts;
    no Spark code shared."""
    grams = {k: Counter() for k in range(2, order + 1)}
    for t in train_texts:
        ts = _toks(t)
        for k in range(2, order + 1):
            for i in range(len(ts) - k + 1):
                grams[k][tuple(ts[i : i + k])] += 1
    # continuation structures per middle order j: keyed by last-j words
    cc = {}      # j -> {(v1..vj): #distinct predecessors}
    ccdot = {}   # j -> {(v1..vj-1): sum of cc over continuations}
    ncont = {}   # j -> {(v1..vj-1): #distinct continuations}
    kcls = {}    # j -> {(v1..vj-1): [#cc==1, #cc==2, #cc>=3]}
    for j in range(2, order):
        cj, cd, nc, kc = Counter(), Counter(), {}, {}
        for g in grams[j + 1]:
            cj[g[1:]] += 1
        for v, c in cj.items():
            cd[v[:-1]] += c
            nc.setdefault(v[:-1], set()).add(v[-1])
            cls = kc.setdefault(v[:-1], [0, 0, 0])
            cls[min(c, 3) - 1] += 1
        cc[j], ccdot[j] = cj, cd
        ncont[j] = {u: len(s) for u, s in nc.items()}
        kcls[j] = kc
    # unigram base from bigram types
    ccu = Counter()
    for g in grams[2]:
        ccu[g[1]] += 1
    btot = len(grams[2])
    # top-order folds
    ctx, n1p, kctx = Counter(), Counter(), {}
    for g, c in grams[order].items():
        ctx[g[:-1]] += c
        n1p[g[:-1]] += 1
        cls = kctx.setdefault(g[:-1], [0, 0, 0])
        cls[min(c, 3) - 1] += 1

    if isinstance(d_ppms, int):
        d_ppms = (d_ppms,) * (order - 1)

    def num_mass(spec, c, ncont_u, kcls_u):
        if isinstance(spec, int):
            d = spec / 1000000.0
            return max(c - d, 0.0), d * ncont_u
        d1, d2, d3 = (x / 1000000.0 for x in spec)
        dsel = d1 if c == 1 else d2 if c == 2 else d3
        mass = d1 * kcls_u[0] + d2 * kcls_u[1] + d3 * kcls_u[2]
        return max(c - dsel, 0.0), mass

    def p(window):
        w = window[-1]
        val = (
            ccu[w] / btot if ccu[w] > 0 else oov_ppm / 1000000.0
        )
        for j in range(2, order):
            u = window[order - j : order - 1]
            key = window[order - j : order]
            if None in u or None in key:
                continue
            if ccdot[j].get(u, 0) > 0:
                num, mass = num_mass(
                    d_ppms[order - j], cc[j].get(key, 0),
                    ncont[j][u], kcls[j][u],
                )
                val = (num + mass * val) / ccdot[j][u]
        u = window[: order - 1]
        if None not in u and ctx.get(u, 0) > 0:
            num, mass = num_mass(
                d_ppms[0], grams[order].get(window, 0),
                n1p[u], kctx[u],
            )
            val = (num + mass * val) / ctx[u]
        return val

    return p


def ref_scores(train_texts, eval_rows, order, d_ppms, short_docs="zero"):
    """(doc_id -> (n_ngrams, mean_nll_e6)) under kn_reference, with
    the family's zero/backoff short-doc contract."""
    p = kn_reference(train_texts, order, d_ppms)
    out = {}
    for doc_id, text in eval_rows:
        ts = _toks(text)
        windows = [
            tuple(ts[i : i + order]) for i in range(len(ts) - order + 1)
        ]
        if not windows and short_docs == "backoff" and 1 <= len(ts):
            windows = [
                tuple([None] * (order - len(ts)) + ts)
            ]
        if not windows:
            out[doc_id] = (0, 0)
            continue
        nll = sum(-math.log(p(w)) for w in windows)
        out[doc_id] = (
            len(windows),
            round(nll / len(windows) * 1000000),
        )
    return out


def _docs(spark, limit=120):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(limit)
    )


@pytest.mark.parametrize("order", [3, 5])
def test_kn_self_scoring_matches_python_reference(spark, order):
    docs = _docs(spark)
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    texts = [t for _, t in rows]
    want = ref_scores(texts, rows, order, 750000)
    got = {
        r.doc_id: (r.n_ngrams, r.mean_nll_e6)
        for r in kn_logprob_scores(docs, order).collect()
    }
    assert set(got) == set(want)
    for did in want:
        assert got[did][0] == want[did][0], did
        assert abs(got[did][1] - want[did][1]) <= 1, (
            did,
            got[did],
            want[did],
        )


def test_kn_fixed_reference_oov_and_backoff(spark):
    """Train on the even half, score the odd half mutated to hit every
    cold path: OOV tokens (unigram floor), unseen contexts (backoff
    fallthrough at each order), and 1-2 token docs under
    short_docs='backoff' (one right-aligned NULL-padded window)."""
    from pyspark.sql import functions as F

    docs = _docs(spark, 160)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    ev = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 1,
            F.array_join(F.slice(F.split(F.col("text"), r"\s+"), 1, 2), " "),
        )
        .when(
            F.col("doc_id") % 11 == 3,
            F.concat(
                F.col("text"), F.lit(" qzoov"), F.col("doc_id").cast("string")
            ),
        )
        .when(
            F.col("doc_id") % 11 == 5,
            F.concat(F.lit("qzoov"), F.col("doc_id").cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    tables = ngram_count_tables(train, 3)
    got = {
        r.doc_id: (r.n_ngrams, r.mean_nll_e6)
        for r in kn_logprob_against(
            ev, tables, short_docs="backoff", broadcast_tables=True
        ).collect()
    }
    train_texts = [r.text for r in train.collect()]
    eval_rows = [(r.doc_id, r.text) for r in ev.collect()]
    want = ref_scores(train_texts, eval_rows, 3, 750000, "backoff")
    assert set(got) == set(want)
    for did in want:
        assert got[did][0] == want[did][0], did
        assert abs(got[did][1] - want[did][1]) <= 1, (
            did,
            got[did],
            want[did],
        )
    # the mutations actually exercised the cold paths
    assert any(n == 1 for n, _ in want.values())  # padded short docs


def test_kn_short_docs_zero_contract(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_ngrams, r.mean_nll_e6)
        for r in kn_logprob_scores(docs, 4).collect()
    }
    assert got[2] == (0, 0) and got[3] == (0, 0)
    assert got[1][0] == 3 and got[1][1] > 0


def test_kn_validation():
    import pyspark.sql  # noqa: F401  (docs frame never touched)

    with pytest.raises(ValueError, match="order >= 3"):
        kn_logprob_against(None, [None, None])
    with pytest.raises(ValueError, match="one discount per"):
        kn_logprob_against(None, [None, None, None], discounts_ppm=(1,))
    with pytest.raises(ValueError, match=r"\(0, 1e6\)"):
        kn_logprob_against(
            None, [None, None, None], discounts_ppm=(0, 500000)
        )
    with pytest.raises(ValueError, match=r"\(0, 1e6\)"):
        kn_logprob_against(
            None, [None, None, None], discounts_ppm=(1000000, 1)
        )
    with pytest.raises(ValueError, match="zero|backoff"):
        kn_logprob_against(
            None, [None, None, None], short_docs="drop"
        )


def test_estimate_kn_discounts_matches_python_and_scores(spark):
    """Chen & Goodman D = n1/(n1+2·n2) per conditional order, from the
    counts each order actually scores (raw at top, continuation
    below) — pinned against an independent dict-based computation, and
    the estimated discounts flow through the scorer to match the
    Python reference end-to-end."""
    from mod_reservoir_spark.pipeline.text import (
        estimate_kn_discounts_ppm,
    )

    docs = _docs(spark, 100)
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    texts = [t for _, t in rows]
    order = 3
    grams = {k: Counter() for k in range(2, order + 1)}
    for t in texts:
        ts = _toks(t)
        for k in range(2, order + 1):
            for i in range(len(ts) - k + 1):
                grams[k][tuple(ts[i : i + k])] += 1

    def d_ppm(counts):
        n1 = sum(1 for c in counts if c == 1)
        n2 = sum(1 for c in counts if c == 2)
        if n1 == 0:
            return 750000
        return min(999999, max(1, round(n1 / (n1 + 2 * n2) * 1000000)))

    cc2 = Counter()
    for g in grams[3]:
        cc2[g[1:]] += 1
    want = (d_ppm(grams[3].values()), d_ppm(cc2.values()))
    got = estimate_kn_discounts_ppm(ngram_count_tables(docs, order))
    assert got == want
    # and the estimated discounts score end-to-end like the reference
    scored = {
        r.doc_id: (r.n_ngrams, r.mean_nll_e6)
        for r in kn_logprob_scores(
            docs, order, discounts_ppm=got
        ).collect()
    }
    ref = ref_scores(texts, rows, order, got)
    for did in ref:
        assert scored[did][0] == ref[did][0]
        assert abs(scored[did][1] - ref[did][1]) <= 1


def test_modified_kn_matches_python_reference(spark):
    """Modified Kneser-Ney (Chen & Goodman 1999 §5 — the KenLM
    default): per-count-class discounts D1/D2/D3+ estimated from
    counts-of-counts, class-summed backoff mass. The estimator's
    triples are pinned against an independent dict computation and
    the scorer against the triple-spec Python reference, on both the
    self-scoring and the OOV/unseen fixed-reference paths."""
    from pyspark.sql import functions as F

    from mod_reservoir_spark.pipeline.text import (
        estimate_kn_discounts_ppm,
    )

    docs = _docs(spark, 120)
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    texts = [t for _, t in rows]
    order = 3
    # independent estimate of the triples
    grams = {k: Counter() for k in range(2, order + 1)}
    for t in texts:
        ts = _toks(t)
        for k in range(2, order + 1):
            for i in range(len(ts) - k + 1):
                grams[k][tuple(ts[i : i + k])] += 1

    def trip(counts):
        n = Counter()
        for c in counts:
            if c <= 4:
                n[c] += 1
        if 0 in (n[1], n[2], n[3]):
            return (750000,) * 3
        y = n[1] / (n[1] + 2 * n[2])
        out = []
        for k in (1, 2, 3):
            dk = k - (k + 1) * y * n[k + 1] / n[k]
            out.append(min(k * 1000000 - 1, max(1, round(dk * 1000000))))
        return tuple(out)

    cc2 = Counter()
    for g in grams[3]:
        cc2[g[1:]] += 1
    want_specs = (trip(grams[3].values()), trip(cc2.values()))
    got_specs = estimate_kn_discounts_ppm(
        ngram_count_tables(docs, order), modified=True
    )
    assert got_specs == want_specs

    # self-scoring with the estimated triples
    want = ref_scores(texts, rows, order, got_specs)
    got = {
        r.doc_id: (r.n_ngrams, r.mean_nll_e6)
        for r in kn_logprob_scores(
            docs, order, discounts_ppm=got_specs
        ).collect()
    }
    for did in want:
        assert got[did][0] == want[did][0]
        assert abs(got[did][1] - want[did][1]) <= 1

    # fixed-reference OOV path: train half scores mutated eval half
    train_rows = rows[::2]
    train = docs.filter(
        F.col("doc_id").isin([d for d, _ in train_rows])
    )
    ev_rows = [
        (d, (t + f" qzoov{d}") if d % 3 == 0 else t)
        for d, t in rows[1::2]
    ]
    ev = spark.createDataFrame(ev_rows, "doc_id long, text string")
    tables = ngram_count_tables(train, order)
    specs = estimate_kn_discounts_ppm(tables, modified=True)
    got2 = {
        r.doc_id: (r.n_ngrams, r.mean_nll_e6)
        for r in kn_logprob_against(
            ev, tables, discounts_ppm=specs,
            short_docs="backoff", broadcast_tables=True,
        ).collect()
    }
    want2 = ref_scores(
        [t for _, t in train_rows], ev_rows, order, specs, "backoff"
    )
    for did in want2:
        assert got2[did][0] == want2[did][0]
        assert abs(got2[did][1] - want2[did][1]) <= 1

    # validation: bad triple shapes / ranges
    with pytest.raises(ValueError, match="triple"):
        kn_logprob_against(
            None, [None] * 3, discounts_ppm=((1, 2), (1, 2, 3))
        )
    with pytest.raises(ValueError, match="D2 must be"):
        kn_logprob_against(
            None, [None] * 3,
            discounts_ppm=((500000, 2000000, 100), (1, 1, 1)),
        )


def test_kn_gate_in_curate_and_buckets(spark, tmp_path):
    """The full CCNet-with-KN loop: perplexity_buckets(smoothing='kn')
    ranks by the KN scorer (so a threshold read off the buckets gates
    consistently), and curate(lm_model_path=..., lm_smoothing='kn')
    drops exactly the docs whose KN NLL under the persisted model
    exceeds it; JM/KN parameter cross-use is rejected everywhere."""
    from pyspark.sql import functions as F

    from mod_reservoir_spark.pipeline.curate import curate
    from mod_reservoir_spark.pipeline.lm_model import (
        build_lm_prefix,
        score_under_model,
        write_lm_model,
    )
    from mod_reservoir_spark.pipeline.text import perplexity_buckets

    docs = _docs(spark, 80).withColumn("lang", F.lit("en"))
    train = docs.filter(F.col("doc_id") % 2 == 0)
    path = str(tmp_path / "m")
    write_lm_model(build_lm_prefix(train, 3), 3, path)
    kn_scores = {
        r.doc_id: r.mean_nll_e6
        for r in score_under_model(
            docs, spark, path, smoothing="kn"
        ).collect()
    }
    # buckets rank by the SAME scores
    tables = ngram_count_tables(train, 3)
    b = perplexity_buckets(
        docs, lm_tables=tuple(tables), smoothing="kn",
        lm_broadcast=True,
    )
    got_scores = {r.doc_id: r.mean_nll_e6 for r in b.collect()}
    assert got_scores == kn_scores
    # gate: pick a cut that splits, check attribution matches kn NLL
    vals = sorted(v for v in kn_scores.values() if v > 0)
    cut = vals[len(vals) // 2]
    led = curate(
        docs, lm_model_path=path, lm_smoothing="kn", max_nll_e6=cut
    )
    g = {r.doc_id: r.drop_stage for r in led.collect()}
    px_dropped = {i for i, s in g.items() if s == "perplexity"}
    q_survivors = {i for i, s in g.items() if s != "quality"}
    expect = {
        i for i in q_survivors
        if kn_scores[i] > cut or kn_scores[i] == 0
    }
    # n_ngrams=0 docs (empty) also drop at the gate; none here have
    # empty text among quality survivors, so the comparison is exact
    assert px_dropped == {i for i in expect if kn_scores[i] > cut}
    assert px_dropped  # the gate fired

    import pytest as _pytest

    with _pytest.raises(ValueError, match="kn parameter"):
        curate(
            docs, lm_model_path=path, max_nll_e6=cut,
            lm_discounts_ppm=750000,
        )
    with _pytest.raises(ValueError, match="needs lm_tables"):
        perplexity_buckets(docs, smoothing="kn")
    with _pytest.raises(ValueError, match="kn parameter"):
        perplexity_buckets(
            docs, lm_tables=tuple(tables), discounts_ppm=750000
        )


def test_kn_under_persisted_model_and_jm_unchanged(spark, tmp_path):
    """One persisted prefix artifact serves BOTH smoothings:
    score_under_model(smoothing='kn') equals the fresh-table KN
    scorer, and the default JM path is bit-identical to what it was
    without the kn code in the tree (same call, same tables)."""
    from mod_reservoir_spark.pipeline.lm_model import (
        build_lm_prefix,
        score_under_model,
        write_lm_model,
    )
    from mod_reservoir_spark.pipeline.text import ngram_logprob_against

    docs = _docs(spark, 80)
    path = str(tmp_path / "m")
    write_lm_model(build_lm_prefix(docs, 3), 3, path)
    kn_served = score_under_model(
        docs, spark, path, smoothing="kn", short_docs="backoff"
    )
    kn_fresh = kn_logprob_against(
        docs,
        ngram_count_tables(docs, 3),
        short_docs="backoff",
        broadcast_tables=True,
    )
    assert kn_served.orderBy("doc_id").collect() == (
        kn_fresh.orderBy("doc_id").collect()
    )
    jm_served = score_under_model(docs, spark, path)
    jm_fresh = ngram_logprob_against(
        docs,
        ngram_count_tables(docs, 3),
        short_docs="backoff",
        broadcast_tables=True,
    )
    assert jm_served.orderBy("doc_id").collect() == (
        jm_fresh.orderBy("doc_id").collect()
    )
    with pytest.raises(ValueError, match="jm parameter"):
        score_under_model(
            docs, spark, path, smoothing="kn", lambdas_ppm=(600000, 300000)
        )
    with pytest.raises(ValueError, match="kn parameter"):
        score_under_model(docs, spark, path, discounts_ppm=750000)
