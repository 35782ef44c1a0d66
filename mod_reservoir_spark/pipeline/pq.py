"""Product-quantized ANN serving (IVF-PQ) — the billion-vector shape.

The scalar path (:func:`similarity.quantize_embeddings`) shrinks
float32 4× and still re-scores from codes; PQ is the structure
actually used at 100 TB vector scale (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — the layout
behind FAISS's IVFPQ): split each d-dim vector into ``m`` subspaces,
k-means each subspace against its own ``ksub``-entry codebook, and
store only the m nearest-centroid ids — **m bytes per vector** at
ksub<=128 (64-dim float32 256 B → 16 B at the m=16 default, 16×).

Serving never reconstructs vectors: Asymmetric Distance Computation
(ADC) turns a query into an m×ksub lookup table of subspace partial
inner products; a candidate's score is the sum of m table entries
picked by its codes. Two scoring regimes, routed by query-set size
exactly like lsh_topk_quantized:

- **broadcast path** (the serving case): LUTs built driver-side and
  broadcast; the codes scan streams through ONE Arrow-batched pass
  where scoring is m numpy gathers per batch — the cosine_topk hot
  shape. The scan reads only (id, codes) (plan-guarded).
- **past-cutover fallback** (mega query sets): no driver collect —
  the LUT becomes a JVM expression column (higher-order functions
  over the literal codebook array) and scoring a crossJoin
  expression. HOFs evaluate interpreted (no whole-stage codegen), so
  per-pair this is ~5× slower (measured at 200k×100, sf10 round 7) —
  the price of unbounded query sets; both paths produce identical
  round-6 scores (equivalence-pinned).

Scores are the ADC *approximation* of cosine (ip̂ / (|q|·|x̂|) over
the reconstruction x̂); ``rescore=True`` joins the ADC shortlist back
to float vectors for exact final ranking.

Scale shape: `pq_topk` is the brute ADC scan (every code row, tiny
rows); `ivf_pq_topk` prunes candidates to the probed IVF cells first
— probe table is (queries × nprobe) rows, candidates come from one
equi-join on the cell id, exactly the :func:`similarity.ivf_topk`
silhouette but over m-byte codes instead of 256-byte vectors.

Cross-engine determinism (the repo-wide convention): every
assignment/ranking site rounds to 6 decimals first and breaks ties
toward the lowest index/id, so a DuckDB oracle handed the same
codebook literals reproduces codes and scores exactly.

Reference parity note: the reference (folio-org/mod-reservoir) has no
vector search at all — this module extends the engine for the
LLM-training-data workloads the build brief adds as first-class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import _dot, _topk


def _split_dims(d: int, m: int) -> int:
    if d % m:
        raise ValueError(f"pq: dim {d} not divisible by m={m}")
    return d // m


def _code_type(ksub: int) -> str:
    # codes are 0..ksub-1; signed tinyint holds <=127
    return "tinyint" if ksub <= 128 else "smallint"


def pq_train(
    embeddings: DataFrame,
    m: int = 16,
    ksub: int = 32,
    iterations: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[list[float]]], list[float]]:
    """Per-subspace Lloyd refinement for the PQ codebooks.

    Same scalable shape as :func:`similarity.kmeans_train`: each
    iteration broadcasts the (tiny) m×ksub×dsub codebook tensor and
    makes ONE Arrow-batched corpus pass emitting per-batch PARTIAL
    sums — (sub, cid, count, sum-subvector, inertia) rows — so the
    driver reduce is kilobytes regardless of corpus size. Assignment
    is squared-L2 argmin per subspace with round-6 distances and
    lowest-cid ties (the cross-engine rule). Empty cells keep their
    previous centroid. Seeds are the subvectors of the ``ksub``
    smallest ids — deterministic and oracle-reproducible.

    Returns (codebooks, inertia_history): codebooks[sub][cid] is a
    dsub-float centroid; inertia is the summed squared-L2 to the
    assigned centroids (non-increasing across iterations is the
    convergence pin in tests/test_pq.py).
    """
    import numpy as np

    seed_rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(ksub)
        .collect()
    )
    if not seed_rows:
        raise ValueError("pq_train: empty corpus")
    d = len(seed_rows[0][1])
    dsub = _split_dims(d, m)
    seeds = np.array([list(r[1]) for r in seed_rows], dtype=np.float64)
    ksub = seeds.shape[0]  # corpus smaller than ksub seeds fewer cells
    # cb[sub, cid] = seed cid's sub-th subvector
    cb = seeds.reshape(ksub, m, dsub).transpose(1, 0, 2).copy()
    sc = embeddings.sparkSession.sparkContext
    history: list[float] = []
    for _ in range(iterations):
        bc = sc.broadcast(cb)

        def partials(batches, bc=bc, m=m, ksub=ksub, dsub=dsub):
            import pandas as pd

            bcb = bc.value
            sums = np.zeros((m, ksub, dsub))
            counts = np.zeros((m, ksub), dtype=np.int64)
            inertia = 0.0
            seen = False
            for pdf in batches:
                if not len(pdf):
                    continue
                seen = True
                vm = np.array(pdf[pdf.columns[0]].tolist(), dtype=np.float64)
                r = vm.reshape(len(vm), m, dsub)
                # (rows, m, ksub) squared-L2; round-6 + first-min tie
                d2 = np.round(
                    ((r[:, :, None, :] - bcb[None, :, :, :]) ** 2).sum(-1),
                    6,
                )
                code = d2.argmin(axis=2)
                inertia += float(
                    np.take_along_axis(d2, code[:, :, None], 2).sum()
                )
                for sub in range(m):
                    np.add.at(sums[sub], code[:, sub], r[:, sub, :])
                    np.add.at(counts[sub], code[:, sub], 1)
            if seen:
                subs, cids = np.divmod(np.arange(m * ksub), ksub)
                yield pd.DataFrame(
                    {
                        "sub": subs,
                        "cid": cids,
                        "n": counts.ravel(),
                        "s": [row.tolist() for row in sums.reshape(-1, dsub)],
                        "inertia": [inertia] + [0.0] * (m * ksub - 1),
                    }
                )

        rows = (
            embeddings.select(vec_col)
            .mapInPandas(
                partials,
                schema="sub long, cid long, n long, s array<double>, "
                "inertia double",
            )
            .collect()
        )
        sums = np.zeros_like(cb)
        counts = np.zeros((m, ksub), dtype=np.int64)
        inertia = 0.0
        for r in rows:
            sums[r["sub"], r["cid"]] += np.array(r["s"])
            counts[r["sub"], r["cid"]] += r["n"]
            inertia += r["inertia"]
        nonempty = counts > 0
        cb = np.where(
            nonempty[:, :, None],
            sums / np.maximum(counts, 1)[:, :, None],
            cb,
        )
        history.append(round(inertia, 6))
        bc.destroy()
    return [[c.tolist() for c in sub] for sub in cb], history


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as its m nearest sub-centroid ids.

    One Arrow-batched argmin pass with the broadcast codebook tensor —
    no shuffle; output (vec_id, codes array<tinyint>) is the m-byte
    storage row. Round-6 squared-L2 + lowest-cid ties, so a DuckDB
    oracle handed the same codebook literals produces identical codes.
    """
    import numpy as np

    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    cbm = np.array(codebooks, dtype=np.float64)
    bc = embeddings.sparkSession.sparkContext.broadcast(cbm)
    ctype = _code_type(ksub)

    def encode(batches):
        import pandas as pd

        bcb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            r = vm.reshape(len(vm), m, dsub)
            d2 = np.round(
                ((r[:, :, None, :] - bcb[None, :, :, :]) ** 2).sum(-1), 6
            )
            code = d2.argmin(axis=2)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col],
                    "codes": [row for row in code],
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        encode, schema=f"vec_id long, codes array<{ctype}>"
    )


def _pick(codes_col, table):
    """Sum of the m table entries selected by the codes: the ADC
    inner loop, a zip_with/aggregate JVM expression."""
    return F.aggregate(
        F.zip_with(
            codes_col,
            table,
            lambda c, l: F.element_at(l, c.cast("int") + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _recon_n2(codes_col, codebooks):
    """Reconstruction norm² per code row, from the query-independent
    |centroid|² table. MUST be projected on the corpus side BEFORE
    any join with the query side: the literal m×ksub array is
    constructed per evaluating row, so evaluating it per (query ×
    candidate) pair instead of per candidate was a measured 25×
    serving slowdown at 200k×100 (sf10 run, round 7)."""
    n2_lit = F.lit(
        [[sum(x * x for x in c) for c in sub] for sub in codebooks]
    )
    return _pick(codes_col, n2_lit)


def _adc_score(lut_col, qnorm_col, codes_col, n2_col):
    """The per-pair JVM ADC expression: approximate cosine from the
    candidate's codes + the query's inner-product LUT + the
    PRE-projected reconstruction norm² column (see _recon_n2)."""
    ip = _pick(codes_col, lut_col)
    denom = qnorm_col * F.sqrt(n2_col)
    return F.when(denom > 0, F.round(ip / denom, 6)).otherwise(
        F.lit(float("nan"))
    )


def _query_lut(codebooks, vec_col: str = "embedding"):
    """Per-query LUT column: lut[sub][cid] = q_sub · centroid — built
    entirely with higher-order functions over the literal codebook
    array (no Python, no collect; the query frame can be any size).
    Used on the PAST-CUTOVER path only: HOF expressions evaluate
    interpreted (no whole-stage codegen), so per-pair they lose to the
    Arrow-batched numpy path by ~5× — but they need no driver collect,
    which is what the mega-query regime requires."""
    dsub = len(codebooks[0][0])
    qv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return F.transform(
        F.lit(codebooks),
        lambda sub, s: F.transform(
            sub,
            lambda c: _dot(F.slice(qv, s * F.lit(dsub) + F.lit(1), dsub), c),
        ),
    )


def _np_luts(q_rows, codebooks):
    """(qids, luts, qnorms) numpy triple from collected query rows:
    luts[q, sub, cid] = q_sub · centroid, qnorm rounded to 9 (the same
    rounding site as the JVM/SQL formulations, so both serving paths
    and the DuckDB oracle produce identical round-6 scores)."""
    import numpy as np

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cbm = np.array(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qm = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    qsub = qm.reshape(len(q_rows), m, dsub)
    luts = np.einsum("qms,mks->qmk", qsub, cbm)
    qnorms = np.round(np.sqrt((qm * qm).sum(axis=1)), 9)
    return qids, luts, qnorms


def _np_n2(codebooks):
    import numpy as np

    cbm = np.array(codebooks, dtype=np.float64)
    return (cbm * cbm).sum(axis=2)  # (m, ksub)


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    rescore: bool | DataFrame = False,
    shortlist: int = 8,
    max_broadcast_queries: int | None = None,
    n_queries: int | None = None,
) -> DataFrame:
    """Brute ADC top-k over every code row.

    Fast path (query batch under the broadcast cutover — the serving
    case): queries are collected, their LUTs built driver-side, and
    the corpus streams through ONE Arrow-batched pass where scoring is
    m numpy gathers per batch — the :func:`similarity.cosine_topk`
    shape, no shuffle of the corpus. (A pure zip_with/aggregate
    formulation was tried first: Spark higher-order functions run
    interpreted, ~5× slower per pair at 200k×100 — the same lesson
    cosine_topk's docstring records.)

    Past the cutover the no-collect fallback kicks in: the LUT becomes
    a JVM expression column (:func:`_query_lut`) and scoring a
    crossJoin + expression — slower per pair but shuffle-safe at any
    query-set size. ``n_queries`` is the caller hint that skips the
    routing probe (the lsh_topk_quantized contract).

    ``rescore``: pass the float embeddings DataFrame to re-rank an ADC
    shortlist of ``shortlist``·k candidates per query with exact
    cosine — the standard two-stage serving refinement; output then
    carries the exact score. Default off: pure-codes serving.

    Output: (query_id, neighbor_id, score, rank) — the family
    contract; score is the ADC cosine approximation (round-6),
    identical on both paths (pinned in tests/test_pq.py).
    """
    from .similarity import MAX_BROADCAST_QUERIES

    _check_rescore(rescore)
    if max_broadcast_queries is None:
        max_broadcast_queries = MAX_BROADCAST_QUERIES
    q_rows = None
    if n_queries is not None:
        over = n_queries > max_broadcast_queries
    else:
        q_rows = (
            queries.select(id_col, vec_col)
            .limit(max_broadcast_queries + 1)
            .collect()
        )
        over = len(q_rows) > max_broadcast_queries
    if over:
        scored = _adc_scored_distributed(
            codes, queries, codebooks, id_col, codes_col, vec_col
        )
    else:
        if q_rows is None:
            q_rows = queries.select(id_col, vec_col).collect()
        scored = _adc_scored_broadcast(
            codes,
            q_rows,
            codebooks,
            id_col,
            codes_col,
            # each batch only needs to surface what the final window
            # keeps: k rows per query (shortlist·k when an exact
            # rescore re-ranks the ADC shortlist)
            per_query_cap=k if rescore is False else shortlist * k,
        )
    scored = _nan_floor(scored)
    if rescore is False:
        return _topk(scored, k)
    return _rescore(scored, queries, rescore, k, shortlist, id_col, vec_col)


def _check_rescore(rescore) -> None:
    """``rescore`` is False or the float-embeddings DataFrame. The
    bool|DataFrame hint invites ``rescore=True``, which used to flow
    True into :func:`_rescore` as the embeddings frame and die with an
    AttributeError deep in the join (ADVICE r7) — fail loudly at the
    boundary instead."""
    if rescore is True:
        raise ValueError(
            "rescore=True is not a mode: pass the float embeddings "
            "DataFrame to re-rank against (or False for pure-codes "
            "serving)"
        )


def _nan_floor(scored: DataFrame) -> DataFrame:
    """Spark orders NaN ABOVE every real double, so a NaN ADC score
    (zero-norm query, all-zero reconstruction) would outrank all real
    candidates in the top-k window (ADVICE r7). Floor NaN to -inf:
    degenerate candidates sort LAST, real scores are untouched."""
    return scored.withColumn(
        "score",
        F.when(F.isnan("score"), F.lit(float("-inf"))).otherwise(
            F.col("score")
        ),
    )


def _cap_select(s, nids, qids, cap):
    """Per-batch top-``cap`` selection under the EXACT (score desc,
    neighbor_id asc, NaN floored) total order — the reduction behind
    the capped Arrow emit. ``s`` is the (n_queries, n_rows) round-6
    score matrix, ``nids``/``qids`` the candidate/query id vectors.
    Returns (row, col) index arrays into ``s`` (self-pairs excluded),
    or None when an id is outside the composite-key bound and the
    caller must fall back to the unreduced emit.

    Selection uses one composite int64 key per cell + argpartition:
    NaN → a -2e6 sentinel (below any real round-6 score in ±1e6,
    matching the -inf floor's sort position), then
    key = si·2^42 - nid. Bucket width 2^42, NOT 2^41: -nid spans the
    OPEN interval (-(2^41), 2^41) — a 2^42-wide range — so a 2^41
    bucket lets (si1 > si2, nid1 - nid2 > 2^41) invert the total
    order. With 2^42, si1 > si2 gives key1 - key2 >= 2^42 -
    (nid1 - nid2) > 0 always; |key| <= 2e6·2^42 + 2^41 ≈ 8.8e18 <
    int64 max. The id bound is checked with explicit min/max, never
    np.abs: abs(int64.min) overflows back to int64.min (negative) and
    would slip an abs-based guard (ADVICE r10; both edges pinned in
    tests/test_pq.py and property-tested against a brute reference)."""
    import numpy as np

    # a zero-size matrix (no queries in the batch, or no candidate
    # rows) has nothing to reduce — np.fmin.reduce raises on it — and
    # the unreduced fallback emit already handles the degenerate
    # shapes correctly (ADVICE r12)
    if s.size == 0:
        return None
    if not (
        nids.min(initial=0) > -(1 << 41)
        and nids.max(initial=0) < (1 << 41)
    ):
        return None
    # the composite key's overflow bound assumes scores in [-1, 1]
    # (si within ±1e6 → |key| ≤ ~8.8e18): true for every current
    # caller (ADC cosine approximations), but this is a module-level
    # helper now, so a future caller with unbounded scores must hit
    # the same None fallback as out-of-range ids, not a silent int64
    # wrap that scrambles the total order (ADVICE r11). Threshold
    # 1.001: tolerant of quantization/float slack on a true cosine,
    # still far below the ~2.0 where |key| actually overflows (the
    # -2e6 NaN sentinel already proves ±2e6 si is representable).
    # fmin/fmax reduces: NaN-ignoring, ZERO temporaries — a boolean
    # mask + fancy-index copy here costs ~40 ms and ~400 MB of
    # transient allocation per 4000×10k Arrow batch on the brute-ADC
    # hot path; all-NaN reduces to NaN, which compares False and
    # correctly stays on the fast path (the sentinel handles it).
    lo = np.fmin.reduce(s, axis=None)
    hi = np.fmax.reduce(s, axis=None)
    if hi > 1.001 or lo < -1.001:
        return None
    si = np.where(np.isnan(s), -2_000_000, np.rint(s * 1e6)).astype(
        np.int64
    )
    key = si * (1 << 42) - nids[None, :]
    imin = np.iinfo(np.int64).min
    key[nids[None, :] == qids[:, None]] = imin  # self-pairs
    # partition on key (ascending) and slice the TOP cap — never
    # argpartition(-key): negating int64.min (the self-pair sentinel)
    # overflows back to itself and the excluded column rides into the
    # slice
    part = np.argpartition(key, len(nids) - cap, axis=1)[:, -cap:]
    rowq = np.repeat(np.arange(len(qids)), cap)
    coln = part.ravel()
    keep = key[rowq, coln] != imin
    return rowq[keep], coln[keep]


def _adc_scored_broadcast(
    codes: DataFrame,
    q_rows,
    codebooks,
    id_col: str,
    codes_col: str,
    per_query_cap: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, score) via broadcast LUTs + one
    Arrow-batched numpy pass over the codes scan.

    ``per_query_cap``: when set, each Arrow batch emits only its top
    ``cap`` rows per query — selected under the EXACT total order the
    downstream :func:`similarity._topk` window uses (round-6 score
    desc, neighbor_id asc, NaN floored to -inf), so global top-k over
    the per-batch survivors equals global top-k over all pairs. This
    is the reduction that keeps the brute path alive at corpus scale:
    unreduced, a batch emits |queries| × |batch| rows — at sf10
    (4,000 queries × 10k-row batches) that is 40M rows ≈ 768 MB of
    Arrow per batch, which OOM'ed netty's direct-memory pool (SCALE.md
    r10). Capped, a batch emits |queries| × cap rows (20k at k=5) —
    a 2000× reduction with bit-identical final top-k (equality-pinned
    in tests/test_pq.py). Selection is :func:`_cap_select` (composite
    int64 key + argpartition; ids outside its bound fall back to the
    unreduced emit)."""
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    qids, luts, qnorms = _np_luts(q_rows, codebooks)
    n2_tab = _np_n2(codebooks)
    bq = codes.sparkSession.sparkContext.broadcast(
        (qids, luts, qnorms, n2_tab)
    )

    def score(batches):
        bqids, bluts, bqnorms, bn2 = bq.value
        sub_ix = np.arange(m)
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.array(pdf[codes_col].tolist(), dtype=np.int64)
            nids = pdf[id_col].to_numpy(dtype=np.int64)
            n2 = bn2[sub_ix[None, :], cm].sum(axis=1)
            # ip[q, row] = sum over sub of lut[q, sub, code[row, sub]]
            ip = np.zeros((len(bqids), len(nids)))
            for sub in range(m):
                ip += bluts[:, sub, :][:, cm[:, sub]]
            denom = bqnorms[:, None] * np.sqrt(n2)[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                s = np.where(denom > 0, ip / denom, np.nan)
            s = np.round(s, 6)  # (n_queries, n_batch_rows)
            cap = per_query_cap
            if cap is not None and len(nids) > cap:
                capped = _cap_select(s, nids, bqids, cap)
                if capped is not None:
                    rowq, coln = capped
                    sel = s[rowq, coln]
                    yield pd.DataFrame(
                        {
                            "query_id": bqids[rowq],
                            "neighbor_id": nids[coln],
                            "score": np.where(
                                np.isnan(sel), -np.inf, sel
                            ),
                        }
                    )
                    continue
            sflat = s.ravel()
            qcol = np.repeat(bqids, len(nids))
            ncol = np.tile(nids, len(bqids))
            mask = qcol != ncol
            sflat = sflat[mask]
            yield pd.DataFrame(
                {
                    "query_id": qcol[mask],
                    "neighbor_id": ncol[mask],
                    # floor NaN here too so both branches emit the
                    # _nan_floor contract (its Spark-side pass is then
                    # a no-op either way)
                    "score": np.where(np.isnan(sflat), -np.inf, sflat),
                }
            )

    return codes.select(id_col, codes_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, score double"
    )


def _adc_scored_distributed(
    codes: DataFrame,
    queries: DataFrame,
    codebooks,
    id_col: str,
    codes_col: str,
    vec_col: str,
) -> DataFrame:
    """(query_id, neighbor_id, score) with NO driver collect: the LUT
    is a JVM expression column on the query side, scoring a crossJoin
    expression. Per-pair this is interpreted-HOF slow, but it is the
    shape that survives an unbounded query set."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _query_lut(codebooks, vec_col).alias("_lut"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform(F.col(vec_col), lambda x: x.cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ),
            9,
        ).alias("_qnorm"),
    )
    c = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(codes_col).alias("_codes"),
        _recon_n2(F.col(codes_col), codebooks).alias("_n2"),
    )
    return (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _adc_score(
                F.col("_lut"), F.col("_qnorm"), F.col("_codes"), F.col("_n2")
            ).alias("score"),
        )
    )


def _rescore(
    scored: DataFrame,
    queries: DataFrame,
    embeddings: DataFrame,
    k: int,
    shortlist: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Exact-cosine re-rank of the ADC shortlist (top shortlist·k per
    query): two equi-joins against the float vectors, then the same
    round-6 cosine every exact path uses."""
    from .similarity import _norm

    short = _topk(scored, shortlist * k).select("query_id", "neighbor_id")
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cv = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    a = F.transform(F.col("_qv"), lambda x: x.cast("double"))
    b = F.transform(F.col("_cv"), lambda x: x.cast("double"))
    exact = (
        short.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6).alias("score"),
        )
    )
    return _topk(_nan_floor(exact), k)


def pq_index(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Materialize the IVF-PQ serving table: (vec_id, cell, codes) —
    the coarse cell from :func:`similarity.ivf_assign` joined to the
    PQ codes, i.e. ~9 bytes of index per vector at the defaults.
    Write it partitioned/sorted by cell and `ivf_pq_topk` serves with
    cell-pruned scans."""
    from .similarity import ivf_assign

    cells = ivf_assign(
        embeddings, id_col=id_col, vec_col=vec_col, centroids=centroids
    )
    codes = pq_encode(embeddings, codebooks, id_col, vec_col)
    return cells.join(codes, "vec_id")


def write_pq_index(
    index: DataFrame,
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
    path: str,
) -> None:
    """Persist the COMPLETE serving artifact — the write_text_index
    symmetry for vectors: ``{path}/codes/cell=<c>/`` holds the
    (vec_id, codes) rows one parquet partition per coarse cell
    (vec_id-sorted within), and ``{path}/model/`` holds the codebooks
    and coarse centroids as rows (kind, sub, cid, center), so a serving
    process needs nothing but the path. Cell partitioning means a
    probe join (broadcast, or a literal cell filter) prunes unprobed
    cells at the file level."""
    spark = index.sparkSession
    (
        index.repartition("cell")
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/codes")
    )
    rows = [
        ("codebook", sub, cid, list(center))
        for sub, centers in enumerate(codebooks)
        for cid, center in enumerate(centers)
    ] + [
        ("centroid", -1, cid, list(c)) for cid, c in enumerate(centroids)
    ]
    spark.createDataFrame(
        rows, "kind string, sub long, cid long, center array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/model")


def read_pq_index(
    spark, path: str
) -> tuple[DataFrame, list[list[list[float]]], list[list[float]]]:
    """(index, codebooks, centroids) back from :func:`write_pq_index`
    — directly servable by :func:`ivf_pq_topk`. The model frame is
    tiny (m×ksub + n_cells rows) and collected; the codes frame stays
    lazy with ``cell`` restored from the partition directories."""
    idx = spark.read.parquet(f"{path}/codes").withColumn(
        "cell", F.col("cell").cast("long")
    )
    model = spark.read.parquet(f"{path}/model").collect()
    cb_rows = sorted(
        ((r.sub, r.cid, list(r.center)) for r in model if r.kind == "codebook")
    )
    m = max(r[0] for r in cb_rows) + 1
    codebooks = [
        [c for s, _cid, c in cb_rows if s == sub] for sub in range(m)
    ]
    centroids = [
        list(r.center)
        for r in sorted(
            (r for r in model if r.kind == "centroid"), key=lambda r: r.cid
        )
    ]
    return idx, codebooks, centroids


def ivf_pq_topk(
    index: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rescore: bool | DataFrame = False,
    shortlist: int = 8,
    max_broadcast_queries: int | None = None,
    n_queries: int | None = None,
) -> DataFrame:
    """IVF-PQ serving: queries probe their ``nprobe`` nearest coarse
    cells (round-6 cosine + lowest-cell ties — the ivf_topk rule);
    candidates come from ONE equi-join on the cell id against the
    (cell, codes) index; ADC scores the candidates with the broadcast
    numpy LUTs (query sets past the broadcast cutover fall back to the
    no-collect JVM-expression scoring — see :func:`pq_topk`).

    With nprobe >= n_cells this equals :func:`pq_topk` exactly
    (pinned in tests). The candidate generator is an equi-join on a
    bounded key and the per-candidate row is m bytes — the silhouette
    that survives a billion-vector corpus.
    """
    import numpy as np
    import pandas as pd

    from .similarity import MAX_BROADCAST_QUERIES

    _check_rescore(rescore)
    if max_broadcast_queries is None:
        max_broadcast_queries = MAX_BROADCAST_QUERIES

    cm = np.array(centroids, dtype=np.float64)
    cnorm = np.sqrt((cm * cm).sum(axis=1))
    bc = index.sparkSession.sparkContext.broadcast((cm, cnorm))

    def probe(batches):
        bcm, bcnorm = bc.value
        npb = min(nprobe, len(bcm))
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vnorm = np.sqrt((vm * vm).sum(axis=1))
            s = np.round(
                (vm @ bcm.T) / (vnorm[:, None] * bcnorm[None, :]), 6
            )
            order = np.lexsort(
                (np.tile(np.arange(s.shape[1]), (len(vm), 1)), -s), axis=1
            )[:, :npb]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf[id_col].to_numpy(), npb),
                    "cell": order.ravel(),
                }
            )

    probes = queries.select(id_col, vec_col).mapInPandas(
        probe, schema="query_id long, cell long"
    )
    q_rows = None
    if n_queries is not None:
        over = n_queries > max_broadcast_queries
    else:
        q_rows = (
            queries.select(id_col, vec_col)
            .limit(max_broadcast_queries + 1)
            .collect()
        )
        over = len(q_rows) > max_broadcast_queries
    if over:
        cand = (
            probes.join(
                index.select(
                    F.col("vec_id").alias("neighbor_id"),
                    "cell",
                    "codes",
                    # norm² projected per INDEX row, before the probe
                    # join fans candidates out per query (_recon_n2)
                    _recon_n2(F.col("codes"), codebooks).alias("_n2"),
                ),
                "cell",
            )
            .filter(F.col("query_id") != F.col("neighbor_id"))
            # no distinct: probe cells per query are UNIQUE by
            # construction (lexsort permutation, top-nprobe), so a
            # (query, neighbor) pair cannot repeat — a dedup here
            # would be a full candidate-set shuffle for nothing
            .select("query_id", "neighbor_id", "codes", "_n2")
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            _query_lut(codebooks, vec_col).alias("_lut"),
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.transform(
                            F.col(vec_col), lambda x: x.cast("double")
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x * x,
                    )
                ),
                9,
            ).alias("_qnorm"),
        )
        scored = cand.join(q, "query_id").select(
            "query_id",
            "neighbor_id",
            _adc_score(
                F.col("_lut"), F.col("_qnorm"), F.col("codes"), F.col("_n2")
            ).alias("score"),
        )
    else:
        if q_rows is None:
            q_rows = queries.select(id_col, vec_col).collect()
        cand = (
            probes.join(
                index.select(
                    F.col("vec_id").alias("neighbor_id"), "cell", "codes"
                ),
                "cell",
            )
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", "codes")  # no distinct:
            # probe cells per query are unique (see fallback branch)
        )
        m = len(codebooks)
        qids, luts, qnorms = _np_luts(q_rows, codebooks)
        n2_tab = _np_n2(codebooks)
        qidx = {int(qid): i for i, qid in enumerate(qids)}
        bq = index.sparkSession.sparkContext.broadcast(
            (qidx, luts, qnorms, n2_tab)
        )

        def score(batches):
            bqidx, bluts, bqnorms, bn2 = bq.value
            sub_ix = np.arange(m)
            for pdf in batches:
                if not len(pdf):
                    continue
                cm_codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
                qi = np.array(
                    [bqidx[q] for q in pdf["query_id"]], dtype=np.int64
                )
                n2 = bn2[sub_ix[None, :], cm_codes].sum(axis=1)
                picked = bluts[qi[:, None], sub_ix[None, :], cm_codes]
                ip = picked.sum(axis=1)
                denom = bqnorms[qi] * np.sqrt(n2)
                with np.errstate(divide="ignore", invalid="ignore"):
                    s = np.where(denom > 0, ip / denom, np.nan)
                yield pd.DataFrame(
                    {
                        "query_id": pdf["query_id"],
                        "neighbor_id": pdf["neighbor_id"],
                        "score": np.round(s, 6),
                    }
                )

        scored = cand.mapInPandas(
            score, schema="query_id long, neighbor_id long, score double"
        )
    scored = _nan_floor(scored)
    if rescore is False:
        return _topk(scored, k)
    return _rescore(scored, queries, rescore, k, shortlist, id_col, vec_col)
