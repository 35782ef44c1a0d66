"""Distributed BPE tokenizer training — the corpus-side half of
building a tokenizer for the training run (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

Scale design: the corpus is touched by exactly ONE combinable
aggregation — pretokenized word counts, output bounded by the word
VOCABULARY, not the corpus (the classic BPE formulation trains on the
word-frequency table). The merge loop then runs driver-side over that
bounded table with the standard incremental pair-count updates: at
100 TB the vocabulary (after a ``min_count`` floor that drops hapax
noise) is millions of rows — kilobyte-scale next to the corpus — so
"collect the word counts, iterate locally, broadcast the merge table
back" is the honest Spark shape, not a shortcut. Applying the learned
merges back over the corpus is an Arrow-batched Pandas UDF with a
per-word memo (Zipf makes the memo hit rate extreme); merging inside
SQL expressions cannot express the iterative ranked-merge semantics.

Determinism: ties in pair frequency break lexicographically, so the
merge list is a pure function of the word-count table — identical
across runs, partitionings and engines.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import DataFrame, functions as F

from mod_reservoir_spark.pipeline.text import BPE_PRETOKEN_RE


def bpe_word_counts(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(word, n) counts of GPT-2-pretokenizer pieces (whitespace-only
    runs excluded) — the bounded table BPE trains on. One explode +
    one combinable shuffle; ``min_count`` floors away hapax noise
    (what keeps the table driver-collectable at corpus scale)."""
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0
    )
    out = (
        docs.select(
            F.explode(
                F.filter(pieces, lambda x: x.rlike(r"\S"))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def bpe_train_from_counts(
    counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The driver-side merge loop: standard BPE with incremental
    pair-count maintenance (pair → affected-word index; on merge only
    the words containing the pair are re-paired). Ties break on the
    lexicographically smallest pair; stops early when no pair occurs
    twice. Pure function of the count table."""
    words = [tuple(w) for w, _ in counts]
    freqs = [n for _, n in counts]
    pair_counts: Counter = Counter()
    where: defaultdict = defaultdict(set)
    for i, w in enumerate(words):
        for a, b in zip(w, w[1:]):
            pair_counts[(a, b)] += freqs[i]
            where[(a, b)].add(i)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for i in sorted(where.pop(best, ())):
            w = words[i]
            for a, b in zip(w, w[1:]):
                pair_counts[(a, b)] -= freqs[i]
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                where[(a, b)].discard(i)
            new = []
            j = 0
            while j < len(w):
                if j < len(w) - 1 and (w[j], w[j + 1]) == best:
                    new.append(joined)
                    j += 2
                else:
                    new.append(w[j])
                    j += 1
            words[i] = tuple(new)
            for a, b in zip(words[i], words[i][1:]):
                pair_counts[(a, b)] += freqs[i]
                where[(a, b)].add(i)
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 1000,
    text_col: str = "text",
    min_count: int = 2,
    max_vocab_rows: int = 2_000_000,
    word_counts: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Learn a BPE merge list from the corpus (or from a maintained
    ``word_counts`` table — the production form when counts are kept
    in the warehouse and updated per ingest batch; same pattern as
    ``corpus_sigs`` in incremental LSH). Raises if the floored
    vocabulary exceeds ``max_vocab_rows`` rather than silently
    collecting an unbounded table to the driver — raise the floor
    (``min_count``), not the cap."""
    wc = (
        word_counts
        if word_counts is not None
        else bpe_word_counts(docs, text_col, min_count)
    )
    rows = wc.limit(max_vocab_rows + 1).collect()
    if len(rows) > max_vocab_rows:
        raise ValueError(
            f"word vocabulary exceeds max_vocab_rows={max_vocab_rows}; "
            "raise min_count to floor rare words"
        )
    # deterministic input order -> deterministic merges regardless of
    # partitioning
    counts = sorted((r.word, r.n) for r in rows)
    return bpe_train_from_counts(counts, n_merges)


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply ranked merges to one pretokenized piece (the GPT-2 bpe()
    shape): repeatedly merge the lowest-rank adjacent pair."""
    sym = list(word)
    while len(sym) > 1:
        pairs = [(ranks.get((a, b)), i) for i, (a, b) in enumerate(zip(sym, sym[1:]))]
        ranked = [(r, i) for r, i in pairs if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        sym[i : i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list. Arrow-batched
    ``mapInPandas`` with a per-word memo (Zipf: the same words repeat,
    so most pieces hit the memo); the merge table ships once per task
    via closure serialization, never a join. Output:
    (doc_id, pieces array<string>, n_tokens) — concatenating ``pieces``
    restores the pretokenized text exactly (BPE merges never cross
    piece boundaries)."""
    ranks = {p: i for i, p in enumerate(merges)}
    pattern = BPE_PRETOKEN_RE

    def run(iterator):
        import pandas as pd
        import regex  # stdlib `re` has no \p{L}/\p{N}; `regex` matches
        # the Java-regex pretokenization Spark-side counting uses

        rx = regex.compile(pattern)
        memo: dict[str, list[str]] = {}

        def encode(text):
            out = []
            for piece in rx.findall(text or ""):
                if not piece.strip():
                    continue
                got = memo.get(piece)
                if got is None:
                    got = bpe_encode_word(piece, ranks)
                    memo[piece] = got
                out.extend(got)
            return out

        for pdf in iterator:
            toks = pdf["text"].map(encode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pieces": toks,
                    "n_tokens": toks.map(len).astype("int64"),
                }
            )

    src = docs.select("doc_id", F.col(text_col).alias("text"))
    return src.mapInPandas(
        run, "doc_id long, pieces array<string>, n_tokens long"
    )


def chunk_sequences(
    tokenized: DataFrame,
    seq_len: int = 128,
    strata: tuple[str, ...] = (),
    eos: str = "<|eos|>",
    shard_tokens: int = 1_000_000,
    id_col: str = "doc_id",
    drop_last: bool = True,
    with_bounds: bool = False,
) -> DataFrame:
    """The last mile of pretraining data prep: lay the tokenized
    corpus end-to-end (an ``eos`` piece after every document) and cut
    it into FIXED-LENGTH training sequences that cross document
    boundaries — the standard packed-sequence layout (GPT-style
    concat-and-chunk).

    Input is the output of :func:`bpe_apply` (``id, pieces``) plus any
    stratum columns. Layout order is the deterministic md5 shuffle
    within each stratum — the same engine-portable order the sampling
    family uses, so reruns and engines agree byte-for-byte.

    Scale shape: documents are first assigned to bounded SHARDS of
    ~``shard_tokens`` tokens (one window-ranked pass — the
    :func:`~mod_reservoir_spark.pipeline.sampling.pack_shards` shape,
    computed here on the +1-per-doc eos-inclusive count); each shard
    then chunks independently inside ``applyInPandas`` — per-task
    memory is bounded by the shard size, sequences never cross shard
    boundaries, and every task emits its chunk ids from the shard's
    own token offsets with no coordination. A shard's trailing partial
    sequence is dropped when ``drop_last`` (the usual training choice)
    — at most seq_len-1 tokens per shard, never silently padded.

    Output: (strata…, shard_id, seq_id, tokens array<string>) with
    len(tokens) == seq_len exactly.

    ``with_bounds`` adds ``seg_lens array<long>`` — the lengths of
    the maximal same-document runs inside each sequence (each
    document's segment includes its eos; a document cut by a sequence
    boundary contributes a partial segment on each side). Segment
    lengths always sum to seq_len. This is the metadata a trainer
    needs to build block-diagonal attention masks / per-document
    position ids for packed sequences instead of letting attention
    bleed across concatenated documents — kept optional so the
    bounds-free contract schema is unchanged.
    """
    from pyspark.sql import Window

    from mod_reservoir_spark.pipeline.sampling import _shuffle_key

    strata = tuple(strata)
    # +1: the eos piece; size(NULL) is NULL (not -1) under the default
    # conf, so coalesce NULL-pieces rows to 0 tokens — otherwise they
    # get a NULL shard_id and form their own group
    n_tok = F.coalesce(F.size("pieces") + 1, F.lit(0)).cast("long")
    if strata:
        w = (
            Window.partitionBy(*strata)
            .orderBy(_shuffle_key(id_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        with_shard = tokenized.select(
            id_col,
            *strata,
            "pieces",
            _shuffle_key(id_col).alias("_ord"),
            (F.sum(n_tok).over(w) - n_tok).alias("_before"),
        )
    else:
        # unstratified: a bare Window.orderBy would shuffle the WHOLE
        # corpus — pieces arrays included — into one partition (the
        # ADVICE r4 finding). Two-level prefix sum instead: range-
        # partition a NARROW (id, ord, count) projection, local cumsum
        # per partition, broadcast the per-partition prefix (one tiny
        # driver collect bounded by the partition count), then join
        # the offsets back. Same total order (md5 shuffle key), so the
        # output is byte-identical to the windowed formulation.
        narrow = tokenized.select(
            id_col,
            _shuffle_key(id_col).alias("_ord"),
            n_tok.alias("_n"),
        )
        part = (
            narrow.repartitionByRange(F.col("_ord"))
            .withColumn("_pid", F.spark_partition_id())
            # persist: _pid must be identical in the totals action and
            # the cumsum plan (repartitionByRange re-SAMPLES
            # boundaries per job without it)
            .persist()
        )
        totals = part.groupBy("_pid").agg(F.sum("_n").alias("_tot")).collect()
        acc = 0
        prefix: dict[int, int] = {}
        for r in sorted(totals, key=lambda r: r._pid):
            prefix[r._pid] = acc
            acc += r._tot
        pmap = F.create_map(
            *[F.lit(x) for kv in prefix.items() for x in kv]
        ) if prefix else F.create_map()
        lw = (
            Window.partitionBy("_pid")
            .orderBy("_ord")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        offsets = part.select(
            id_col,
            "_ord",
            (
                F.sum("_n").over(lw)
                - F.col("_n")
                + F.coalesce(pmap[F.col("_pid")], F.lit(0))
            ).alias("_before"),
        )
        # materialize the NARROW offsets (id, ord, before — no text)
        # eagerly, then release the cached projection: without this a
        # long-lived session leaks one cached frame per call (ADVICE
        # r5). _pid stability is preserved because offsets no longer
        # recomputes through the repartition after the checkpoint.
        offsets = offsets.localCheckpoint(eager=True)
        part.unpersist()
        with_shard = tokenized.select(id_col, "pieces").join(
            offsets, id_col
        )
    with_shard = with_shard.withColumn(
        "shard_id",
        F.expr(f"_before div {int(shard_tokens)}").cast("long"),
    )

    in_types = {f.name: f.dataType.simpleString() for f in tokenized.schema}
    out_schema = ", ".join(
        [*(f"{s} {in_types[s]}" for s in strata),
         "shard_id long", "seq_id long", "tokens array<string>",
         *(["seg_lens array<long>"] if with_bounds else [])]
    )

    def chunk(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values("_ord")
        stream: list[str] = []
        owners: list[int] = []
        for j, pieces in enumerate(pdf["pieces"]):
            if pieces is None:
                # NULL pieces (outer joins, parquet round-trips): the
                # Spark-side count gave it 0 tokens, so contributing
                # nothing — not even an eos — keeps the two in step
                continue
            stream.extend(pieces)
            stream.append(eos)
            if with_bounds:
                owners.extend([j] * (len(pieces) + 1))
        rows = []
        bounds = []
        n_full = len(stream) // seq_len

        def seg_lens(own):
            out, run = [], 0
            for a, b in zip(own, own[1:]):
                run += 1
                if a != b:
                    out.append(run)
                    run = 0
            out.append(run + 1)
            return out

        for i in range(n_full):
            rows.append(stream[i * seq_len : (i + 1) * seq_len])
            if with_bounds:
                bounds.append(
                    seg_lens(owners[i * seq_len : (i + 1) * seq_len])
                )
        if not drop_last and len(stream) % seq_len:
            rows.append(stream[n_full * seq_len :])
            if with_bounds:
                bounds.append(seg_lens(owners[n_full * seq_len :]))
        return pd.DataFrame(
            {
                **{s: [key[j]] * len(rows) for j, s in enumerate(strata)},
                "shard_id": [key[len(strata)]] * len(rows),
                "seq_id": list(range(len(rows))),
                # explicit object dtype: a zero-row group would infer
                # float64, which Arrow cannot convert to list<string>
                "tokens": pd.Series(rows, dtype=object),
                **(
                    {"seg_lens": pd.Series(bounds, dtype=object)}
                    if with_bounds
                    else {}
                ),
            }
        )

    return with_shard.groupBy(*strata, "shard_id").applyInPandas(
        chunk, out_schema
    )
