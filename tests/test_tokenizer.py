"""BPE training/apply: merges equal an independent naive reference,
are partitioning-invariant, and applying them reconstructs the
pretokenized text exactly."""

from collections import Counter

import pytest

from mod_reservoir_spark.pipeline.tokenizer import (
    bpe_apply,
    bpe_train,
    bpe_train_from_counts,
    bpe_word_counts,
    chunk_sequences,
)


def _naive_bpe(counts, n_merges):
    """Recount-from-scratch reference (no incremental index)."""
    words = {tuple(w): n for w, n in counts}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, n in words.items():
            for p in zip(w, w[1:]):
                pc[p] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 2:
            break
        merges.append(best)
        joined = best[0] + best[1]
        new_words = {}
        for w, n in words.items():
            out, j = [], 0
            while j < len(w):
                if j < len(w) - 1 and (w[j], w[j + 1]) == best:
                    out.append(joined)
                    j += 2
                else:
                    out.append(w[j])
                    j += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


def test_bpe_train_matches_naive_reference():
    counts = sorted(
        [
            ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
            ("low!", 1), ("the", 50), ("then", 8), ("them", 7),
        ]
    )
    assert bpe_train_from_counts(counts, 20) == _naive_bpe(counts, 20)


def test_bpe_train_matches_naive_on_real_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc = sorted(
        (r.word, r.n) for r in bpe_word_counts(docs, min_count=2).collect()
    )
    got = bpe_train_from_counts(list(wc), 60)
    assert got == _naive_bpe(list(wc), 60)
    assert len(got) == 60


def test_bpe_train_partitioning_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m1 = bpe_train(docs, n_merges=30)
    m2 = bpe_train(docs.repartition(13), n_merges=30)
    assert m1 == m2
    # maintained-counts form equals the from-docs form
    m3 = bpe_train(
        docs, n_merges=30, word_counts=bpe_word_counts(docs, min_count=2)
    )
    assert m1 == m3


def test_bpe_apply_roundtrip_and_compression(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(100)
    merges = bpe_train(docs, n_merges=80)
    out0 = {r.doc_id: r for r in bpe_apply(docs, []).collect()}
    out1 = {r.doc_id: r for r in bpe_apply(docs, merges).collect()}
    import regex

    from mod_reservoir_spark.pipeline.text import BPE_PRETOKEN_RE

    rx = regex.compile(BPE_PRETOKEN_RE)
    for r in docs.select("doc_id", "text").collect():
        want = "".join(
            p for p in rx.findall(r.text or "") if p.strip()
        )
        assert "".join(out1[r.doc_id].pieces) == want  # lossless
        # merges only ever reduce the token count; with 0 merges the
        # count is the character count of the pieces
        assert out1[r.doc_id].n_tokens <= out0[r.doc_id].n_tokens
        assert out0[r.doc_id].n_tokens == len(want)
    assert sum(r.n_tokens for r in out1.values()) < sum(
        r.n_tokens for r in out0.values()
    )


def test_bpe_train_vocab_cap():
    import pyspark.sql  # noqa: F401

    from mod_reservoir_spark.session import get_spark

    spark = get_spark()
    docs = spark.createDataFrame(
        [(i, f"unique{i} tok{i}") for i in range(50)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_train(docs, n_merges=5, min_count=1, max_vocab_rows=10)


def test_chunk_sequences_matches_reference(spark):
    """Packed fixed-length sequences equal an independent Python
    layout: md5 order within stratum, eos after every doc, seq_len
    windows, trailing partial dropped."""
    import hashlib

    from mod_reservoir_spark.pipeline.tokenizer import (
        bpe_apply,
        chunk_sequences,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang", "text")
    tokenized = bpe_apply(docs, []).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    got = {}
    out = chunk_sequences(
        tokenized, seq_len=64, strata=("lang",), shard_tokens=3000
    )
    for r in out.collect():
        got[(r.lang, r.shard_id, r.seq_id)] = list(r.tokens)
        assert len(r.tokens) == 64

    rows = [
        (r.doc_id, r.lang, list(r.pieces))
        for r in tokenized.select("doc_id", "lang", "pieces").collect()
    ]
    by_lang = {}
    for did, lang, pieces in rows:
        by_lang.setdefault(lang, []).append((did, pieces))
    want = {}
    for lang, items in by_lang.items():
        items.sort(key=lambda t: hashlib.md5(str(t[0]).encode()).hexdigest())
        # shard assignment by cumulative (len+1) BEFORE each doc
        before = 0
        shards = {}
        for did, pieces in items:
            sid = before // 3000
            shards.setdefault(sid, []).extend(pieces + ["<|eos|>"])
            before += len(pieces) + 1
        for sid, stream in shards.items():
            for i in range(len(stream) // 64):
                want[(lang, sid, i)] = stream[i * 64 : (i + 1) * 64]
    assert got == want
    assert len(got) > 5


def test_chunk_sequences_null_pieces_and_typed_strata(spark):
    """NULL pieces rows contribute nothing (matching the Spark-side
    0-token count) instead of crashing, and non-string stratum columns
    keep their type in the output schema."""
    from mod_reservoir_spark.pipeline.tokenizer import chunk_sequences

    tok = spark.createDataFrame(
        [
            (1, 7, ["a", "b", "c"]),
            (2, 7, None),
            (3, 7, ["d", "e", "f", "g"]),
        ],
        "doc_id long, src long, pieces array<string>",
    )
    out = chunk_sequences(tok, seq_len=3, strata=("src",), drop_last=False)
    rows = out.collect()
    assert dict(out.dtypes)["src"] == "bigint"
    stream = [t for r in sorted(rows, key=lambda r: r.seq_id) for t in r.tokens]
    assert stream.count("<|eos|>") == 2  # one per non-null doc
    assert all(r.src == 7 for r in rows)


def test_chunk_sequences_seg_lens_bounds(spark):
    """with_bounds=True emits per-sequence document segment lengths
    (the block-diagonal attention-mask metadata): each sequence's
    seg_lens sums to seq_len, and replaying the segments over the
    shard stream reconstructs every document's (tokens + eos) length
    — verified against an independent Python layout of the same md5
    order."""
    import hashlib

    rows = [(i, [f"t{i}_{k}" for k in range(3 + i % 5)]) for i in range(40)]
    tokenized = spark.createDataFrame(
        rows, "doc_id long, pieces array<string>"
    )
    out = chunk_sequences(
        tokenized, seq_len=8, shard_tokens=50, with_bounds=True
    ).collect()
    assert out, "no sequences produced"
    for r in out:
        assert sum(r.seg_lens) == 8 == len(r.tokens)
        assert all(x > 0 for x in r.seg_lens)
        # eos tokens inside the sequence close segments: every
        # non-final segment must end on an eos token
        pos = 0
        for seg in r.seg_lens[:-1]:
            pos += seg
            assert r.tokens[pos - 1] == "<|eos|>"

    # independent layout: same md5 order, same shard cut
    order = sorted(rows, key=lambda t: hashlib.md5(str(t[0]).encode()).hexdigest())
    before = 0
    shards: dict[int, list[int]] = {}
    for doc_id, pieces in order:
        n = len(pieces) + 1
        shards.setdefault(before // 50, []).append(n)
        before += n
    for shard_id, doc_lens in shards.items():
        stream_len = sum(doc_lens)
        want_seqs = stream_len // 8
        got = [r for r in out if r.shard_id == shard_id]
        assert len(got) == want_seqs
        # concatenated seg_lens of the shard's sequences must be a
        # prefix-refinement of doc_lens: merging runs that do NOT end
        # at a doc boundary reconstructs the doc lengths (truncated
        # by the dropped partial tail)
        flat = [x for r in sorted(got, key=lambda r: r.seq_id)
                for x in r.seg_lens]
        merged, acc = [], 0
        bounds_at = set()
        t = 0
        for n in doc_lens:
            t += n
            bounds_at.add(t)
        pos = 0
        for x in flat:
            acc += x
            pos += x
            if pos in bounds_at:
                merged.append(acc)
                acc = 0
        prefix = []
        t = 0
        for n in doc_lens:
            t += n
            if t <= want_seqs * 8:
                prefix.append(n)
        assert merged[: len(prefix)] == prefix
