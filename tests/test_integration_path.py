"""ONE test for the full advertised web-to-training path: WARC bytes
→ read_warc → extract_html_text → curate (quality/dedup/decontam) →
bpe_train/bpe_apply → chunk_sequences(with_bounds) — every stage the
engine claims composes, composed, with the stage-level guarantees
asserted end-to-end (COVERAGE.md "the full web-to-training path now
runs inside the engine" made checkable in one place)."""

import gzip

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def _warc_record(doc_id: int, html: bytes) -> bytes:
    block = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    )
    return gzip.compress(
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Record-ID: <urn:doc:{doc_id}>\r\n".encode()
        + f"WARC-Target-URI: http://ex.com/{doc_id}\r\n".encode()
        + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(block)}\r\n\r\n".encode()
        + block
        + b"\r\n\r\n"
    )


def test_web_to_training_path(spark, tmp_path):
    from mod_reservoir_spark.pipeline.curate import curate
    from mod_reservoir_spark.pipeline.html import extract_html_text
    from mod_reservoir_spark.pipeline.tokenizer import (
        bpe_apply,
        bpe_train,
        chunk_sequences,
    )
    from mod_reservoir_spark.sources.warc import read_warc

    base = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter("doc_id < 30")
        .collect()
    }
    # crawl content: each doc wrapped in a page skeleton; doc 5 gets a
    # verbatim near-copy under id 905 (near-dup), doc 7's text is the
    # "benchmark" (contamination)
    pages = dict(base)
    pages[905] = base[5] + " extra tail"
    members = []
    for doc_id in sorted(pages):
        html = (
            "<html><head><script>x()</script></head><body><h1>t</h1>"
            f"<p>{pages[doc_id]}</p>"
            '<div><a href="http://x/">more related links here now'
            "</a></div></body></html>"
        ).encode()
        members.append(_warc_record(doc_id, html))
    warc = tmp_path / "crawl.warc.gz"
    warc.write_bytes(b"".join(members))

    # 1. crawl source → HTML payloads
    recs = read_warc(spark, str(warc)).filter(
        "warc_type = 'response'"
    )
    html_docs = recs.select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.decode("payload", "utf-8").alias("text"),
    )
    assert html_docs.count() == len(pages)

    # 1b. URL-level dedup — the pass that runs BEFORE any content
    # work: the same capture re-fetched under a tracking-tagged URL
    # variant must collapse to one keeper
    from mod_reservoir_spark.pipeline.text import url_dedup

    refetch = html_docs.filter("doc_id = 3").select(
        (F.col("doc_id") + 9000).alias("doc_id"),
        F.concat(F.col("url"), F.lit("?utm_source=feed")).alias("url"),
        "text",
    )
    crawl = html_docs.unionByName(refetch)
    kept_urls = url_dedup(crawl).filter("is_kept = 1").select("doc_id")
    assert kept_urls.count() == len(pages)  # the refetch collapsed
    html_docs = crawl.join(kept_urls, "doc_id").select("doc_id", "text")

    # 2. extraction: the content paragraph survives, script and the
    # link-dense block are dropped
    extracted = extract_html_text(html_docs)
    sample = {
        r.doc_id: r.text for r in extracted.collect()
    }
    for d in (5, 905):
        assert pages[d].split()[:3] == sample[d].split()[:3]
        assert "related links" not in sample[d]

    # 3. curation with a benchmark (doc 7's text): the near-copy and
    # the contaminated doc must drop with the right attribution
    benchmark = spark.createDataFrame(
        [(0, base[7])], "doc_id long, text string"
    )
    ledger = curate(
        extracted.select("doc_id", "text"),
        benchmark=benchmark,
        near_kwargs=dict(shingle_n=2, threshold_ppm=500000),
    ).cache()
    drops = {
        r.doc_id: r.drop_stage
        for r in ledger.filter("drop_stage IS NOT NULL").collect()
    }
    assert drops.get(905) == "near_dup"
    assert drops.get(7) == "contaminated"
    survivors = ledger.filter("drop_stage IS NULL").select(
        "doc_id", "text"
    )
    n_surv = survivors.count()
    assert n_surv >= 10

    # 4. tokenizer training + application on the curated corpus
    merges = bpe_train(survivors, n_merges=20, min_count=2)
    assert merges
    tokenized = bpe_apply(survivors, merges)
    # lossless per-document: pieces concatenate back to the
    # pretokenized text (bpe_apply's documented contract)
    joined = tokenized.join(survivors, "doc_id").select(
        "doc_id", "pieces", "text"
    )
    for r in joined.collect():
        assert "".join(r.pieces).split() == r.text.split()

    # 5. packed sequences with attention-boundary metadata
    seqs = chunk_sequences(
        tokenized.select("doc_id", "pieces"),
        seq_len=32,
        shard_tokens=400,
        with_bounds=True,
    ).collect()
    assert seqs
    total_tokens = sum(
        r.n_tokens + 1 for r in tokenized.select(
            F.size("pieces").alias("n_tokens")
        ).withColumnRenamed("n_tokens", "n_tokens").collect()
    )
    packed = sum(len(r.tokens) for r in seqs)
    # drop_last discards < seq_len per shard; everything else packs
    n_shards = len({r.shard_id for r in seqs})
    assert packed <= total_tokens
    assert total_tokens - packed < 32 * (n_shards + 1)
    for r in seqs:
        assert len(r.tokens) == 32 == sum(r.seg_lens)


def test_oai_self_harvest_round_trip(spark, tmp_path):
    """The loop the reference exercises via its oaiPmhClient tests
    (MainVerticleTest.java:3475-4435), both sides OURS: warehouse A's
    clusters served by the engine's own OAI renderer (full verb
    dispatch, page limit 2 → resumption-token chain), harvested by the
    engine's own OAI client through a dict-transport fetch, re-ingested
    into warehouse B — each A-cluster becomes one B-record keyed by the
    OAI identifier — and after a second incremental pass (a tombstone
    in A → deleted cluster → deleted OAI header, from= advanced by the
    client) B's state must mirror A's live clusters exactly. Note the
    reference's own asymmetry: its CLIENT requests metadataPrefix
    marc21 (it harvests external ILSes) while its SERVER accepts only
    marcxml (OaiService.java:104) — self-harvest passes marcxml."""
    import json as _json

    from mod_reservoir_spark.core.storage import Warehouse
    from mod_reservoir_spark.operators.oai import handle_oai_request
    from mod_reservoir_spark.streaming.ingest import ingest_batch
    from mod_reservoir_spark.streaming.oai_client import (
        HarvestState,
        harvest,
    )

    wh_a = Warehouse(spark, str(tmp_path / "a"))
    wh_b = Warehouse(spark, str(tmp_path / "b"))

    def pay(cid, title):
        return _json.dumps(
            {"marc": {"leader": "00000nam a2200000 a 4500",
                      "fields": [{"001": cid},
                                 {"245": {"ind1": "0", "ind2": "0",
                                          "subfields": [{"a": title}]}}]},
             "inventory": {"title": [title]}}
        )

    cfg = {"id": "t", "method": "jsonpath",
           "params": _json.dumps({"expr": "$.inventory.title[*]"}),
           "update": "ingest"}
    schema = ("local_id string, source_id string, source_version int, "
              "payload string, delete boolean")
    # A: 4 records, two sharing a title -> 3 clusters
    ingest_batch(wh_a, spark.createDataFrame(
        [("A1", "S", 1, pay("A1", "alpha"), None),
         ("A2", "S", 1, pay("A2", "alpha"), None),
         ("A3", "S", 1, pay("A3", "beta"), None),
         ("A4", "S", 1, pay("A4", "gamma"), None)], schema), [cfg])

    def fetch(params):
        # dict transport: the serving face read FRESH per request so
        # the second pass sees A's post-tombstone state
        return handle_oai_request(
            wh_a.read("cluster_meta"),
            wh_a.read("cluster_assignments"),
            wh_a.read("global_records"),
            wh_a.read("record_match_values"),
            params,
            known_sets=["t"],
            limit=2,  # 3 clusters -> 2 pages -> token chain exercised
        ).encode()

    # B's match config keys each harvested cluster-record by its base
    # 001 (unique per cluster), so B state is one cluster per A-cluster
    cfg_b = {"id": "c", "method": "jsonpath",
             "params": _json.dumps({"expr": "$.marc.fields[*].001"}),
             "update": "ingest"}
    state = HarvestState(str(tmp_path / "state.json"))
    counters = harvest(
        spark, wh_b, [cfg_b], fetch, state, source_id="SELF",
        set_spec="t", metadata_prefix="marcxml",
    )
    assert counters["totalRequests"] == 2  # the token chain, page 2 used
    assert counters["totalRecords"] == 3

    def a_live_ids():
        # cluster_meta keeps tombstoned clusters (datestamp bump ->
        # deleted OAI header); LIVE = has an assignment to a live record
        assign = wh_a.read("cluster_assignments").filter(
            "match_key_config_id = 't'"
        )
        recs = wh_a.read("global_records").select("global_id")
        return {
            r.cluster_id
            for r in assign.join(recs, "global_id")
            .select("cluster_id").distinct().collect()
        }

    a_clusters = a_live_ids()
    b_recs = {
        r.local_id: _json.loads(r.payload)
        for r in wh_b.read("global_records").collect()
    }
    # identifiers round-trip: B holds exactly A's live clusters
    assert set(b_recs) == {f"oai:{c}" for c in a_clusters}
    # each harvested payload carries its own cluster id in the 999 $i
    # the renderer merged in
    for ident, payload in b_recs.items():
        nines = [f["999"] for f in payload["marc"]["fields"] if "999" in f]
        assert any(
            sf.get("i") == ident.removeprefix("oai:")
            for n in nines for sf in n["subfields"]
        ), ident
    # B re-clusters them 1:1
    assert wh_b.read("cluster_meta").count() == 3

    # --- incremental pass: tombstone A4 in A -> gamma cluster deleted
    import time as _time

    _time.sleep(1.1)  # datestamp granularity: the bump must be > from
    ingest_batch(wh_a, spark.createDataFrame(
        [("A4", "S", 1, None, True)], schema), [cfg])
    assert len(a_live_ids()) == 2  # gamma cluster tombstoned

    assert state.data["from"] is not None  # client advanced its window
    counters = harvest(
        spark, wh_b, [cfg_b], fetch, state, source_id="SELF",
        set_spec="t", metadata_prefix="marcxml",
    )
    # the deleted header became a tombstone in B
    assert counters["totalDeleted"] >= 1
    b_ids = {r.local_id for r in wh_b.read("global_records").collect()}
    assert b_ids == {f"oai:{c}" for c in a_live_ids()}
    assert len(b_ids) == 2
