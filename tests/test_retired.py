"""Rows rotated out of the 50-row driver contract (round 5) keep
their oracles: every retired (query, oracle) pair is checked against
DuckDB at sf0.001 with the driver's own comparator — the VERDICT r4
rotation condition ("the retired rows keep their pytest oracles")."""

import duckdb
import pytest

import __spark_entry__ as em
from tools.oracle_check import TABLES, arrow_rows, table_hash

SF = "/root/testdata/sf0.001"

RETIRED = sorted(em.retired_queries())


def test_retired_surface_is_disjoint_and_complete():
    live = set(em.queries())
    retired = set(em.retired_queries())
    assert not (live & retired)
    assert set(em.retired_oracle_sql()) == retired
    # round-5 rotation promoted at least 8 formerly-pytest-only
    # operators; round 6 promoted 10 more — all must stay live or be
    # consciously rotated (update this set when they are)
    promoted = {
        "curate_funnel",
        # round-5 rows line_dedup/span_stats/ngram_counts/
        # tfidf_top_terms/bloom_registers/mixture_sample rotated to the
        # retired sweep in round 8 (rotation 4) after two stable rounds
        "split_assign", "dsir_weights", "chunk_text",
        "perplexity_buckets", "near_contamination",
        # round 6
        "hybrid_search", "lsh_topk_quantized", "bm25_indexed",
        "semantic_dedup", "remove_duplicate_spans", "normalize_text",
        "domain_quality", "leakage_safe_split", "logreg_train",
        "extract_html",
        # round 7 (rotation 3)
        "bm25_batch", "chunk_sequences", "bpe_train",
        "warc_roundtrip", "ivf_routed", "bm25_stream_index",
        "semantic_dedup_routed",
        # round 7 (rotation 3b: IVF-PQ)
        "pq_codes", "pq_adc_topk",
        # round 7 (late swap: strictly-stronger siblings displaced
        # unigram_logprob and near_dedup_keep to the retired sweep);
        # bigram_logprob rotated to the retired sweep in round 10
        # (rotation 6) — order-2 arithmetic stays live via
        # bigram_logprob_lang plus the exact-equality pins
        "near_dedup_quality",
        # round 7 (per-language LM row; winnow_pairs rotated out)
        "bigram_logprob_lang",
        # round 8 (rotation 4); trigram_logprob rotated to the
        # retired sweep in round 12 (rotation 8 — slot carries
        # kn_logprob)
        "ivf_pq_topk", "url_dedup",
        "lm_stream_counts",
        # round 12 (rotation 8: interpolated Kneser-Ney at the 5-gram
        # KenLM shape — VERDICT r11 Next #2)
        "kn_logprob",
        # round 9
        "ngram_logprob", "curate_stream",
        # round 10 (rotation 6: fixed-reference/OOV scoring under the
        # persisted streaming-fold model — displaced bigram_logprob)
        "lm_fixed_ref",
    }
    assert promoted <= live
    # every live query has an oracle (no silent rows-only rows)
    assert set(em.oracle_sql()) == live


@pytest.mark.parametrize("name", RETIRED)
def test_retired_oracle(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sdf = em.retired_queries()[name](spark, SF)
    scols, srows, stags = arrow_rows(sdf.toArrow())
    dcols, drows, dtags = arrow_rows(
        con.execute(em.retired_oracle_sql()[name]).arrow()
    )
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert table_hash(srows, scols, stags) == table_hash(drows, dcols, dtags)


def test_coverage_ledger_matches_pool():
    """COVERAGE.md's contract ledger must list EXACTLY the live and
    retired row sets (VERDICT r6 "Next #2": rotation must be a
    membership edit that cannot silently drift from the docs)."""
    import os
    import re

    path = os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    text = open(path, encoding="utf-8").read()
    marker = "## Contract ledger"
    assert marker in text, "COVERAGE.md lost its contract ledger section"
    section = text[text.index(marker):]
    live_part = section[section.index("### Live driver rows"):
                        section.index("### Retired rows")]
    retired_part = section[section.index("### Retired rows"):]
    live_md = set(re.findall(r"`([a-z0-9_]+)`", live_part))
    retired_md = set(re.findall(r"`([a-z0-9_]+)`", retired_part))
    assert live_md == set(em.queries())
    assert retired_md == set(em.retired_queries())
