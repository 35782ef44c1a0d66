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
        "curate_funnel", "line_dedup", "span_stats", "ngram_counts",
        "tfidf_top_terms", "unigram_logprob", "bloom_registers",
        "mixture_sample", "split_assign", "dsir_weights", "chunk_text",
        "perplexity_buckets", "near_contamination",
        # round 6
        "hybrid_search", "lsh_topk_quantized", "bm25_indexed",
        "semantic_dedup", "remove_duplicate_spans", "normalize_text",
        "domain_quality", "leakage_safe_split", "logreg_train",
        "extract_html",
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
