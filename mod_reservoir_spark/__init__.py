"""mod_reservoir_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of folio-org/mod-reservoir.

The reference (studied read-only at /root/reference) is a metadata
clustering storage service: multi-format bibliographic ingest, pluggable
match-key extraction, incremental connected-component clustering, CQL
filtered retrieval, and OAI-PMH incremental export. This package
re-expresses those capabilities Spark-first: everything is a DataFrame
transformation planned by Catalyst; custom logic lives above the
DataFrame API (no custom Catalyst rules needed — see SURVEY.md §4).

Layout:
    core/       canonical table schemas + storage (parquet warehouse)
    plans/      CQL subset compiler → Spark Column predicates
    operators/  clustering (connected components), cluster assembly,
                stats, export
    functions/  scalar function suite (MARC access, goldrush matchkey,
                jsonpath subset, xml utils)
    sources/    ISO2709 / MARCXML / JSON-array readers
    streaming/  incremental ingest + OAI-PMH harvest client
    pipeline/   large-scale training-data ops (dedup, similarity,
                text analysis, multimodal plumbing)
"""

__version__ = "0.1.0"
