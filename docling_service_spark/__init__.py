"""docling_service_spark — a from-scratch PySpark-native document-extraction engine.

Re-expresses the capabilities of the reference service
(``Crypto-Gi/docling-service``, a REST-wrapped per-document converter; see
``/root/reference/app/main.py``) as a batch DataFrame program over an
Iceberg-shaped table of interleaved text+media spans:

    (doc_id: string,
     spans: array<struct<kind:string, text:string, media_ref:string, offset:int32>>)

Layering (SURVEY.md §7):

- ``engine/``  — a pure, deterministic Python extraction library with zero
  Spark imports.  One document in, one extraction result out.
- ``sparkio/`` — the thin vectorized Spark shell: ``mapInArrow`` batching,
  salted repartitioning, lineage accumulation, snapshot checkpoint/resume.
- ``queries/`` — relational + training-data-pipeline operators (dedup,
  similarity search, text analysis, multimodal plumbing) exposed through
  ``__spark_entry__.queries()`` with DuckDB oracles.
"""

__version__ = "0.1.0"
