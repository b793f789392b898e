"""Spark shell around the pure extraction engine.

- ``batch``      — mapInArrow batch extractor with per-batch instrumentation
- ``pipeline``   — salted repartition + extraction + lineage derivation
- ``checkpoint`` — snapshot-manifest store: incremental runs, atomic commit,
                   idempotent resume (Iceberg-shaped; swap-in point for real
                   Iceberg when the catalog is available)
- ``session``    — SparkSession builder with scale-appropriate defaults
"""
