"""Pure, deterministic extraction library (zero Spark imports).

The Spark layer (``..sparkio``) calls :func:`extract.extract_document` on each
document inside Arrow batches; everything in this package is plain Python so
it is unit-testable without a SparkSession and reusable from any runner.
"""

from .extract import extract_document  # noqa: F401
