"""Named query registry for the driver contract (``__spark_entry__``).

Each submodule exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB SQL over the pre-registered views).
Cross-engine equality discipline (driver hashes values after sorting):

- every aggregate over doubles goes through ``DECIMAL(18,2/6)`` so Spark and
  DuckDB sum the exact same values (FP sum order never matters);
- ratios/scores are returned as ``floor(x * 10^k)`` scaled integers — floor
  has no rounding-tie ambiguity across engines;
- every computed column is aliased identically in both dialects;
- counts are cast to BIGINT explicitly (DuckDB count → HUGEINT otherwise in
  some contexts; sums of ints → HUGEINT always).
"""

from __future__ import annotations

from . import ann, dedup, multimodal, relational, similarity, text_ops
from .extraction import EXTRACTION_ORACLES, EXTRACTION_QUERIES

QUERIES = {}
ORACLES = {}
for mod in (relational, text_ops, dedup, similarity, ann, multimodal):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
QUERIES.update(EXTRACTION_QUERIES)
ORACLES.update(EXTRACTION_ORACLES)
