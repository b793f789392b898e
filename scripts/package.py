#!/usr/bin/env python3
"""Build dist/engine.zip for ``spark-submit --py-files`` deployment.

The zip contains the ``docling_service_spark`` package only (pure Python, no
binary deps beyond pyspark/pyarrow which the cluster provides), so

    spark-submit --py-files dist/engine.zip job.py ...

works on executors with no repo checkout (north_rule packaging).
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "engine.zip"
    out.parent.mkdir(exist_ok=True)
    pkg = REPO / "docling_service_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
        # Package DATA files (the q60 golden parquet): shipped so an
        # unzip-to-disk deployment has the complete package.  NOTE the q60
        # oracle resolves the golden via __file__, so oracle_sql() consumers
        # must run from a real checkout or an EXTRACTED zip — DuckDB cannot
        # read parquet from inside a zip import (executors never need it;
        # only the driver-side oracle harness does).
        for data in sorted(pkg.rglob("*.parquet")):
            zf.write(data, data.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build())
