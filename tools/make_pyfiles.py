"""Build the --py-files zip for spark-submit (north_rule packaging).

    python tools/make_pyfiles.py   # -> dist/nycfd_spark.zip

Contains the ny_campaign_finance_dedupe_spark package only (pure
Python; pyspark/numpy/pandas come from the cluster runtime).
"""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "ny_campaign_finance_dedupe_spark"
OUT = ROOT / "dist" / "nycfd_spark.zip"


def main() -> None:
    OUT.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted(PKG.rglob("*.py")):
            z.write(py, py.relative_to(ROOT))
    print(OUT)


if __name__ == "__main__":
    main()
