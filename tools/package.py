"""Build searchengine_spark.zip for spark-submit --py-files.

Usage:
  python tools/package.py [out.zip]
  spark-submit --py-files searchengine_spark.zip --master ... \
      -m searchengine_spark.cli build --input ... --index-dir ...
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path


def main() -> None:
    root = Path(__file__).resolve().parent.parent
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else root / "searchengine_spark.zip"
    pkg = root / "searchengine_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*")):
            if p.suffix in {".pyc"} or "__pycache__" in p.parts:
                continue
            if p.is_file():
                z.write(p, p.relative_to(root))
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
