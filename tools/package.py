"""Build searchengine_spark.zip + launcher.py for spark-submit.

spark-submit has no ``-m`` module flag — it needs a script path — so
this also writes a thin ``launcher.py`` next to the zip.

Usage:
  python tools/package.py [out.zip]
  spark-submit --master ... --py-files searchengine_spark.zip \
      launcher.py build --input ... --index-dir ...
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
    launcher = out.parent / "launcher.py"
    launcher.write_text(
        "import sys\n"
        "from searchengine_spark.cli import main\n\n"
        "if __name__ == '__main__':\n"
        "    raise SystemExit(main(sys.argv[1:]))\n"
    )
    print(f"wrote {out} ({out.stat().st_size} bytes) and {launcher}")


if __name__ == "__main__":
    main()
