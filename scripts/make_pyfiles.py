"""Build dist/libgrape_lite_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "libgrape_lite_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((REPO / "libgrape_lite_spark").rglob("*.py")):
            z.write(py, py.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
