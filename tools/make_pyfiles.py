#!/usr/bin/env python
"""Build the --py-files zip for spark-submit deployment.

Usage: python tools/make_pyfiles.py [dist/linkgraph.zip]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def build(out: str = "dist/linkgraph.zip") -> str:
    out_path = ROOT / out
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((ROOT / "linkgraph").rglob("*.py")):
            z.write(p, p.relative_to(ROOT))
    return str(out_path)


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist/linkgraph.zip"))
