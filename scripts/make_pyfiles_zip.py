"""Build the --py-files archive for spark-submit deployment (north_rule:
'run via spark-submit --py-files on a multi-executor cluster').

    python scripts/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files geocode_spark.zip your_job.py ...

The zip contains only the package's .py files — prepared region artifacts
and fixture tables live on shared storage and are read by path.
"""

from __future__ import annotations

import os
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build(out: str | Path = "geocode_spark.zip") -> Path:
    out = Path(out)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(REPO / "geocode_spark"):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = Path(root) / f
                    z.write(p, p.relative_to(REPO))
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else "geocode_spark.zip")
    print(f"wrote {path} ({path.stat().st_size} bytes)")
