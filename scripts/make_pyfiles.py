"""Build the ``--py-files`` artifact for spark-submit deployments.

Zips the ``cc_net_spark`` package into ``dist/cc_net_spark.zip`` (or a
given output path) with deterministic entry order and timestamps, so a
rebuilt artifact is byte-identical when the source is unchanged — the
same property the stage manifests rely on for content-addressed lineage.

Usage: python scripts/make_pyfiles.py [out.zip]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
# zip timestamps have 2-second resolution and no epoch-0; use the
# conventional fixed build stamp so rebuilds are reproducible
_STAMP = (1980, 1, 1, 0, 0, 0)


def build_zip(out: Path, package_dir: Path | None = None) -> Path:
    pkg = package_dir or (REPO / "cc_net_spark")
    out.parent.mkdir(parents=True, exist_ok=True)
    files = sorted(p for p in pkg.rglob("*.py") if "__pycache__" not in p.parts)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in files:
            arcname = str(p.relative_to(pkg.parent))
            info = zipfile.ZipInfo(arcname, date_time=_STAMP)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, p.read_bytes())
    return out


if __name__ == "__main__":
    target = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "cc_net_spark.zip"
    built = build_zip(target)
    print(built)
