"""Package hepcrawl_spark for spark-submit --py-files.

Writes ``dist/hepcrawl_spark.zip`` (deterministic: sorted names, zeroed
timestamps — same tree -> same bytes) and prints the submit command.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", "hepcrawl_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    src = os.path.join(ROOT, "hepcrawl_spark")
    names = []
    for dirpath, dirnames, filenames in os.walk(src):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for f in sorted(filenames):
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                names.append((full, os.path.relpath(full, ROOT)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for full, rel in names:
            zi = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(zi, fh.read())
    return out_path


def main() -> None:
    out = build_zip(sys.argv[1] if len(sys.argv) > 1 else None)
    n = len(zipfile.ZipFile(out).namelist())
    print(f"wrote {out} ({n} modules)")
    print(
        "submit: spark-submit --py-files "
        f"{out} jobs/crawl_job.py --pages <pages> --seeds <seeds> "
        "--state <state_dir> [--filter-mode bloom_table --seen-store merge]"
    )


if __name__ == "__main__":
    main()
