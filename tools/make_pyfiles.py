"""Package the engine for spark-submit --py-files deployment (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

    python tools/make_pyfiles.py [out.zip]      # default dist/dqcs.zip
    spark-submit --py-files dist/dqcs.zip \
        doc_quality_check_spark/suite/job.py <clips_table_or_path> <out_dir>
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "dqcs.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "doc_quality_check_spark")
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(dirpath, f)
                zf.write(full, os.path.relpath(full, REPO))
                n += 1
    print(f"{out}: {n} modules")


if __name__ == "__main__":
    main()
