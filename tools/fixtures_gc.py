"""Garbage-collect generated clip fixtures under .data/ (disk hygiene).

Every fixture dir is produced by ``sources.clips.generate_clips`` behind a
``_GENERATED.json`` marker, so deleting one is always safe: the next bench /
scaling / test run regenerates it deterministically (same n_rows/seed/v key).
The heavyweight ones (clips_smoke ~16 GB, clips_scaling ~8 GB) exist only
for one-off scale evidence and should not sit on disk between runs.

Usage:
    python tools/fixtures_gc.py             # delete fixture dirs > 2 GB
    python tools/fixtures_gc.py --max-gb 0.5
    python tools/fixtures_gc.py --all       # delete every generated fixture
"""

from __future__ import annotations

import argparse
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, ".data")


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--max-gb", type=float, default=2.0,
                    help="delete generated fixture dirs larger than this")
    ap.add_argument("--all", action="store_true",
                    help="delete every generated fixture dir")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    if not os.path.isdir(DATA):
        print("no .data directory — nothing to collect")
        return
    freed = 0
    for name in sorted(os.listdir(DATA)):
        path = os.path.join(DATA, name)
        if not os.path.isdir(path):
            continue
        if not os.path.exists(os.path.join(path, "_GENERATED.json")):
            print(f"skip {name}: no _GENERATED.json marker (not ours)")
            continue
        size = dir_bytes(path)
        if args.all or size > args.max_gb * 1024**3:
            print(f"{'would delete' if args.dry_run else 'delete'} "
                  f"{name}: {size / 1024**3:.2f} GB")
            if not args.dry_run:
                shutil.rmtree(path)
            freed += size
        else:
            print(f"keep {name}: {size / 1024**3:.2f} GB")
    print(f"freed {freed / 1024**3:.2f} GB")


if __name__ == "__main__":
    main()
