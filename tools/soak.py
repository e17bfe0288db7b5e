"""Sustained-throughput soak: the production `cli gen` loop at job scale.

bench.py times a handful of 8-image fused programs; the real FGVC-Aircraft
job is 13,334 images over ~2 h/chip (run_aug/run_aug.py:357-505 is the loop
this replaces).  This tool holds the REAL generation driver — worklist scan,
host JPEG decode, dispatch pipeline, device fetch through the axon relay,
PNG encode, resume bookkeeping — at steady state for >=1,000 augmentations
and reports:

  * steady_img_per_s  — compile-free rate (from the driver's telemetry line,
                        which excludes the compile-laden first batch)
  * program-level comparison — steady state must be >= --min-frac (default
                        0.95) of a supplied or measured program-level rate
  * host-overhead breakdown — worklist / decode / dispatch / fetch / PNG
                        seconds (the driver's telemetry; fetch+PNG overlap
                        device compute by design, so they only matter if
                        they exceed the device-time budget)

    python -m tools.soak [--images 550] [--num_per_image 2] [--program-rate R]

Prints ONE JSON line.  Used by bench.py (BENCH_SOAK=1) for the `sustained`
field with a smaller default image count.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def run_soak(n_images: int, num_per_image: int = 2, batch_size: int = 8,
             root: str = "/tmp/saspa_soak", keep: bool = False) -> dict:
    """Build a synthetic planes tree with n_images train images and run the
    REAL CLI generation over it; returns the parsed telemetry dict."""
    import shutil

    from tools.e2e_chip_drill import build_tree

    root_p = Path(root)
    build_tree(root_p, n_images)
    env = dict(os.environ, SASPA_DATA_ROOT=str(root_p))
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "saspa_tpu.cli", "gen", "--dataset", "planes",
         "--num_per_image", str(num_per_image), "--seed", "1",
         "--batch_size", str(batch_size), "--skip_filter"],
        cwd=str(REPO), env=env, text=True, capture_output=True,
    )
    wall = time.perf_counter() - t0
    log = r.stdout + r.stderr
    if r.returncode != 0:
        sys.stderr.write(log[-8000:] + "\n")
        raise SystemExit(f"cli gen failed (rc={r.returncode})")
    m = re.search(r"generation telemetry: (\{.*\})", log)
    if not m:
        raise SystemExit("driver telemetry line not found in CLI output")
    tele = json.loads(m.group(1))
    tele["cli_wall_s"] = round(wall, 2)
    tele["n_augs_expected"] = n_images * num_per_image
    if not keep:
        shutil.rmtree(root_p, ignore_errors=True)
    return tele


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=550,
                    help="train images; augs = 2x this (default >=1,000 augs)")
    ap.add_argument("--num_per_image", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--root", default="/tmp/saspa_soak")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--program-rate", type=float, default=None,
                    help="program-level img/s to compare against (bench.py's number)")
    ap.add_argument("--min-frac", type=float, default=0.95)
    args = ap.parse_args()

    tele = run_soak(args.images, args.num_per_image, args.batch_size,
                    root=args.root, keep=args.keep)
    result = dict(tele)
    if args.program_rate:
        frac = tele.get("steady_img_per_s", 0.0) / args.program_rate
        result["vs_program_rate"] = round(frac, 4)
        result["ok"] = frac >= args.min_frac
    print(json.dumps(result))


if __name__ == "__main__":
    main()
