"""One-shot revalidation campaign for when the axon relay comes back after
an outage (or a new chip/jaxlib appears).  Runs, in order:

  1. a 90 s device probe (the relay hangs forever when down -- never call
     jax.devices() without a subprocess timeout, see memory/axon notes);
  2. the SASPA_PALLAS_GEGLU interleaved A/B (kernel defaults are only valid
     per-hardware/jaxlib -- the r4 GN flip proved a default can invert when
     the compiler moves; per-family ledgers live in docs/perf_roadmap.md);
  3. the headline bench (bench.py) with the GEGLU knob set to whichever arm
     won, so the printed img/s reflects the best known configuration;
  4. backbone benches for the other two recipe backbones.

Everything is appended as JSON lines to chip_session_results.jsonl so a
dropped relay mid-campaign loses nothing.  Each stage is its own
subprocess: a wedged relay kills one stage, not the campaign.

Usage:  python -m tools.chip_session [--rounds 6] [--skip-backbones]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "chip_session_results.jsonl")


def log(stage: str, payload: dict) -> None:
    rec = {"t": time.time(), "stage": stage, **payload}
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"[chip_session] {stage}: {json.dumps(payload)}", flush=True)


def run(cmd: list[str], timeout: int, env: dict | None = None) -> subprocess.CompletedProcess:
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run(
        cmd, cwd=REPO, env=e, timeout=timeout, capture_output=True, text=True
    )


def probe(timeout_s: int = 90) -> bool:
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; d=jax.devices(); print(d[0].platform, len(d))"],
            cwd=REPO, capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        log("probe", {"ok": False, "reason": "timeout"})
        return False
    ok = p.returncode == 0 and ("tpu" in p.stdout.lower() or "axon" in p.stdout.lower())
    log("probe", {"ok": ok, "stdout": p.stdout.strip(), "stderr": p.stderr.strip()[-300:]})
    return ok


def last_json_line(text: str) -> dict | None:
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--skip-backbones", action="store_true")
    args = ap.parse_args()

    if not probe():
        print("relay down; nothing run", flush=True)
        return 1

    # -- stage 2: the pending GEGLU A/B ----------------------------------
    geglu_win = False
    try:
        p = run([sys.executable, "-m", "tools.ab_interleave",
                 "SASPA_PALLAS_GEGLU", "", "1", "--rounds", str(args.rounds)],
                timeout=3600)
        res = last_json_line(p.stdout)
        if res:
            a, b = res["A"]["median_s"], res["B"]["median_s"]
            geglu_win = b < a * 0.997  # require a >0.3% win to flip a default
            log("geglu_ab", {"result": res, "win": geglu_win})
        else:
            log("geglu_ab", {"error": (p.stderr or p.stdout)[-800:]})
    except subprocess.TimeoutExpired:
        log("geglu_ab", {"error": "timeout"})

    # -- stage 3: headline bench with the winning knob --------------------
    env = {"SASPA_PALLAS_GEGLU": "1"} if geglu_win else {}
    try:
        p = run([sys.executable, "bench.py"], timeout=2400, env=env)
        res = last_json_line(p.stdout)
        log("bench", {"env": env, "result": res,
                      **({} if res else {"error": (p.stderr or p.stdout)[-800:]})})
    except subprocess.TimeoutExpired:
        log("bench", {"error": "timeout"})

    # -- stage 4: other backbones -----------------------------------------
    if not args.skip_backbones:
        for backbone in ("blip_diffusion", "sdxl-turbo"):
            try:
                p = run([sys.executable, "-m", "tools.backbone_bench",
                         backbone], timeout=3600, env=env)
                log("backbone", {"backbone": backbone,
                                 "result": last_json_line(p.stdout),
                                 "tail": p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "",
                                 **({} if p.returncode == 0 else
                                    {"error": (p.stderr or p.stdout)[-500:]})})
            except subprocess.TimeoutExpired:
                log("backbone", {"backbone": backbone, "error": "timeout"})

    print("chip session complete; results in chip_session_results.jsonl", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
