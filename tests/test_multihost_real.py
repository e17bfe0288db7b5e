"""REAL two-process multi-host test (no mocks).

Spawns two subprocess "hosts" that form an actual jax.distributed CPU
cluster (coordination service + Gloo collectives), share one dataset root,
and run the full `run_generation_and_filter` path concurrently.  This
exercises what tests/test_multihost.py cannot: the real
`multihost_utils.sync_global_devices` barrier in `_host_barrier`, real
process indices reaching `_shard_for_host`, and the single-writer aug-JSON
guard under true process concurrency.

Reference behavior being automated: manual per-GPU launches + JSON merge
(/root/reference/all_utils/utils.py:485-511).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_real_two_process_generation_and_filter(tmp_path):
    images = tmp_path / "ds" / "images"
    images.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8)).save(
            images / f"{2000000 + i}.jpg"
        )

    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # one local device per "host" (the suite's 8-device XLA_FLAGS would give
    # each worker 8; the point here is the 2-process seam, not local DP)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
             coordinator, str(pid), str(tmp_path)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=780)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out (barrier deadlock?):\n"
                    + "\n---\n".join(o or "" for o in outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker {p.args[-2]} failed:\n{out[-4000:]}"

    results = [
        json.loads((tmp_path / f"result_{pid}.json").read_text()) for pid in (0, 1)
    ]
    # all hosts agree on the artifact path; it exists exactly once, complete
    assert results[0]["json_path"] == results[1]["json_path"]
    aug = json.loads(Path(results[0]["json_path"]).read_text())
    assert len(aug) == 3 and all(len(v) == 2 for v in aug.values())

    # full coverage on the shared filesystem: 3 images x num_per_image 2
    folder = Path(results[0]["json_path"]).parent / "images"
    if not folder.is_dir():  # layout: json sits next to the images folder
        pngs = list(tmp_path.rglob("*.png"))
    else:
        pngs = list(folder.glob("*.png"))
    assert len(pngs) == 6, sorted(p.name for p in pngs)
