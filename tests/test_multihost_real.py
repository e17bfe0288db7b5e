"""REAL two-process multi-host tests (no mocks).

Spawns subprocess "hosts" that form an actual jax.distributed CPU cluster
(coordination service + Gloo collectives), share one dataset root, and run
the full `run_generation_and_filter` path concurrently.  This exercises what
tests/test_multihost.py cannot: the real `multihost_utils.sync_global_devices`
barrier in `_host_barrier`, real process indices reaching `_shard_for_host`,
and the single-writer aug-JSON guard under true process concurrency.

The scaled test adds what a pod actually sees: a worklist whose size does not
divide (hosts x batch) — uneven shard tails + padded final batches — and a
mid-run preemption (both hosts hard-killed at different instants) followed by
a fresh cluster that resumes by filename and must produce a byte-identical
union vs a single-host run, with the aug-JSON written exactly once.

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


def _make_dataset(tmp_path: Path, n_images: int, seed: int = 0) -> Path:
    images = tmp_path / "ds" / "images"
    images.mkdir(parents=True)
    rng = np.random.RandomState(seed)
    for i in range(n_images):
        Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8)).save(
            images / f"{2000000 + i}.jpg"
        )
    return images


def _worker_env(extra=None) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # one local device per "host" (the suite's 8-device XLA_FLAGS would give
    # each worker 8; the point here is the 2-process seam, not local DP).
    # Keep the Gloo collective timeout high: generation phases are
    # unsynchronized and compile skew can reach minutes cold (ADVICE r4).
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    if not any("xla_cpu_collective_timeout_seconds" in f for f in flags):
        flags.append("--xla_cpu_collective_timeout_seconds=900")
    env["XLA_FLAGS"] = " ".join(flags)
    if extra:
        env.update(extra)
    return env


def _run_cluster(tmp_path, tag, per_worker_env, timeout=780, n_procs=2):
    """Launch one n-process cluster; returns (returncodes, outputs).

    Worker stdout/stderr goes to files (a blocked PIPE can deadlock two
    workers meeting at a shared barrier; files also survive a kill)."""
    coordinator = f"127.0.0.1:{_free_port()}"
    logs, procs = [], []
    for pid in range(n_procs):
        log = tmp_path / f"worker_{tag}_{pid}.log"
        logs.append(log)
        env = _worker_env(per_worker_env[pid])
        env["SASPA_TEST_NPROC"] = str(n_procs)
        with open(log, "w") as fh:
            procs.append(subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
                 coordinator, str(pid), str(tmp_path)],
                cwd=REPO, env=env,
                stdout=fh, stderr=subprocess.STDOUT, text=True,
            ))
    try:
        for p in procs:
            p.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        for p in procs:
            p.wait()
        pytest.fail(
            f"multihost workers [{tag}] timed out (barrier deadlock?):\n"
            + "\n---\n".join(log.read_text()[-4000:] for log in logs)
        )
    return [p.returncode for p in procs], [log.read_text() for log in logs]


def _generated_pngs(folder: Path):
    return sorted(
        p for p in folder.glob("*.png")
        if "_source" not in p.name and "_control" not in p.name
        and "_subject" not in p.name
    )


def test_real_two_process_generation_and_filter(tmp_path):
    _make_dataset(tmp_path, 3)

    rcs, outs = _run_cluster(tmp_path, "small", {0: {}, 1: {}})
    for pid, (rc, out) in enumerate(zip(rcs, outs)):
        assert rc == 0, f"worker {pid} failed:\n{out[-4000:]}"

    results = [
        json.loads((tmp_path / f"result_{pid}.json").read_text()) for pid in (0, 1)
    ]
    # all hosts agree on the artifact path; it exists exactly once, complete
    assert results[0]["json_path"] == results[1]["json_path"]
    aug = json.loads(Path(results[0]["json_path"]).read_text())
    assert len(aug) == 3 and all(len(v) == 2 for v in aug.values())

    # full coverage on the shared filesystem: 3 images x num_per_image 2
    # generated, plus one _source.png per original (driver writes both —
    # count them separately, the aug-JSON matcher excludes side files)
    folder = Path(results[0]["json_path"]).parent / "images"
    assert folder.is_dir(), folder
    assert len(_generated_pngs(folder)) == 6
    assert len(list(folder.glob("*_source.png"))) == 3


@pytest.mark.slow
def test_scaled_preemption_resume_matches_single_host(tmp_path):
    """>=50 images, uneven tails, mid-run kill of BOTH hosts at different
    instants, fresh-cluster resume; union must be byte-identical to a
    single-host run and the aug-JSON written exactly once."""
    n_images = 51  # x2 augs = 102 items; 51/host; batch 4 -> 13th batch is a
    # 3-real-item padded tail on each host
    _make_dataset(tmp_path, n_images)
    cfg_json = json.dumps({"batch_size": 4})
    base = {"SASPA_TEST_CFG_JSON": cfg_json}

    # --- attempt 1: the whole job is preempted mid-run, hosts at different
    # progress points (worker 1 dies after 3 batches, worker 0 after 8).
    # The first os._exit(7) makes the survivor's coordination agent
    # abort-terminate on coordinator/peer loss — also a nonzero death, which
    # is exactly how a real preemption tears a pod job down.
    rcs, outs = _run_cluster(
        tmp_path, "preempt",
        {0: {**base, "SASPA_TEST_DIE_AFTER_BATCHES": "8"},
         1: {**base, "SASPA_TEST_DIE_AFTER_BATCHES": "3"}},
    )
    assert all(rc != 0 for rc in rcs), (rcs, outs[0][-2000:], outs[1][-2000:])
    assert 7 in rcs, (rcs, outs[0][-2000:], outs[1][-2000:])
    assert not (tmp_path / "result_0.json").exists()
    assert not (tmp_path / "result_1.json").exists()

    # partial progress is on disk: some generated files, but not all 102
    roots = list((tmp_path / "ds").glob("aug_data/**/images"))
    assert len(roots) == 1, roots
    folder = roots[0]
    partial = _generated_pngs(folder)
    assert 0 < len(partial) < 2 * n_images, len(partial)

    # --- attempt 2: fresh cluster over the same root resumes by filename
    rcs, outs = _run_cluster(tmp_path, "resume", {0: base, 1: base})
    for pid, (rc, out) in enumerate(zip(rcs, outs)):
        assert rc == 0, f"resume worker {pid} failed:\n{out[-4000:]}"
    results = [
        json.loads((tmp_path / f"result_{pid}.json").read_text()) for pid in (0, 1)
    ]
    assert results[0]["json_path"] == results[1]["json_path"]
    aug = json.loads(Path(results[0]["json_path"]).read_text())
    assert len(aug) == n_images and all(len(v) == 2 for v in aug.values())
    two_host = {p.name: p.read_bytes() for p in _generated_pngs(folder)}
    assert len(two_host) == 2 * n_images

    # --- single-host oracle over an identical dataset copy, as a 1-process
    # worker subprocess: the SAME XLA config (1 local device, same thread
    # pools) as the cluster workers, so the comparison is byte-exact — the
    # pytest process's 8-virtual-device setup compiles different reduction
    # partitionings and is NOT bitwise comparable
    solo_root = tmp_path / "solo"
    solo_images = solo_root / "ds" / "images"
    solo_images.mkdir(parents=True)
    for p in (tmp_path / "ds" / "images").glob("*.jpg"):
        (solo_images / p.name).write_bytes(p.read_bytes())
    rcs, outs = _run_cluster(solo_root, "solo", {0: base}, n_procs=1)
    assert rcs == [0], outs[0][-4000:]
    solo_folders = list((solo_root / "ds").glob("aug_data/**/images"))
    assert len(solo_folders) == 1
    solo = {p.name: p.read_bytes() for p in _generated_pngs(solo_folders[0])}

    assert set(two_host) == set(solo)
    mismatched = [n for n in solo if two_host[n] != solo[n]]
    assert not mismatched, f"{len(mismatched)} files differ, e.g. {mismatched[:3]}"
