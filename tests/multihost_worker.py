"""Worker process for tests/test_multihost_real.py — one "host" of a real
two-process jax.distributed CPU cluster.

The mocked tests (tests/test_multihost.py) prove the sharding/partition and
single-writer semantics with patched process_index/count; this worker is the
wiring proof: a REAL coordination service, REAL `jax.process_count() == 2`,
and the REAL `multihost_utils.sync_global_devices` barrier in
`gen/driver.py::_host_barrier`, with both hosts racing over one shared
dataset root (the shared-filesystem layout of an actual TPU pod slice).

Usage: python tests/multihost_worker.py <coordinator> <pid> <shared_root>
Writes <shared_root>/result_<pid>.json on success.

Reference scale-out this automates: per-GPU manual launches + aug-JSON merge
(/root/reference/all_utils/utils.py:485-511).
"""

import json
import os
import sys
from pathlib import Path

# Gloo collectives default to a 30s timeout; the hosts' generation phases are
# unsynchronized (compile-time skew can reach minutes cold), so the first host
# to arrive at a barrier must be willing to wait for the others.  Must be in
# XLA_FLAGS before the CPU backend is created.
_TIMEOUT_FLAG = "--xla_cpu_collective_timeout_seconds=900"
if "xla_cpu_collective_timeout_seconds" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " " + _TIMEOUT_FLAG
    ).strip()


def main() -> None:
    coordinator, pid, root = sys.argv[1], int(sys.argv[2]), Path(sys.argv[3])
    num_processes = int(os.environ.get("SASPA_TEST_NPROC", "2"))

    import jax

    # the axon sitecustomize overrides JAX_PLATFORMS at interpreter start;
    # the config update wins as long as no backend has been initialized yet
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_processes, process_id=pid
    )
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.process_index() == pid
    assert jax.devices()[0].platform == "cpu"

    # Establish the Gloo context NOW, while both processes are aligned at
    # startup — the first-ever collective initializes the transport, and doing
    # it after minutes of unsynchronized compile/generation work is how the
    # 30s context-init timeout used to fire (ADVICE r4, high).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("saspa:gloo_warmup")

    from saspa_tpu.utils import enable_compilation_cache

    enable_compilation_cache(str(Path(__file__).parent / ".jax_cache"))

    import saspa_tpu.data.registry as R
    from saspa_tpu.gen.driver import run_generation_and_filter
    from tests.test_generation_driver import StubPlanesUtils, _cfg, _tiny_pipe

    R.DS_UTILS_DICT["planes"] = lambda print_func=print: StubPlanesUtils(
        root / "ds", print_func
    )

    # mid-run preemption: hard-exit after N dispatched batches, simulating a
    # host killed without cleanup (pending PNG flush lost, no barrier reached)
    die_after = int(os.environ.get("SASPA_TEST_DIE_AFTER_BATCHES", "0"))
    if die_after:
        import saspa_tpu.gen.driver as D

        orig = D._generate_chunk
        n_calls = [0]

        def _dying_generate_chunk(*a, **k):
            n_calls[0] += 1
            if n_calls[0] > die_after:
                sys.stdout.flush()
                os._exit(7)  # SIGKILL-like: no atexit, no distributed shutdown
            return orig(*a, **k)

        D._generate_chunk = _dying_generate_chunk

    cfg_overrides = json.loads(os.environ.get("SASPA_TEST_CFG_JSON", "{}"))
    json_path = run_generation_and_filter(
        _cfg(**cfg_overrides),
        pipe=_tiny_pipe(),
        semantic_filtering=False,
        model_confidence_based_filtering=False,
    )

    (root / f"result_{pid}.json").write_text(
        json.dumps({"pid": pid, "json_path": str(json_path)})
    )


if __name__ == "__main__":
    main()
