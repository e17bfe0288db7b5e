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
import sys
from pathlib import Path


def main() -> None:
    coordinator, pid, root = sys.argv[1], int(sys.argv[2]), Path(sys.argv[3])

    import jax

    # the axon sitecustomize overrides JAX_PLATFORMS at interpreter start;
    # the config update wins as long as no backend has been initialized yet
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert jax.devices()[0].platform == "cpu"

    from saspa_tpu.utils import enable_compilation_cache

    enable_compilation_cache(str(Path(__file__).parent / ".jax_cache"))

    import saspa_tpu.data.registry as R
    from saspa_tpu.gen.driver import run_generation_and_filter
    from tests.test_generation_driver import StubPlanesUtils, _cfg, _tiny_pipe

    R.DS_UTILS_DICT["planes"] = lambda print_func=print: StubPlanesUtils(
        root / "ds", print_func
    )

    json_path = run_generation_and_filter(
        _cfg(),
        pipe=_tiny_pipe(),
        semantic_filtering=False,
        model_confidence_based_filtering=False,
    )

    (root / f"result_{pid}.json").write_text(
        json.dumps({"pid": pid, "json_path": str(json_path)})
    )


if __name__ == "__main__":
    main()
