"""Regenerate the golden-training fixture (tests/fixtures/golden_train.npz).

Run via tests' environment semantics (CPU, threefry_partitionable) — see
tests/test_golden_train.py, which asserts bit-stability of 3 optimizer steps
of the full WSDAN-CAL training step (3-view loss, feature-center EMA,
torch-SGD-semantics optax chain) from a FIXED seed.  Params are derived from
the seed at test time (flax init is deterministic), so the fixture stores
only the expected per-step losses and a digest of a few parameter leaves.

Only regenerate when an INTENTIONAL numeric change lands; commit the new
fixture together with the change that explains it.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402


def run_golden():
    """Returns (losses (3,), digests dict) for the fixed tiny training run."""
    from tests.test_golden_train import golden_train_run

    return golden_train_run()


def main():
    losses, digests = run_golden()
    out = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "golden_train.npz"
    np.savez(out, losses=losses, **digests)
    print(f"wrote {out} losses={losses}")


if __name__ == "__main__":
    main()
