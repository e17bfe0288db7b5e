from saspa_tpu.utils.config import (
    TrainConfig,
    GenerationConfig,
    FilterConfig,
    get_train_config,
    DATASETS_SUPPORTED,
)
from saspa_tpu.utils.logging_utils import init_logging
from saspa_tpu.utils import rng


def _machine_cache_key() -> str:
    """Short signature of the host the cache entries were compiled on.

    XLA's CPU backend persists AOT results specialized to the compiling
    machine's CPU features; loading them on a different host warns about
    (and risks) SIGILL.  Keying the cache directory by python/jax version +
    CPU model/flags makes a moved checkout simply re-warm instead."""
    import hashlib
    import platform

    sig = [platform.machine(), platform.python_version()]
    try:
        import jax

        sig.append(jax.__version__)
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            seen = set()
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("model name", "flags") and key not in seen:
                    seen.add(key)
                    sig.append(line.strip())
                if len(seen) == 2:
                    break
    except OSError:
        pass
    return hashlib.sha1("|".join(sig).encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | None = None):
    """Persistent XLA compilation cache — the scanned 30-step UNet program is
    expensive to compile; cache hits make repeat runs start in seconds.
    Entries live under a per-machine subdirectory (see _machine_cache_key)."""
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.join(cache_dir, _machine_cache_key()))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_conditions(pipe=None) -> dict:
    """Self-describing run conditions for benchmark JSON lines.

    BENCH numbers are only comparable when the config surface underneath them
    is recorded with them (round 3 compared numbers across a GEGLU-default
    flip): weights mode, tokenizer mode, and the resolved kernel-knob set all
    ride along in the output."""
    import os

    def knob(name: str, default: str) -> str:
        return os.environ.get(name, default)

    conditions = {
        "kernels": {
            "pallas_geglu": knob("SASPA_PALLAS_GEGLU", "1") == "1",
            "cfg_shared_prefix": knob("SASPA_CFG_FULL_BATCH", "") != "1",
            "pallas_gn": knob("SASPA_PALLAS_GN", "0") == "1" and knob("SASPA_DISABLE_PALLAS_GN", "") != "1",
            "gn_bf16_norm": knob("SASPA_GN_FP32_NORM", "") != "1",
            "ln_bf16_norm": knob("SASPA_LN_FP32_NORM", "") != "1",
            "attn_megakernel": knob("SASPA_ATTN_MEGAKERNEL", "") == "1",
            "packed_block_q": knob("SASPA_PACKED_BLOCK_Q", "auto"),
            "pallas_ln_one_pass": knob("SASPA_PALLAS_LN", "") == "1",
            "split_skip_concat": knob("SASPA_SPLIT_SKIP_CONCAT", "") == "1",
        },
    }
    if pipe is not None:
        if getattr(pipe, "weights_loaded", False):
            conditions["weights"] = "converted"
        elif os.environ.get("SASPA_INIT_BF16", "") == "1":
            conditions["weights"] = "random-init-bf16"
        else:
            conditions["weights"] = "random-init"
        tok = getattr(pipe, "tokenizer", None)
        if tok is not None:
            conditions["tokenizer"] = "bpe" if tok.has_vocab else "hash-fallback"
    return conditions
