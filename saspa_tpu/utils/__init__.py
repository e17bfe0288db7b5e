from saspa_tpu.utils.config import (
    TrainConfig,
    GenerationConfig,
    FilterConfig,
    get_train_config,
    DATASETS_SUPPORTED,
)
from saspa_tpu.utils.logging_utils import init_logging
from saspa_tpu.utils import rng


def enable_compilation_cache(cache_dir: str | None = None):
    """Persistent XLA compilation cache — the scanned 30-step UNet program is
    expensive to compile; cache hits make repeat runs start in seconds."""
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
