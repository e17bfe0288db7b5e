from saspa_tpu.utils.config import (
    TrainConfig,
    GenerationConfig,
    FilterConfig,
    get_train_config,
    DATASETS_SUPPORTED,
)
from saspa_tpu.utils.logging_utils import init_logging
from saspa_tpu.utils import rng
