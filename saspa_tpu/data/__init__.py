from saspa_tpu.data.registry import (
    BaseUtils,
    PlanesUtils,
    CarsUtils,
    DTDUtils,
    CompCarsPartsUtils,
    CUBUtils,
    PlanesBiasedUtils,
    DS_UTILS_DICT,
    DATASETS_SUPPORTED,
)
from saspa_tpu.data.datasets import AugSampler, FGVCDataset, get_datasets
