from saspa_tpu.ops.image import (
    HWC3,
    resize_shape_multiple_of_64,
    resize_image,
    resize_image_batch,
    normalize_imagenet,
)
from saspa_tpu.ops.canny import canny, canny_batch
