from saspa_tpu.native.host_ops import (
    native_available,
    resize_bilinear_u8,
    resize_batch_u8,
    normalize_crop_batch_f32,
    canny_u8,
)
