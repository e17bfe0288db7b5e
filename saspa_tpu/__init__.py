"""SaSPA-TPU: a TPU-native structure-and-subject-preserving augmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the SaSPA generative-augmentation
system (reference: EyalMichaeli/SaSPA-Aug). The three pipeline stages —
generate (diffusion + ControlNet), filter (CLIP / classifier confidence),
train (WS-DAN/CAL fine-grained classifier) — run as batched, sharded XLA
programs over a `jax.sharding.Mesh`, instead of the reference's per-image
single-GPU torch loops.

Layout:
    saspa_tpu.utils     config, rng, logging, checkpointing
    saspa_tpu.parallel  mesh construction + sharding helpers
    saspa_tpu.ops       image ops (resize/canny/augment), Pallas kernels
    saspa_tpu.models    Flax modules (ResNet, WSDAN-CAL, CLIP, UNet, VAE, ControlNet, ...)
    saspa_tpu.diffusion schedulers + CFG sampler (lax.scan) + pipeline zoo
    saspa_tpu.filters   batched filtering stages + aug-JSON artifact io
    saspa_tpu.data      dataset registry, dataset classes, input pipeline
    saspa_tpu.fgvc      losses, metrics, train/eval loops
    saspa_tpu.gen       generation driver + prompt assembly engine
"""

__version__ = "0.1.0"
