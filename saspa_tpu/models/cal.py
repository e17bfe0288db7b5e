"""WS-DAN / CAL (Counterfactual Attention Learning) classifier in Flax.

Behavioral spec: fgvc/models/cal.py:44-213 (BAP with sign-sqrt + L2 norm,
counterfactual branch with uniform fake attention, fc on feature_matrix*100,
train-time attention-map sampling proportional to sqrt(energy)).

TPU-first notes:
  * BAP's bilinear pooling is a single einsum — one MXU contraction instead
    of the reference's per-map loop option.
  * attention-map sampling is a vmapped categorical draw (the reference does
    a per-sample numpy choice on the host, fgvc/models/cal.py:201-209).
  * everything is shape-static; the two sampled maps come out as a (B, 2, h, w)
    tensor exactly like the reference.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from saspa_tpu.models.resnet import BACKBONES, NUM_FEATURES

EPSILON = 1e-6


def bap(
    features: jax.Array,
    attentions: jax.Array,
    fake_key: Optional[jax.Array] = None,
    fake_att: Optional[jax.Array] = None,
):
    """Bilinear Attention Pooling (fgvc/models/cal.py:44-86).

    features: (B, H, W, C); attentions: (B, H, W, M).
    Returns (feature_matrix (B, M*C), counterfactual_feature (B, M*C)).
    Training passes `fake_key` (uniform[0,2) fake attention) or an explicit
    `fake_att` tensor (deterministic injection for oracle-parity tests);
    eval passes neither -> ones like the reference (fgvc/models/cal.py:77-80).
    """
    b, h, w, c = features.shape
    m = attentions.shape[-1]

    def pool(att):
        acc = jnp.promote_types(features.dtype, jnp.float32)  # f32 accum for bf16, f64 stays f64
        fm = jnp.einsum("bhwm,bhwc->bmc", att, features, preferred_element_type=acc)
        fm = (fm / float(h * w)).reshape(b, m * c)
        fm = jnp.sign(fm) * jnp.sqrt(jnp.abs(fm) + EPSILON)  # sign-sqrt
        # F.normalize semantics: x / max(||x||, eps) (fgvc/models/cal.py:75)
        return fm / jnp.maximum(jnp.linalg.norm(fm, axis=-1, keepdims=True), 1e-12)

    feature_matrix = pool(attentions)
    if fake_att is None:
        if fake_key is not None:
            fake_att = jax.random.uniform(fake_key, attentions.shape, attentions.dtype, 0.0, 2.0)
        else:
            fake_att = jnp.ones_like(attentions)
    counterfactual = pool(fake_att)
    return feature_matrix, counterfactual


def sample_attention_maps(
    attentions: jax.Array, key: Optional[jax.Array], pick_idx: Optional[jax.Array] = None
) -> jax.Array:
    """Training-time map selection (fgvc/models/cal.py:201-209): draw 2 maps
    per sample with prob proportional to sqrt(total energy), with replacement.
    `pick_idx` (B, 2) int overrides the draw (oracle-parity injection).

    attentions: (B, H, W, M) -> (B, 2, H, W) [first for crop, second for drop].
    """
    b, h, w, m = attentions.shape
    if pick_idx is None:
        energy = jnp.sqrt(jnp.sum(attentions, axis=(1, 2)) + EPSILON)  # (B, M)
        logits = jnp.log(energy / jnp.sum(energy, axis=-1, keepdims=True))
        keys = jax.random.split(key, b)
        pick_idx = jax.vmap(lambda k, lg: jax.random.categorical(k, lg, shape=(2,)))(keys, logits)  # (B, 2)
    picked = jnp.take_along_axis(
        attentions.transpose(0, 3, 1, 2), pick_idx[:, :, None, None], axis=1
    )  # (B, 2, H, W)
    return picked


def cal_num_features(net: str) -> int:
    """Backbone feature width for any supported net — the single source of
    truth shared by WSDAN_CAL.setup and create_train_state's feature_center
    sizing (inception_mixed_6e is 768-wide, not the ResNet 2048)."""
    if "inception" in net:
        from saspa_tpu.models.inception import NUM_FEATURES_INCEPTION

        if net not in NUM_FEATURES_INCEPTION:
            raise ValueError(f"Unsupported net: {net}")
        return NUM_FEATURES_INCEPTION[net]
    return NUM_FEATURES.get(net.replace("_cbam", ""), 2048)


class WSDAN_CAL(nn.Module):
    """Returns (p, p - p_counterfactual, feature_matrix, attention_map)."""

    num_classes: int
    M: int = 32
    net: str = "resnet101"
    dtype: Any = jnp.float32

    def setup(self):
        if "inception" in self.net:
            from saspa_tpu.models.inception import InceptionV3Features

            truncate = "mixed_6e" if self.net == "inception_mixed_6e" else "mixed_7c"
            self.features = InceptionV3Features(truncate_at=truncate, dtype=self.dtype, name="features")
        elif self.net in BACKBONES:
            self.features = BACKBONES[self.net](dtype=self.dtype, features_only=True, name="features")
        else:
            raise ValueError(f"Unsupported net: {self.net}")
        self.num_features = cal_num_features(self.net)
        # BasicConv2d: 1x1 conv + BN + ReLU (fgvc/models/cal.py:159)
        self.attention_conv = nn.Conv(self.M, (1, 1), use_bias=False, dtype=self.dtype, name="attentions_conv")
        self.attention_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-3, dtype=self.dtype, name="attentions_bn")
        self.fc = nn.Dense(self.num_classes, use_bias=False, dtype=self.dtype, name="fc")

    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        rngs_key: Optional[jax.Array] = None,
        fake_att: Optional[jax.Array] = None,
        pick_idx: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        feature_maps = self.features(x, train=train)  # (B, h, w, C)
        if self.net == "inception_mixed_7c":
            # mixed_7c uses the first M feature channels directly as attention
            # maps (fgvc/models/cal.py:174-177)
            attention_maps = feature_maps[..., : self.M].astype(jnp.float32)
        else:
            attention_maps = nn.relu(
                self.attention_bn(self.attention_conv(feature_maps), use_running_average=not train)
            )  # (B, h, w, M)

        # upcast low-precision activations for BAP; never DOWNcast (f64 parity
        # runs against the executed reference stay f64, tests/test_reference_oracle.py)
        acc = jnp.promote_types(feature_maps.dtype, jnp.float32)
        fm32 = feature_maps.astype(acc)
        am32 = attention_maps.astype(acc)

        if train:
            # `fake_att`/`pick_idx` inject the training-time randomness
            # explicitly (deterministic oracle-parity runs); otherwise both
            # come from `rngs_key`
            if fake_att is None or pick_idx is None:
                assert rngs_key is not None, "training forward needs an rng key"
                k_fake, k_pick = jax.random.split(rngs_key)
            feature_matrix, feature_matrix_hat = bap(
                fm32, am32, fake_key=None if fake_att is not None else k_fake, fake_att=fake_att
            )
            attention_map = sample_attention_maps(
                jax.lax.stop_gradient(am32), None if pick_idx is not None else k_pick, pick_idx=pick_idx
            )  # (B, 2, h, w)
        else:
            feature_matrix, feature_matrix_hat = bap(fm32, am32, fake_key=None)
            attention_map = jnp.mean(am32, axis=-1, keepdims=False)[:, None]  # (B, 1, h, w)

        p = self.fc(feature_matrix * 100.0)
        p_hat = self.fc(feature_matrix_hat * 100.0)
        return p, p - p_hat, feature_matrix, attention_map
