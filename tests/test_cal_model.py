import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saspa_tpu.models.cal import WSDAN_CAL, bap, sample_attention_maps
from saspa_tpu.ops.batch_augment import batch_augment


@pytest.fixture(scope="module")
def small_model():
    model = WSDAN_CAL(num_classes=10, M=4, net="resnet50")
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False)
    return model, variables


def test_forward_shapes_eval(small_model):
    model, variables = small_model
    x = jnp.asarray(np.random.rand(2, 64, 64, 3), jnp.float32)
    p, p_cf, fm, att = model.apply(variables, x, train=False)
    assert p.shape == (2, 10)
    assert p_cf.shape == (2, 10)
    assert fm.shape == (2, 4 * 2048)
    assert att.shape[:2] == (2, 1)  # eval: mean attention map


def test_forward_shapes_train(small_model):
    model, variables = small_model
    x = jnp.asarray(np.random.rand(2, 64, 64, 3), jnp.float32)
    (p, p_cf, fm, att), mut = model.apply(
        variables, x, train=True, rngs_key=jax.random.PRNGKey(1), mutable=["batch_stats"]
    )
    assert att.shape[:2] == (2, 2)  # train: 2 sampled maps (crop + drop)
    assert "batch_stats" in mut


def test_bap_normalization_and_counterfactual():
    feats = jnp.asarray(np.random.rand(2, 7, 7, 16), jnp.float32)
    atts = jnp.asarray(np.random.rand(2, 7, 7, 4), jnp.float32)
    fm, cf = bap(feats, atts, fake_key=None)
    assert fm.shape == (2, 64)
    # l2-normalized over M*C
    assert np.allclose(np.linalg.norm(np.asarray(fm), axis=-1), 1.0, atol=1e-4)
    assert np.allclose(np.linalg.norm(np.asarray(cf), axis=-1), 1.0, atol=1e-4)
    # eval counterfactual uses all-ones attention -> independent of atts
    fm2, cf2 = bap(feats, atts * 3.14, fake_key=None)
    assert np.allclose(np.asarray(cf), np.asarray(cf2), atol=1e-5)


def test_sample_attention_maps_prefers_high_energy():
    # one map has overwhelming energy -> should be picked nearly always
    atts = np.full((1, 7, 7, 4), 1e-6, np.float32)
    atts[..., 2] = 100.0
    picked_idx = []
    for s in range(20):
        picked = sample_attention_maps(jnp.asarray(atts), jax.random.PRNGKey(s))
        assert picked.shape == (1, 2, 7, 7)
        picked_idx.append(float(np.asarray(picked).max()))
    assert np.mean([v > 50 for v in picked_idx]) > 0.9


def test_batch_augment_crop_zooms_into_hot_region():
    # image with a bright square where attention peaks; crop should magnify it
    img = np.zeros((1, 64, 64, 3), np.float32)
    img[0, 24:40, 24:40] = 1.0
    att = np.zeros((1, 8, 8), np.float32)
    att[0, 3:5, 3:5] = 1.0
    out = batch_augment(jnp.asarray(img), jnp.asarray(att), jax.random.PRNGKey(0), mode="crop", theta=0.5, padding_ratio=0.0)
    assert out.shape == img.shape
    # cropped view should have a larger bright fraction than the original
    assert float(np.asarray(out).mean()) > float(img.mean()) * 1.5


def test_batch_augment_drop_zeroes_hot_region():
    img = np.ones((1, 64, 64, 3), np.float32)
    att = np.zeros((1, 8, 8), np.float32)
    att[0, 4, 4] = 1.0
    out = batch_augment(jnp.asarray(img), jnp.asarray(att), jax.random.PRNGKey(0), mode="drop", theta=0.5)
    out = np.asarray(out)
    assert out.shape == img.shape
    # the hot center should be zeroed, the far corner untouched
    assert out[0, 36, 36].sum() == 0.0
    assert out[0, 0, 0].sum() == 3.0


def test_batch_augment_full_attention_crop_is_identity():
    """Uniform attention + padding -> bbox clamps to the full image and the
    align-corners resample grid is exactly the pixel grid: crop == input.
    (With padding_ratio=0 the reference's exclusive max-index bound crops off
    the last row/col — fgvc/util.py:224-226 — so identity needs padding;
    exact reference parity is covered by tests/test_reference_oracle.py.)"""
    img = np.asarray(np.random.rand(2, 32, 32, 3), np.float32)
    att = np.ones((2, 4, 4), np.float32)
    out = np.asarray(
        batch_augment(jnp.asarray(img), jnp.asarray(att), jax.random.PRNGKey(0), mode="crop", theta=0.9, padding_ratio=0.1)
    )
    assert np.abs(out - img).max() < 1e-6


@pytest.mark.parametrize("net,nfeat", [("inception_mixed_6e", 768), ("inception_mixed_7c", 2048)])
@pytest.mark.slow
def test_inception_cal_forward(net, nfeat):
    """Forward coverage for the inception backbones incl. the mixed_7c
    first-M-channels attention slice (reference fgvc/models/cal.py:174-177)."""
    model = WSDAN_CAL(num_classes=5, M=4, net=net)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    p, p_minus_hat, fm, amap = model.apply(variables, x)
    assert p.shape == (2, 5) and p_minus_hat.shape == (2, 5)
    assert fm.shape == (2, 4 * nfeat)
    assert amap.shape[:2] == (2, 1) and amap.ndim == 4  # (B, 1, h, w) eval map
    for a in (p, p_minus_hat, fm, amap):
        assert np.isfinite(np.asarray(a)).all()


def test_inception_mixed_7c_attention_is_feature_slice():
    """mixed_7c must NOT create attention conv/bn params — attention maps are
    the first M feature channels."""
    model = WSDAN_CAL(num_classes=3, M=2, net="inception_mixed_7c")
    x = jnp.ones((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert not any("attentions_conv" in n for n in names), "7c should slice features, not convolve"
