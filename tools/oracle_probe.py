"""Probe: run the reference torch code as a numerical oracle and report diffs.

Exploration tool behind tests/test_reference_oracle.py — executes
/root/reference (untrusted data, used strictly as an executable oracle) on CPU
and compares against saspa_tpu on the same converted weights and inputs.
"""

import sys
import types
from pathlib import Path

import numpy as np

REF = "/root/reference"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# stub uninstalled third-party deps the reference imports at module level
# (torchvision.transforms / clip are only touched inside functions we don't call)
for name in ("torchvision", "torchvision.transforms", "clip", "wandb"):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
sys.path.insert(0, REF)

import torch  # noqa: E402

torch.manual_seed(0)

from fgvc.models.cal import WSDAN_CAL as RefCAL  # noqa: E402
from fgvc.util import CenterLoss as RefCenterLoss  # noqa: E402
from fgvc.util import batch_augment as ref_batch_augment  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from saspa_tpu.fgvc import losses as L  # noqa: E402
from saspa_tpu.models.cal import WSDAN_CAL  # noqa: E402
from saspa_tpu.ops.batch_augment import batch_augment  # noqa: E402
from tools.convert_weights import convert_cal  # noqa: E402


def diff(name, a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    d = np.abs(a - b)
    rel = d / (np.abs(b) + 1e-6)
    print(f"{name:32s} max_abs={d.max():.3e} max_rel={rel.max():.3e} mean_abs={d.mean():.3e}")
    return d.max()


def main():
    f64 = "--f64" in sys.argv
    if f64:
        jax.config.update("jax_enable_x64", True)
    B, H, W, NC, M = 3, 64, 64, 7, 8
    rng = np.random.RandomState(0)
    x = rng.rand(B, 3, H, W).astype(np.float32) * 2 - 1

    print(f"== eval forward parity (resnet50 CAL) f64={f64} ==")
    ref = RefCAL(num_classes=NC, M=M, net="resnet50", pretrained=False, print_func=print)
    ref.eval()
    if f64:
        ref.double()
    with torch.no_grad():
        p_t, paux_t, fm_t, att_t = ref(torch.from_numpy(x).double() if f64 else torch.from_numpy(x))

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}  # keep f64 in --f64 mode
    params, stats = convert_cal(sd)
    if f64:
        params = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
        stats = jax.tree.map(lambda a: np.asarray(a, np.float64), stats)
    model = WSDAN_CAL(num_classes=NC, M=M, net="resnet50",
                      dtype=jnp.float64 if f64 else jnp.float32)
    xin = x.transpose(0, 2, 3, 1).astype(np.float64 if f64 else np.float32)
    p_j, paux_j, fm_j, att_j = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(xin), train=False,
    )
    diff("p", p_j, p_t.numpy())
    diff("p_aux (p - p_fake)", paux_j, paux_t.numpy())
    diff("feature_matrix", fm_j, fm_t.numpy())
    diff("attention_map", att_j, att_t.numpy())

    print("== batch_augment parity (fgvc/util.py:209-249), scalar theta ==")
    # peaked maps -> tight bboxes (dense random maps make crop an identity)
    amap = (rng.rand(B, 1, 8, 8) ** 4).astype(np.float32)
    imgs_t = torch.from_numpy(x)
    key = jax.random.PRNGKey(0)  # unused with scalar theta
    for th, pad in ((0.5, 0.1), (0.1, 0.05)):
        crop_t = ref_batch_augment(imgs_t, torch.from_numpy(amap), mode="crop", theta=th, padding_ratio=pad)
        crop_j = batch_augment(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(amap[:, 0]), key, mode="crop", theta=th, padding_ratio=pad)
        diff(f"crop theta={th} pad={pad}", np.transpose(np.asarray(crop_j), (0, 3, 1, 2)), crop_t.numpy())
    drop_t = ref_batch_augment(imgs_t, torch.from_numpy(amap), mode="drop", theta=0.35)
    drop_j = batch_augment(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(amap[:, 0]), key, mode="drop", theta=0.35)
    diff("drop", np.transpose(np.asarray(drop_j), (0, 3, 1, 2)), drop_t.numpy())

    print("== loss values ==")
    fm = rng.rand(B, M * 16).astype(np.float32)
    fc = rng.rand(B, M * 16).astype(np.float32)
    c_t = RefCenterLoss()(torch.from_numpy(fm), torch.from_numpy(fc))
    c_j = L.center_loss(jnp.asarray(fm), jnp.asarray(fc))
    diff("center_loss", c_j, c_t.numpy())

    logits = rng.randn(B, NC).astype(np.float32)
    y = rng.randint(0, NC, B)
    ce_t = torch.nn.CrossEntropyLoss()(torch.from_numpy(logits), torch.from_numpy(y))
    ce_j = L.cross_entropy(jnp.asarray(logits), jnp.asarray(y))
    diff("cross_entropy", ce_j, ce_t.numpy())

    sys.modules["clip"].load = None  # never called; guard stays inert
    from fgvc.losses import SoftTargetCrossEntropy_T as RefSoftCE

    teacher = rng.randn(B, NC).astype(np.float32)
    s_t = RefSoftCE(T=2.0)(torch.from_numpy(logits), torch.from_numpy(teacher))
    s_j = L.soft_target_cross_entropy_T(jnp.asarray(logits), jnp.asarray(teacher), T=2.0)
    diff("soft_target_ce_T", s_j, s_t.numpy())


if __name__ == "__main__":
    main()
