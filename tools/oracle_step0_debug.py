"""Bisect step-0 training-forward divergence between reference torch and ours."""

import sys
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
for name in ("torchvision", "torchvision.transforms", "clip", "wandb"):
    sys.modules.setdefault(name, types.ModuleType(name))
sys.path.append("/root/reference")

import torch  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

import fgvc.models.cal as ref_cal  # noqa: E402
import fgvc.util as ref_util  # noqa: E402

from saspa_tpu.models.cal import WSDAN_CAL  # noqa: E402
from saspa_tpu.ops.batch_augment import batch_augment  # noqa: E402
from tools.convert_weights import convert_cal  # noqa: E402
from tests.test_reference_oracle import _inject_torch_randomness  # noqa: E402

B, NC, M, SIZE = 2, 8, 4, 64

torch.manual_seed(3)
ref = ref_cal.WSDAN_CAL(num_classes=NC, M=M, net="resnet50",
                        pretrained=False, print_func=lambda *a, **k: None)
ref.train().double()
sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
params, stats = convert_cal(sd)
params = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
stats = jax.tree.map(lambda a: np.asarray(a, np.float64), stats)
model = WSDAN_CAL(num_classes=NC, M=M, net="resnet50", dtype=jnp.float64)
h = SIZE // 16

rng = np.random.RandomState(7)
X = (rng.rand(B, 3, SIZE, SIZE) * 2 - 1).astype(np.float64)
y = rng.permutation(NC)[:B].astype(np.int64)
fake1 = rng.uniform(0, 2, (B, M, h, h))
pick1 = rng.randint(0, M, (B, 2))
crop_theta = rng.uniform(0.4, 0.6, B)
drop_theta = rng.uniform(0.2, 0.5, B)
fake2 = rng.uniform(0, 2, (2 * B, M, h, h))
pick2 = rng.randint(0, M, (2 * B, 2))

Xt = torch.from_numpy(X)
fake_q = [fake1, fake2]
pick_q = [pick1[i] for i in range(B)] + [pick2[i] for i in range(2 * B)]
theta_q = list(crop_theta) + list(drop_theta)
with _inject_torch_randomness(fake_q, pick_q, theta_q):
    with torch.no_grad():
        p_raw_t, p_aux_t, fm_t, att_t = ref(Xt)
        crop_t = ref_util.batch_augment(Xt, att_t[:, :1], mode="crop", theta=(0.4, 0.6), padding_ratio=0.1)
        drop_t = ref_util.batch_augment(Xt, att_t[:, 1:], mode="drop", theta=(0.2, 0.5))
        aug_t = torch.cat([crop_t, drop_t], dim=0)
        p_aug_t, p_aux_aug_t, _, _ = ref(aug_t)

variables = {"params": params, "batch_stats": stats}
(p_raw_j, p_aux_j, fm_j, att_j), mut1 = model.apply(
    variables, jnp.asarray(X.transpose(0, 2, 3, 1)), train=True,
    mutable=["batch_stats"],
    fake_att=jnp.asarray(fake1.transpose(0, 2, 3, 1)), pick_idx=jnp.asarray(pick1),
)
key = jax.random.PRNGKey(0)
crop_j = batch_augment(jnp.asarray(X.transpose(0, 2, 3, 1)), att_j[:, 0], key,
                       mode="crop", theta=(0.4, 0.6), padding_ratio=0.1,
                       thetas=jnp.asarray(crop_theta))
drop_j = batch_augment(jnp.asarray(X.transpose(0, 2, 3, 1)), att_j[:, 1], key,
                       mode="drop", theta=(0.2, 0.5), thetas=jnp.asarray(drop_theta))
aug_j = jnp.concatenate([crop_j, drop_j], axis=0)
(p_aug_j, p_aux_aug_j, _, _), mut2 = model.apply(
    {"params": params, "batch_stats": mut1["batch_stats"]}, aug_j, train=True,
    mutable=["batch_stats"],
    fake_att=jnp.asarray(fake2.transpose(0, 2, 3, 1)), pick_idx=jnp.asarray(pick2),
)


def d(name, a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    print(f"{name:16s} max_abs={np.abs(a - b).max():.3e}  absmax={np.abs(b).max():.3e}")


d("p_raw", p_raw_j, p_raw_t.numpy())
d("p_aux", p_aux_j, p_aux_t.numpy())
d("fm", fm_j, fm_t.numpy())
d("att_map", att_j, att_t.numpy())
d("crop", np.transpose(np.asarray(crop_j), (0, 3, 1, 2)), crop_t.numpy())
d("drop", np.transpose(np.asarray(drop_j), (0, 3, 1, 2)), drop_t.numpy())
d("p_aug", p_aug_j, p_aug_t.numpy())
d("p_aux_aug", p_aux_aug_j, p_aux_aug_t.numpy())

# ---- now the REAL step_fn and the composite loss, term by term
from saspa_tpu.fgvc import losses as L
from saspa_tpu.fgvc.train import TrainState, make_optimizer, make_train_step
from saspa_tpu.utils.config import TrainConfig

yt = torch.from_numpy(y)
ce = torch.nn.CrossEntropyLoss()
center = ref_util.CenterLoss()
fc0 = torch.zeros(NC, M * 2048, dtype=torch.float64)
fcb = torch.nn.functional.normalize(fc0[yt], dim=-1)
p_aux_cat_t = torch.cat([p_aux_t, p_aux_aug_t], dim=0)
y_aug_t = torch.cat([yt, yt], dim=0)
y_aux_t = torch.cat([yt, y_aug_t], dim=0)
t1 = ce(p_raw_t, yt) / 3.0
t2 = ce(p_aux_cat_t, y_aux_t)
t3 = ce(p_aug_t, y_aug_t) * 2.0 / 3.0
t4 = center(fm_t, fcb)
print(f"torch terms: ce_raw/3={t1.item():.9f} ce_aux={t2.item():.9f} ce_aug*2/3={t3.item():.9f} center={t4.item():.9f} total={(t1+t2+t3+t4).item():.9f}")

j1 = float(L.cross_entropy(p_raw_j, jnp.asarray(y)) / 3.0)
j2 = float(L.cross_entropy(jnp.concatenate([p_aux_j, p_aux_aug_j]), jnp.asarray(np.concatenate([y, y, y]))))
j3 = float(L.cross_entropy(p_aug_j, jnp.asarray(np.concatenate([y, y]))) * 2.0 / 3.0)
j4 = float(L.center_loss(fm_j, jnp.zeros_like(fm_j)))
print(f"jax terms:   ce_raw/3={j1:.9f} ce_aux={j2:.9f} ce_aug*2/3={j3:.9f} center={j4:.9f} total={j1+j2+j3+j4:.9f}")

cfg = TrainConfig(net="resnet50", num_attentions=M, learning_rate=1e-3, beta=5e-2,
                  batch_size=B, donate_state=False)
tx = make_optimizer(cfg, num_batches_per_epoch=2)
state = TrainState(step=jnp.zeros((), jnp.int32), params=params, batch_stats=stats,
                   opt_state=tx.init(params),
                   feature_center=jnp.zeros((NC, M * 2048), jnp.float64))
step_fn = make_train_step(model, cfg, num_batches_per_epoch=2)
jd = dict(fake1=jnp.asarray(fake1.transpose(0, 2, 3, 1)), pick1=jnp.asarray(pick1),
          crop_theta=jnp.asarray(crop_theta), drop_theta=jnp.asarray(drop_theta),
          fake2=jnp.asarray(fake2.transpose(0, 2, 3, 1)), pick2=jnp.asarray(pick2))
state2, metrics = step_fn(state, jnp.asarray(X.transpose(0, 2, 3, 1)), jnp.asarray(y),
                          jax.random.PRNGKey(0), draws=jd)
print("step_fn loss:", float(metrics["loss"]))
