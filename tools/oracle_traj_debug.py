"""Debug harness for the SGD trajectory oracle parity (small, verbose).

Runs N steps of the reference torch loop vs our jitted train step with
injected randomness and prints per-step loss/logit/grad diffs to localize
any divergence.  See tests/test_reference_oracle.py for the real test.
"""

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

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize overrides the env var
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

import fgvc.models.cal as ref_cal  # noqa: E402
import fgvc.util as ref_util  # noqa: E402

from saspa_tpu.models.cal import WSDAN_CAL  # noqa: E402
from tools.convert_weights import convert_cal  # noqa: E402
from tests.test_reference_oracle import _inject_torch_randomness  # noqa: E402

B, NC, M, SIZE, STEPS = 2, 8, 4, 64, int(sys.argv[1]) if len(sys.argv) > 1 else 2
LR, BETA = float(__import__("os").environ.get("DBG_LR", "1e-3")), 5e-2

torch.manual_seed(3)
ref = ref_cal.WSDAN_CAL(num_classes=NC, M=M, net="resnet50",
                        pretrained=False, print_func=lambda *a, **k: None)
ref.train().double()
sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
params, stats = convert_cal(sd)
# copy=True: tensor.numpy() views torch storage; the torch opt loop would
# mutate our initial weights in place otherwise
params = jax.tree.map(lambda a: np.array(a, np.float64, copy=True), params)
stats = jax.tree.map(lambda a: np.array(a, np.float64, copy=True), stats)
model = WSDAN_CAL(num_classes=NC, M=M, net="resnet50", dtype=jnp.float64)
h = SIZE // 16

rng = np.random.RandomState(7)
data = []
for s in range(STEPS):
    X = (rng.rand(B, 3, SIZE, SIZE) * 2 - 1).astype(np.float64)
    y = rng.permutation(NC)[:B].astype(np.int64)
    draws = dict(
        fake1=rng.uniform(0, 2, (B, M, h, h)),
        pick1=rng.randint(0, M, (B, 2)),
        crop_theta=rng.uniform(0.4, 0.6, B),
        drop_theta=rng.uniform(0.2, 0.5, B),
        fake2=rng.uniform(0, 2, (2 * B, M, h, h)),
        pick2=rng.randint(0, M, (2 * B, 2)),
    )
    data.append((X, y, draws))

# torch side
ce = torch.nn.CrossEntropyLoss()
center_loss = ref_util.CenterLoss()
feature_center_t = torch.zeros(NC, M * 2048, dtype=torch.float64)
opt = torch.optim.SGD(ref.parameters(), lr=LR, momentum=0.9, weight_decay=1e-5)
losses_t, praw_t, crop_t_list, paug_t_list = [], [], [], []
for s, (X, y, draws) in enumerate(data):
    for group in opt.param_groups:
        group["lr"] = LR * 0.9 ** ((0 + s / STEPS) / 2)
    opt.zero_grad()
    Xt, yt = torch.from_numpy(X), torch.from_numpy(y)
    fake_q = [draws["fake1"], draws["fake2"]]
    pick_q = [draws["pick1"][i] for i in range(B)] + [draws["pick2"][i] for i in range(2 * B)]
    theta_q = list(draws["crop_theta"]) + list(draws["drop_theta"])
    with _inject_torch_randomness(fake_q, pick_q, theta_q):
        y_pred_raw, y_pred_aux, feature_matrix, attention_map = ref(Xt)
        fc_batch = torch.nn.functional.normalize(feature_center_t[yt], dim=-1)
        feature_center_t[yt] += BETA * (feature_matrix.detach() - fc_batch)
        with torch.no_grad():
            crop_images = ref_util.batch_augment(Xt, attention_map[:, :1], mode="crop", theta=(0.4, 0.6), padding_ratio=0.1)
            drop_images = ref_util.batch_augment(Xt, attention_map[:, 1:], mode="drop", theta=(0.2, 0.5))
        aug_images = torch.cat([crop_images, drop_images], dim=0)
        y_aug = torch.cat([yt, yt], dim=0)
        y_pred_aug, y_pred_aux_aug, _, _ = ref(aug_images)
    y_pred_aux_cat = torch.cat([y_pred_aux, y_pred_aux_aug], dim=0)
    y_aux = torch.cat([yt, y_aug], dim=0)
    batch_loss = (ce(y_pred_raw, yt) / 3.0 + ce(y_pred_aux_cat, y_aux) * 3.0 / 3.0
                  + ce(y_pred_aug, y_aug) * 2.0 / 3.0 + center_loss(feature_matrix, fc_batch))
    batch_loss.backward()
    opt.step()
    losses_t.append(batch_loss.item())
    praw_t.append(y_pred_raw.detach().numpy())
    crop_t_list.append(crop_images.numpy())
    paug_t_list.append(y_pred_aug.detach().numpy())

# jax side
from saspa_tpu.fgvc.train import TrainState, make_optimizer, make_train_step  # noqa: E402
from saspa_tpu.utils.config import TrainConfig  # noqa: E402

cfg = TrainConfig(net="resnet50", num_attentions=M, learning_rate=LR,
                  beta=BETA, batch_size=B, donate_state=False)
tx = make_optimizer(cfg, num_batches_per_epoch=STEPS)
state = TrainState(step=jnp.zeros((), jnp.int32), params=params, batch_stats=stats,
                   opt_state=tx.init(params),
                   feature_center=jnp.zeros((NC, M * 2048), jnp.float64))
step_fn = make_train_step(model, cfg, num_batches_per_epoch=STEPS)
for s, (X, y, draws) in enumerate(data):
    jd = dict(
        fake1=jnp.asarray(draws["fake1"].transpose(0, 2, 3, 1)),
        pick1=jnp.asarray(draws["pick1"]),
        crop_theta=jnp.asarray(draws["crop_theta"]),
        drop_theta=jnp.asarray(draws["drop_theta"]),
        fake2=jnp.asarray(draws["fake2"].transpose(0, 2, 3, 1)),
        pick2=jnp.asarray(draws["pick2"]),
    )
    state, metrics = step_fn(state, jnp.asarray(X.transpose(0, 2, 3, 1)), jnp.asarray(y),
                             jax.random.PRNGKey(0), draws=jd)
    lj = float(metrics["loss"])
    print(f"step {s}: loss_t={losses_t[s]:.12f} loss_j={lj:.12f} diff={abs(lj - losses_t[s]):.3e}")

fc_diff = np.abs(np.asarray(state.feature_center) - feature_center_t.numpy()).max()
print("feature_center max diff:", fc_diff)

sd_final = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
params_final, _ = convert_cal(sd_final)
flat_j = dict(jax.tree_util.tree_leaves_with_path(state.params))
flat_t = dict(jax.tree_util.tree_leaves_with_path(jax.tree.map(jnp.asarray, params_final)))
worst = sorted(((float(jnp.abs(flat_j[k] - flat_t[k]).max()), jax.tree_util.keystr(k)) for k in flat_j), reverse=True)
for d, name in worst[:8]:
    print(f"param diff {d:.3e}  {name}")
