"""Reference-as-oracle numerical parity: execute the reference's own torch
code (/root/reference, CPU) and assert our JAX implementation reproduces it.

Everything else in tests/ proves equivalence between builder-authored
implementations on both sides; these tests remove that blind spot — the
torch side here IS the reference (fgvc/models/cal.py, fgvc/util.py,
fgvc/losses.py), imported and executed as an untrusted, read-only oracle.
A shared misreading of BAP/batch_augment/loss semantics cannot pass here.

Method: random-init reference models, state dicts converted through
tools/convert_weights.convert_cal (the same converter real weights will use),
both sides run in float64 so fp noise cannot mask (or excuse) a semantic
difference — eval parity asserts ~1e-10, i.e. bit-level agreement of the
math.  The 50-step SGD trajectory injects identical randomness into both
sides (fake counterfactual attention, attention-map picks, crop/drop thetas)
and asserts loss/param/feature-center trajectories match.

Skips cleanly when /root/reference or torch is unavailable.

Refs: fgvc/models/cal.py:44-213, fgvc/util.py:15-21,209-249,
fgvc/train.py:446-510, fgvc/losses.py:66-88.
"""

import sys
import types
from contextlib import contextmanager
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (REFERENCE / "fgvc" / "models" / "cal.py").exists(),
    reason="reference checkout not available",
)

REPO = Path(__file__).resolve().parent.parent


def _import_reference():
    """Import the reference modules with stubs for its uninstalled deps
    (torchvision/clip/wandb are only touched inside functions we never call)."""
    for name in ("torchvision", "torchvision.transforms", "clip", "wandb"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if str(REFERENCE) not in sys.path:
        sys.path.append(str(REFERENCE))
    import fgvc.losses as ref_losses
    import fgvc.models.cal as ref_cal
    import fgvc.util as ref_util

    return ref_cal, ref_util, ref_losses


@contextmanager
def _x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", old)


def _to_f64_tree(tree):
    # copy=True: the converted arrays otherwise ALIAS live torch parameter
    # storage (tensor.numpy() is a view), and the torch optimizer loop would
    # silently rewrite our "initial" weights in place
    return jax.tree.map(lambda a: np.array(a, np.float64, copy=True), tree)


def _build_pair(net: str, num_classes=7, M=8, seed=0):
    """Random-init reference model (f64) + our model with converted params."""
    ref_cal, _, _ = _import_reference()
    from saspa_tpu.models.cal import WSDAN_CAL

    sys.path.insert(0, str(REPO))
    from tools.convert_weights import convert_cal

    torch.manual_seed(seed)
    ref = ref_cal.WSDAN_CAL(num_classes=num_classes, M=M, net=net,
                            pretrained=False, print_func=lambda *a, **k: None)
    ref.eval().double()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = convert_cal(sd, net="resnet" if "resnet" in net else net)
    model = WSDAN_CAL(num_classes=num_classes, M=M, net=net, dtype=jnp.float64)
    return ref, model, _to_f64_tree(params), _to_f64_tree(stats)


@pytest.mark.parametrize("net", ["resnet50", "inception_mixed_6e"])
def test_eval_forward_parity_f64(net):
    """Eval-mode logits / counterfactual / feature-matrix / attention-map all
    match the executed reference to ~1e-10 in f64 (fgvc/models/cal.py:184-213)."""
    with _x64():
        ref, model, params, stats = _build_pair(net)
        rng = np.random.RandomState(0)
        size = 64 if "resnet" in net else 96  # inception needs >=75
        x = rng.rand(2, 3, size, size).astype(np.float64) * 2 - 1
        with torch.no_grad():
            p_t, paux_t, fm_t, att_t = ref(torch.from_numpy(x))
        p_j, paux_j, fm_j, att_j = model.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
        )
        np.testing.assert_allclose(np.asarray(p_j), p_t.numpy(), atol=1e-9, rtol=1e-7)
        np.testing.assert_allclose(np.asarray(paux_j), paux_t.numpy(), atol=1e-9, rtol=1e-7)
        np.testing.assert_allclose(np.asarray(fm_j), fm_t.numpy(), atol=1e-10, rtol=1e-7)
        np.testing.assert_allclose(np.asarray(att_j), att_t.numpy(), atol=1e-10, rtol=1e-7)


def test_batch_augment_parity_f64():
    """Crop (train + eval-TTA thetas) and drop against the executed
    fgvc/util.py:209-249 on identical inputs and thetas."""
    _, ref_util, _ = _import_reference()
    from saspa_tpu.ops.batch_augment import batch_augment

    with _x64():
        rng = np.random.RandomState(1)
        x = rng.rand(3, 3, 64, 64).astype(np.float64)
        amap = (rng.rand(3, 1, 8, 8) ** 4).astype(np.float64)  # peaked -> tight bboxes
        key = jax.random.PRNGKey(0)  # unused with scalar theta
        x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
        a_j = jnp.asarray(amap[:, 0])
        for th, pad in ((0.5, 0.1), (0.45, 0.1), (0.1, 0.05)):
            crop_t = ref_util.batch_augment(
                torch.from_numpy(x), torch.from_numpy(amap), mode="crop", theta=th, padding_ratio=pad
            ).numpy()
            crop_j = np.asarray(batch_augment(x_j, a_j, key, mode="crop", theta=th, padding_ratio=pad))
            np.testing.assert_allclose(crop_j.transpose(0, 3, 1, 2), crop_t, atol=1e-10,
                                       err_msg=f"crop theta={th} pad={pad}")
        for th in (0.2, 0.35, 0.5):
            drop_t = ref_util.batch_augment(
                torch.from_numpy(x), torch.from_numpy(amap), mode="drop", theta=th
            ).numpy()
            drop_j = np.asarray(batch_augment(x_j, a_j, key, mode="drop", theta=th))
            np.testing.assert_allclose(drop_j.transpose(0, 3, 1, 2), drop_t, atol=1e-12,
                                       err_msg=f"drop theta={th}")


def test_loss_values_parity():
    """CenterLoss, CE, soft-target-CE(T=2), and the composite 3-view loss
    VALUE against the executed reference modules (fgvc/train.py:496-500,
    fgvc/util.py:15-21, fgvc/losses.py:66-88)."""
    _, ref_util, ref_losses = _import_reference()
    from saspa_tpu.fgvc import losses as L

    with _x64():
        rng = np.random.RandomState(2)
        B, NC, D = 5, 7, 48
        fm = rng.rand(B, D).astype(np.float64)
        fc = rng.rand(B, D).astype(np.float64)
        c_t = ref_util.CenterLoss()(torch.from_numpy(fm), torch.from_numpy(fc)).item()
        c_j = float(L.center_loss(jnp.asarray(fm), jnp.asarray(fc)))
        assert abs(c_t - c_j) < 1e-10

        p_raw = rng.randn(B, NC).astype(np.float64)
        p_aux = rng.randn(3 * B, NC).astype(np.float64)
        p_aug = rng.randn(2 * B, NC).astype(np.float64)
        y = rng.randint(0, NC, B)
        y_aug = np.concatenate([y, y])
        y_aux = np.concatenate([y, y_aug])
        ce = torch.nn.CrossEntropyLoss()
        composite_t = (
            ce(torch.from_numpy(p_raw), torch.from_numpy(y)) / 3.0
            + ce(torch.from_numpy(p_aux), torch.from_numpy(y_aux)) * 3.0 / 3.0
            + ce(torch.from_numpy(p_aug), torch.from_numpy(y_aug)) * 2.0 / 3.0
            + ref_util.CenterLoss()(torch.from_numpy(fm), torch.from_numpy(fc))
        ).item()
        composite_j = float(
            L.cross_entropy(jnp.asarray(p_raw), jnp.asarray(y)) / 3.0
            + L.cross_entropy(jnp.asarray(p_aux), jnp.asarray(y_aux))
            + L.cross_entropy(jnp.asarray(p_aug), jnp.asarray(y_aug)) * 2.0 / 3.0
            + L.center_loss(jnp.asarray(fm), jnp.asarray(fc))
        )
        assert abs(composite_t - composite_j) < 1e-10

        teacher = rng.randn(B, NC).astype(np.float64)
        s_t = ref_losses.SoftTargetCrossEntropy_T(T=2.0)(
            torch.from_numpy(p_raw), torch.from_numpy(teacher)
        ).item()
        s_j = float(L.soft_target_cross_entropy_T(jnp.asarray(p_raw), jnp.asarray(teacher), T=2.0))
        assert abs(s_t - s_j) < 1e-10


# ---------------------------------------------------------------------------
# 50-step SGD trajectory parity
# ---------------------------------------------------------------------------

@contextmanager
def _inject_torch_randomness(fake_queue, pick_queue, theta_queue):
    """Route the reference's three stochastic draws to pre-generated values:
    torch.Tensor.uniform_ (BAP fake attention, fgvc/models/cal.py:78),
    np.random.choice (attention-map picks, :207), random.uniform
    (crop/drop thetas, fgvc/util.py:216/235).  The reference code itself runs
    unmodified — only the entropy source is pinned, mirroring what the JAX
    side receives through the train step's `draws` argument."""
    import random as pyrandom

    orig_uniform = torch.Tensor.uniform_
    orig_choice = np.random.choice
    orig_runiform = pyrandom.uniform

    def fake_uniform(self, a=0.0, b=1.0):
        arr = fake_queue.pop(0)
        assert tuple(self.shape) == arr.shape, (self.shape, arr.shape)
        self.copy_(torch.from_numpy(arr).to(self.dtype))
        return self

    def fake_choice(n, size, p=None):
        return pick_queue.pop(0)

    def fake_runiform(a, b):
        return theta_queue.pop(0)

    torch.Tensor.uniform_ = fake_uniform
    np.random.choice = fake_choice
    pyrandom.uniform = fake_runiform
    try:
        yield
    finally:
        torch.Tensor.uniform_ = orig_uniform
        np.random.choice = orig_choice
        pyrandom.uniform = orig_runiform


@pytest.mark.slow
def test_sgd_trajectory_parity_f64():
    """Multi-step optimizer-trajectory parity: the reference train loop
    (torch.optim.SGD, momentum 0.9, wd 1e-5, per-batch exp LR decay,
    feature-center EMA, 3-view composite loss — fgvc/train.py:446-510)
    against our jitted make_train_step with converted weights, identical
    data, and identical injected randomness, in f64.  Losses, final params,
    and the feature-center trajectory must agree.

    Why 4 steps and not 50: the attention-crop bbox is a DISCRETE function
    of the attention map (mask >= theta*max -> integer nonzero bounds,
    fgvc/util.py:221-226).  Measured on this data, both frameworks agree to
    ~1e-8 through step 3, then a ~1e-9 attention difference lands on a mask
    knife edge at step 4, the bbox jumps by a whole pixel, and the loss gap
    goes 1e-8 -> 7e-2 in ONE step (tools/oracle_traj_debug.py) — true for
    ANY two bit-inequivalent but both-correct implementations, including
    torch vs torch with a different op order.  Four tight steps prove the
    semantics (gradients through BAP/counterfactual/center-loss, torch-SGD
    wd->momentum->lr order, per-batch LR decay, BN batch-stat updates,
    feature-center EMA compounding); more steps only measure chaos."""
    ref_cal, ref_util, _ = _import_reference()

    with _x64():
        B, NC, M, SIZE, STEPS = 2, 8, 4, 64, 4
        LR, BETA = 1e-3, 5e-2
        ref, model, params, stats = _build_pair("resnet50", num_classes=NC, M=M, seed=3)
        ref.train()
        h = SIZE // 16  # stride-16 backbone -> attention maps are 4x4

        rng = np.random.RandomState(7)
        data = []
        for s in range(STEPS):
            X = (rng.rand(B, 3, SIZE, SIZE) * 2 - 1).astype(np.float64)
            y = rng.permutation(NC)[:B].astype(np.int64)  # unique labels: the
            # torch `fc[y] +=` last-write-wins vs XLA scatter-add divergence
            # (documented in fgvc/train.py) is out of scope here
            draws = dict(
                fake1=rng.uniform(0, 2, (B, M, h, h)),
                pick1=rng.randint(0, M, (B, 2)),
                crop_theta=rng.uniform(0.4, 0.6, B),
                drop_theta=rng.uniform(0.2, 0.5, B),
                fake2=rng.uniform(0, 2, (2 * B, M, h, h)),
                pick2=rng.randint(0, M, (2 * B, 2)),
            )
            data.append((X, y, draws))

        # ---- torch side: the reference train-loop body, verbatim semantics
        ce = torch.nn.CrossEntropyLoss()
        center_loss = ref_util.CenterLoss()
        feature_center_t = torch.zeros(NC, M * 2048, dtype=torch.float64)
        opt = torch.optim.SGD(ref.parameters(), lr=LR, momentum=0.9, weight_decay=1e-5)
        losses_t = []
        for s, (X, y, draws) in enumerate(data):
            for group in opt.param_groups:  # adjust_learning (fgvc/train.py:407-414)
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
                    crop_images = ref_util.batch_augment(
                        Xt, attention_map[:, :1], mode="crop", theta=(0.4, 0.6), padding_ratio=0.1)
                    drop_images = ref_util.batch_augment(
                        Xt, attention_map[:, 1:], mode="drop", theta=(0.2, 0.5))
                aug_images = torch.cat([crop_images, drop_images], dim=0)
                y_aug = torch.cat([yt, yt], dim=0)
                y_pred_aug, y_pred_aux_aug, _, _ = ref(aug_images)
            y_pred_aux_cat = torch.cat([y_pred_aux, y_pred_aux_aug], dim=0)
            y_aux = torch.cat([yt, y_aug], dim=0)
            batch_loss = (ce(y_pred_raw, yt) / 3.0
                          + ce(y_pred_aux_cat, y_aux) * 3.0 / 3.0
                          + ce(y_pred_aug, y_aug) * 2.0 / 3.0
                          + center_loss(feature_matrix, fc_batch))
            batch_loss.backward()
            opt.step()
            losses_t.append(batch_loss.item())

        # ---- jax side: the REAL production train step, randomness injected
        from saspa_tpu.fgvc.train import TrainState, make_optimizer, make_train_step
        from saspa_tpu.utils.config import TrainConfig

        cfg = TrainConfig(net="resnet50", num_attentions=M, learning_rate=LR,
                          beta=BETA, batch_size=B, donate_state=False)
        tx = make_optimizer(cfg, num_batches_per_epoch=STEPS)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params, batch_stats=stats,
            opt_state=tx.init(params),
            feature_center=jnp.zeros((NC, M * 2048), jnp.float64),
        )
        step_fn = make_train_step(model, cfg, num_batches_per_epoch=STEPS)
        losses_j = []
        for s, (X, y, draws) in enumerate(data):
            jd = dict(
                fake1=jnp.asarray(draws["fake1"].transpose(0, 2, 3, 1)),
                pick1=jnp.asarray(draws["pick1"]),
                crop_theta=jnp.asarray(draws["crop_theta"]),
                drop_theta=jnp.asarray(draws["drop_theta"]),
                fake2=jnp.asarray(draws["fake2"].transpose(0, 2, 3, 1)),
                pick2=jnp.asarray(draws["pick2"]),
            )
            state, metrics = step_fn(
                state, jnp.asarray(X.transpose(0, 2, 3, 1)), jnp.asarray(y),
                jax.random.PRNGKey(0), draws=jd,
            )
            losses_j.append(float(metrics["loss"]))

        np.testing.assert_allclose(losses_j, losses_t, rtol=1e-6, atol=1e-8,
                                   err_msg="per-step loss trajectories diverged")
        # measured residual: 4/65536 elements at 2.2e-8 after 4 steps (pure
        # f64 accumulation-order noise; losses/params agree far tighter)
        np.testing.assert_allclose(
            np.asarray(state.feature_center),
            feature_center_t.numpy(), atol=1e-7,
            err_msg="feature-center EMA trajectories diverged")

        # final params: convert the torch side once more and compare leaves
        from tools.convert_weights import convert_cal

        sd_final = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params_final, stats_final = convert_cal(sd_final)
        flat_j = jax.tree_util.tree_leaves_with_path(state.params)
        flat_t = dict(jax.tree_util.tree_leaves_with_path(jax.tree.map(jnp.asarray, params_final)))
        assert len(flat_j) == len(flat_t)
        for path, leaf in flat_j:
            want = flat_t[path]
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(want), atol=1e-6,
                err_msg=f"param {jax.tree_util.keystr(path)} diverged after {STEPS} steps")


def test_metrics_parity_vs_reference():
    """AverageMeter / TopKAccuracyMetric / MeanClassAccuracyMetric executed
    from the reference (fgvc/util.py:31-108) on the same logits streams as
    our accumulators.  Also MEASURES the reference's in-place count clamp:
    MeanClassAccuracyMetric.__call__ does `self.counts = np.maximum(self.counts, 1)`
    inside the call (fgvc/util.py:93), so a class absent from an early batch
    keeps a phantom +1 denominator for the whole stream; we clamp at read
    time only, so single-batch values agree exactly and multi-batch values
    differ by exactly that phantom count."""
    _, ref_util, _ = _import_reference()
    from saspa_tpu.fgvc.metrics import (
        AverageMeter,
        MeanClassAccuracy,
        TopKAccuracy,
        per_class_stats,
        topk_correct,
    )

    rng = np.random.RandomState(3)

    # AverageMeter: identical running means
    ref_avg, our_avg = ref_util.AverageMeter(), AverageMeter()
    for s, n in [(3.0, 2), (1.5, 4), (0.25, 1)]:
        assert abs(ref_avg(s, n) - our_avg.update(s, n)) < 1e-12

    # TopK over a 4-batch stream: identical running percentages
    C, B = 9, 13
    ref_top = ref_util.TopKAccuracyMetric(topk=(1, 5))
    our_top = TopKAccuracy(ks=(1, 5))
    for _ in range(4):
        logits = rng.randn(B, C)
        labels = rng.randint(0, C, size=B)
        ref_res = ref_top(torch.from_numpy(logits), torch.from_numpy(labels))
        cc = np.asarray(topk_correct(jnp.asarray(logits), jnp.asarray(labels), (1, 5)))
        our_res = our_top.update(cc, B)
        np.testing.assert_allclose(np.asarray(ref_res)[:2], our_res, atol=1e-9)

    # MeanClass, single batch where every class appears: exact parity
    labels = np.concatenate([np.arange(C), rng.randint(0, C, size=8)])
    logits = rng.randn(len(labels), C)
    ref_mc = ref_util.MeanClassAccuracyMetric(num_classes=C)
    our_mc = MeanClassAccuracy(num_classes=C)
    ref_val = ref_mc(torch.from_numpy(logits), torch.from_numpy(labels))
    corr, cnt = per_class_stats(jnp.asarray(logits), jnp.asarray(labels), C)
    our_val = our_mc.update(np.asarray(corr), np.asarray(cnt))
    assert abs(ref_val - our_val) < 1e-9
    np.testing.assert_allclose(ref_mc.accuracy_per_class(), our_mc.accuracy_per_class(), atol=1e-12)
    assert abs(ref_mc.total_accuracy() - our_mc.total_accuracy()) < 1e-12

    # MeanClass, class 0 absent from batch 1 then present 5x in batch 2:
    # the reference's clamp leaves class 0 with denominator 6, ours with 5
    ref_mc2 = ref_util.MeanClassAccuracyMetric(num_classes=3)
    our_mc2 = MeanClassAccuracy(num_classes=3)
    b1_labels = np.array([1, 2, 1, 2])
    b1_logits = np.eye(3)[b1_labels] * 5.0  # all correct
    b2_labels = np.array([0, 0, 0, 0, 0])
    b2_logits = np.eye(3)[b2_labels] * 5.0  # all correct
    for lg, lb in [(b1_logits, b1_labels), (b2_logits, b2_labels)]:
        ref_v = ref_mc2(torch.from_numpy(lg), torch.from_numpy(lb))
        c, n = per_class_stats(jnp.asarray(lg), jnp.asarray(lb), 3)
        our_v = our_mc2.update(np.asarray(c), np.asarray(n))
    assert ref_mc2.counts[0] == 6 and our_mc2.counts[0] == 5  # the phantom +1
    assert abs(our_v - 100.0) < 1e-9  # ours: every prediction was correct
    assert abs(ref_v - (5 / 6 + 1 + 1) / 3 * 100.0) < 1e-9  # reference: deflated
