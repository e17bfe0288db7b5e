"""Measured training-equivalence for the two documented train-loop
divergences from the reference (VERDICT r3 weak item 6 -> r4 item 7):

1. feature-center EMA, scatter-ACCUMULATE (ours, `.at[y].add`) vs torch's
   last-write-wins on duplicate labels (`fc[y] += delta`,
   /root/reference/fgvc/train.py:457-459) — a synthetic few-hundred-step A/B
   with duplicate-label batches asserts the long-run center trajectories
   agree to within EMA noise.
2. early stop: the reference's comparison over a running-max history
   (/root/reference/fgvc/train.py:394-395) is dead code (a running max is
   monotone); ours stops after `patience` stale validations.  A cadence
   simulation proves (a) the reference rule never fires even on a hard
   plateau, (b) ours fires exactly when intended, and (c) under the shipped
   val cadence + epoch budget ours cannot fire either — so the published
   training budget is preserved.
"""

import numpy as np

from saspa_tpu.fgvc.train import Trainer


BETA = 5e-2  # config.beta, the reference's EMA rate
NUM_CLASSES = 7
FEAT = 24


def _ema_step_accumulate(fc, y, feats, beta=BETA):
    """Our rule: normalize-gather, then scatter-ADD every sample's delta."""
    fcb = fc[y]
    fcb = fcb / (np.linalg.norm(fcb, axis=-1, keepdims=True) + 1e-12)
    delta = beta * (feats - fcb)
    out = fc.copy()
    np.add.at(out, y, delta)  # numpy scatter-add == jnp .at[y].add
    return out


def _ema_step_last_write(fc, y, feats, beta=BETA):
    """torch semantics: `fc[y] += beta * (feats - normalize(fc[y]))` gathers
    against the OLD fc, then index_put_ WITHOUT accumulate — duplicate labels
    collide and the last write wins."""
    fcb = fc[y]
    fcb = fcb / (np.linalg.norm(fcb, axis=-1, keepdims=True) + 1e-12)
    delta = beta * (feats - fcb)
    out = fc.copy()
    for i in range(len(y)):  # in-order writes: later duplicates overwrite
        out[y[i]] = fc[y[i]] + delta[i]
    return out


def _unit(fc):
    n = np.linalg.norm(fc, axis=-1, keepdims=True)
    return fc / np.where(n == 0, 1, n)


def test_feature_center_accumulate_vs_last_write_bounded():
    """300 steps, batch 16 over 7 classes (duplicates guaranteed by
    pigeonhole), class-conditional Gaussian features.

    Measured structure of this update (both sides): because the delta
    subtracts the NORMALIZED center, not the center itself, the raw center
    norm grows without bound (~beta*(|mu|-1) per occurrence) and only its
    DIRECTION converges.  Everything downstream consumes the direction only
    (center_loss and the EMA both normalize fc[y] first, fgvc/train.py:117-118
    here, reference train.py:457), so equivalence is asserted on (a) final
    directions and (b) the normalized-center trajectory.  Raw norms legally
    differ by the duplicate-count factor (~16/7 here): accumulate applies
    every duplicate's beta-step, last-write applies one."""
    rng = np.random.RandomState(0)
    mu = rng.randn(NUM_CLASSES, FEAT) * 2.0  # well-separated class means

    fc_acc = np.zeros((NUM_CLASSES, FEAT))
    fc_lww = np.zeros((NUM_CLASSES, FEAT))
    gap_hist = []
    for step in range(300):
        y = rng.randint(0, NUM_CLASSES, size=16)
        feats = mu[y] + rng.randn(16, FEAT) * 0.3
        fc_acc = _ema_step_accumulate(fc_acc, y, feats)
        fc_lww = _ema_step_last_write(fc_lww, y, feats)
        gap_hist.append(np.linalg.norm(_unit(fc_acc) - _unit(fc_lww), axis=-1).max())

    cos = np.sum(_unit(fc_acc) * _unit(fc_lww), axis=-1)
    assert cos.min() > 0.999, f"center directions diverged: {cos}"
    gap = np.asarray(gap_hist)
    # post-warm-up the consumed quantity stays within EMA noise and the
    # disagreement SHRINKS over time (no compounding divergence)
    assert gap[-50:].max() < 0.05, f"normalized-center gap {gap[-50:].max():.4f}"
    assert gap[-50:].max() <= gap[50:100].max() + 1e-9, "gap is growing over time"
    # raw norms differ by roughly the expected duplicate factor (16/7 ~ 2.3) —
    # loose bounds; the point is it is a bounded RATE difference, not drift
    ratio = np.linalg.norm(fc_acc, axis=-1) / np.linalg.norm(fc_lww, axis=-1)
    assert (1.2 < ratio).all() and (ratio < 4.0).all(), ratio


def test_feature_center_identical_without_duplicates():
    """With unique labels per batch the two rules are exactly the same
    update — bit-identical trajectories (the divergence is ONLY the
    duplicate-resolution semantics)."""
    rng = np.random.RandomState(1)
    mu = rng.randn(NUM_CLASSES, FEAT)
    fc_a = np.zeros((NUM_CLASSES, FEAT))
    fc_b = np.zeros((NUM_CLASSES, FEAT))
    for step in range(50):
        y = rng.permutation(NUM_CLASSES)[:5]  # unique labels
        feats = mu[y] + rng.randn(5, FEAT) * 0.3
        fc_a = _ema_step_accumulate(fc_a, y, feats)
        fc_b = _ema_step_last_write(fc_b, y, feats)
        np.testing.assert_array_equal(fc_a, fc_b)


# ---------------------------------------------------------------- early stop

def _reference_rule_fires(best_val_acc_list):
    """The reference's literal condition (fgvc/train.py:394-395)."""
    return (
        len(best_val_acc_list) > 20
        and best_val_acc_list[-1] < best_val_acc_list[-20]
    )


def _running_best(accs):
    out, best = [], -np.inf
    for a in accs:
        best = max(best, a)
        out.append(best)
    return out


def test_reference_early_stop_is_dead_code():
    """Even a 200-validation hard plateau never fires the reference's rule:
    the history it compares is a running max, which is monotone
    non-decreasing, so h[-1] < h[-20] is unsatisfiable."""
    rng = np.random.RandomState(2)
    # adversarial mixes: improve-then-plateau, noise, monotone decline
    for accs in [
        [0.5 + 0.001 * min(i, 10) for i in range(200)],      # plateau at 11
        list(rng.rand(200)),                                  # pure noise
        [0.9 - 0.004 * i for i in range(200)],                # decline
    ]:
        h = _running_best(accs)
        assert not any(_reference_rule_fires(h[: i + 1]) for i in range(len(h)))


def _ours_fires_at(trainer_cls, accs, patience):
    t = trainer_cls.__new__(trainer_cls)  # rule-only instance, no model init

    class _Cfg:
        early_stop_patience = patience

    t.cfg = _Cfg()
    t.best_val_history = []
    best = -np.inf
    for i, a in enumerate(accs):
        best = max(best, a)
        t.best_val_history.append(best)
        if t.should_stop_early():
            return i
    return None


def test_our_early_stop_fires_exactly_on_stale_patience():
    accs = [0.5, 0.6, 0.7] + [0.65] * 30  # best stops improving at val 2
    # fires at the first validation where the last `patience` brought no new
    # best: index 2 + patience
    assert _ours_fires_at(Trainer, accs, patience=5) == 7
    assert _ours_fires_at(Trainer, accs, patience=20) == 22
    # an always-improving run never stops
    assert _ours_fires_at(Trainer, [0.1 + 0.004 * i for i in range(100)], 5) is None


def test_our_early_stop_cannot_fire_under_shipped_cadence():
    """Shipped recipes: val every 10 epochs + the tail validations, 140-epoch
    budget => ~16 validations total; default patience 20 needs 21 history
    entries, so the rule is intentionally unreachable there (the reference
    never early-stops in any shipped recipe — firing would change the
    published training budget)."""
    epochs, val_every = 140, 10
    n_vals = sum(
        1 for e in range(epochs)
        if e % val_every == 0 or e >= epochs - 1 or e == epochs - 5
    )
    assert n_vals <= 20
    accs = [0.5] * n_vals  # hardest case: stale from the start
    assert _ours_fires_at(Trainer, accs, patience=20) is None
