"""WS-DAN/CAL training: jitted data-parallel train/eval steps + epoch loop.

Behavioral spec is fgvc/train.py:339-623:
  * 3-view forward (raw, attention-crop, attention-drop), composite loss
    CE(raw)/3 + CE(aux_cat) + CE(aug)*2/3 + center loss
  * feature-center EMA fc[y] += beta * (feat - normalize(fc[y])), beta=5e-2
  * SGD momentum 0.9 wd 1e-5 (hardcoded, fgvc/train.py:312), exp LR decay
    lr = base * 0.9 ** ((epoch + iter/num_batches) / 2) per batch
  * eval: two-view TTA (raw + crop(theta=0.1, pad=0.05)) / 2
  * val every 10 epochs + tail, early stop after 20 stale validations,
    divergence abort (val acc < 2% after epoch 30)

TPU-native design: one jitted step over a data-sharded global batch.  Batch
stats and the feature-center scatter reduce over the global batch, so XLA
inserts the cross-chip collectives (this is the DP story the reference lacks
entirely — see SURVEY §2c).  Parameters are replicated; state is donated.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Iterable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from saspa_tpu.fgvc import losses as L
from saspa_tpu.fgvc.metrics import AverageMeter, MeanClassAccuracy, TopKAccuracy, per_class_stats, topk_correct
from saspa_tpu.models.cal import WSDAN_CAL
from saspa_tpu.ops.batch_augment import batch_augment
from saspa_tpu.parallel import make_mesh, replicated, shard_batch
from saspa_tpu.utils import rng as rngs
from saspa_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from saspa_tpu.utils.config import TrainConfig


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    feature_center: jax.Array  # (num_classes, M * num_features)


def make_lr_schedule(cfg: TrainConfig, num_batches_per_epoch: int) -> Callable[[jax.Array], jax.Array]:
    """lr(step) = base * rate ** ((epoch + iter/B) / duration); epoch+iter/B == step/B."""
    denom = float(max(num_batches_per_epoch, 1)) * cfg.lr_decay_duration

    def schedule(step):
        return cfg.learning_rate * cfg.lr_decay_rate ** (step / denom)

    return schedule


def make_optimizer(cfg: TrainConfig, num_batches_per_epoch: int) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg, num_batches_per_epoch)
    # torch.optim.SGD semantics: grad += wd*p; buf = m*buf + grad; p -= lr*buf
    return optax.chain(
        optax.add_decayed_weights(cfg.optimizer_weight_decay),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale_by_schedule(lambda s: -schedule(s)),
    )


def create_train_state(
    model: WSDAN_CAL,
    cfg: TrainConfig,
    num_classes: int,
    num_batches_per_epoch: int,
    init_key: jax.Array,
    sample_input: Optional[np.ndarray] = None,
) -> TrainState:
    if sample_input is None:
        sample_input = np.zeros((1, *cfg.image_size, 3), np.float32)
    variables = model.init(
        {"params": init_key}, jnp.asarray(sample_input), train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg, num_batches_per_epoch)
    opt_state = tx.init(params)
    from saspa_tpu.models.cal import cal_num_features

    feature_center = jnp.zeros(
        (num_classes, cfg.num_attentions * cal_num_features(model.net)), jnp.float32
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        feature_center=feature_center,
    )


def make_train_step(model: WSDAN_CAL, cfg: TrainConfig, num_batches_per_epoch: int):
    tx = make_optimizer(cfg, num_batches_per_epoch)
    beta = cfg.beta
    use_wsdan = not cfg.dont_use_wsdan
    use_soft_target = cfg.use_target_soft_cross_entropy

    def train_step(state: TrainState, X, y, key, y_soft=None, clip_logits=None, draws=None):
        """One optimizer step over the (possibly sharded) global batch.

        X: (B, H, W, 3) normalized float; y: (B,) int32 labels;
        y_soft: optional (B, num_classes) soft labels (CutMix);
        clip_logits: optional (B, num_classes) CLIP teacher logits for the
        soft-target CE blend (fgvc/train.py:480-494, REGULAR_CE_RATIO=0.5);
        draws: optional dict injecting every stochastic draw explicitly —
        {fake1 (B,h,w,M), pick1 (B,2), fake2 (2B,h,w,M), pick2 (2B,2),
        crop_theta (B,), drop_theta (B,)} — used by the reference-oracle
        trajectory parity test to run bit-for-bit against the executed torch
        reference with shared randomness (tests/test_reference_oracle.py)."""
        k_model1, k_model2, k_crop, k_drop = jax.random.split(key, 4)
        draws = draws or {}

        fc_batch = state.feature_center[y]
        # F.normalize semantics: x / max(||x||, 1e-12) (fgvc/train.py:457)
        fc_batch = fc_batch / jnp.maximum(jnp.linalg.norm(fc_batch, axis=-1, keepdims=True), 1e-12)

        def ce(logits, labels_hard, soft):
            if soft is None:
                return L.cross_entropy(logits, labels_hard)
            return L.cross_entropy_soft(logits, soft)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (p_raw, p_aux, feature_matrix, attention_map), mut1 = model.apply(
                variables, X, train=True, rngs_key=k_model1, mutable=["batch_stats"],
                fake_att=draws.get("fake1"), pick_idx=draws.get("pick1"),
            )

            if not use_wsdan:
                # dont_use_wsdan still carries the center term — the reference
                # computes `CE(raw) + center_loss` there, NOT plain CE
                # (fgvc/train.py:501-503)
                loss = ce(p_raw, y, y_soft) + L.center_loss(feature_matrix, fc_batch)
                return loss, (mut1["batch_stats"], p_raw, p_aux, p_raw, feature_matrix, y, y)

            att = jax.lax.stop_gradient(attention_map)
            crop_images = batch_augment(X, att[:, 0], k_crop, mode="crop", theta=(0.4, 0.6), padding_ratio=0.1,
                                        thetas=draws.get("crop_theta"))
            drop_images = batch_augment(X, att[:, 1], k_drop, mode="drop", theta=(0.2, 0.5),
                                        thetas=draws.get("drop_theta"))
            aug_images = jnp.concatenate([crop_images, drop_images], axis=0)

            variables2 = {"params": params, "batch_stats": mut1["batch_stats"]}
            (p_aug, p_aux_aug, _, _), mut2 = model.apply(
                variables2, aug_images, train=True, rngs_key=k_model2, mutable=["batch_stats"],
                fake_att=draws.get("fake2"), pick_idx=draws.get("pick2"),
            )

            y_aug = jnp.concatenate([y, y], axis=0)
            p_aux_cat = jnp.concatenate([p_aux, p_aux_aug], axis=0)
            y_aux = jnp.concatenate([y, y_aug], axis=0)
            soft_aug = None if y_soft is None else jnp.concatenate([y_soft, y_soft], axis=0)
            soft_aux = None if y_soft is None else jnp.concatenate([y_soft, soft_aug], axis=0)

            ce_term = (
                ce(p_raw, y, y_soft) / 3.0
                + ce(p_aux_cat, y_aux, soft_aux)
                + ce(p_aug, y_aug, soft_aug) * 2.0 / 3.0
            )
            loss = L.center_loss(feature_matrix, fc_batch)
            if use_soft_target and clip_logits is not None:
                # blend hard-CE with CLIP-teacher soft CE, 0.5/0.5
                REGULAR_CE_RATIO = 0.5
                logits_aug = jnp.concatenate([clip_logits, clip_logits], axis=0)
                logits_aux = jnp.concatenate([clip_logits, logits_aug], axis=0)
                soft_term = (
                    L.soft_target_cross_entropy_T(p_raw, clip_logits) / 3.0
                    + L.soft_target_cross_entropy_T(p_aux_cat, logits_aux)
                    + L.soft_target_cross_entropy_T(p_aug, logits_aug) * 2.0 / 3.0
                )
                loss = loss + REGULAR_CE_RATIO * ce_term + (1 - REGULAR_CE_RATIO) * soft_term
            else:
                loss = loss + ce_term
            return loss, (mut2["batch_stats"], p_raw, p_aux_cat, p_aug, feature_matrix, y_aux, y_aug)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        batch_stats, p_raw, p_aux_cat, p_aug, feature_matrix, y_aux, y_aug = aux

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # feature-center EMA (fgvc/train.py:457-459); scatter-add over global batch.
        # DOCUMENTED DIVERGENCE from the reference: torch's `fc[y] += delta`
        # resolves duplicate labels within a batch by LAST-WRITE-WINS, whereas
        # `.at[y].add` ACCUMULATES every duplicate's delta. Accumulation is the
        # mathematically intended EMA (each sample contributes) and is the only
        # deterministic option under XLA scatter; with shuffled batches and
        # beta=5e-2 the long-run centers agree to within EMA noise.
        delta = beta * (jax.lax.stop_gradient(feature_matrix) - fc_batch)
        feature_center = state.feature_center.at[y].add(delta)

        metrics = {
            "loss": loss,
            "raw_correct": topk_correct(p_raw, y),
            "aug_correct": topk_correct(p_aug, y_aug),
            "aux_correct": topk_correct(p_aux_cat, y_aux),
        }
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            feature_center=feature_center,
        )
        return new_state, metrics

    donate = (0,) if cfg.donate_state else ()
    return jax.jit(train_step, donate_argnums=donate)


def make_eval_step(model: WSDAN_CAL, num_classes: int):
    def eval_step(state: TrainState, X, y, key):
        """Two-view TTA eval (fgvc/train.py:604-623)."""
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        p_raw, p_aux, _, attention_map = model.apply(variables, X, train=False)
        crop_images = batch_augment(X, attention_map[:, 0], key, mode="crop", theta=0.1, padding_ratio=0.05)
        p_crop, p_aux_crop, _, _ = model.apply(variables, crop_images, train=False)
        p = (p_raw + p_crop) / 2.0
        p_aux = (p_aux + p_aux_crop) / 2.0
        loss = L.cross_entropy(p, y)
        corrects, counts = per_class_stats(p, y, num_classes)
        return {
            "loss": loss,
            "correct": topk_correct(p, y),
            "aux_correct": topk_correct(p_aux, y),
            "class_corrects": corrects,
            "class_counts": counts,
        }

    return jax.jit(eval_step)


@dataclass
class EpochLogs:
    train_loss: float = 0.0
    train_raw_acc: Tuple[float, float] = (0.0, 0.0)
    val_acc: Tuple[float, float] = (0.0, 0.0)
    test_acc: Tuple[float, float] = (0.0, 0.0)
    epoch: int = 0


class Trainer:
    """Epoch-loop orchestration over host data iterators.

    `train_iter_fn(epoch)` must yield (X, y[, y_soft]) numpy batches of the
    global batch size; X already transformed+normalized (the input pipeline
    owns augmentation)."""

    def __init__(self, cfg: TrainConfig, num_classes: int, num_batches_per_epoch: int, mesh=None):
        self.cfg = cfg
        self.num_classes = num_classes
        self.mesh = mesh if mesh is not None else make_mesh()
        self.model = WSDAN_CAL(
            num_classes=num_classes,
            M=cfg.num_attentions,
            net=cfg.net,
            dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
        )
        self.num_batches_per_epoch = num_batches_per_epoch
        init_key = rngs.stream_key(cfg.seed, "dropout")
        self.state = create_train_state(
            self.model, cfg, num_classes, num_batches_per_epoch, init_key,
            sample_input=np.zeros((1, *cfg.image_size, 3), np.float32),
        )
        if cfg.ckpt:
            restored = restore_checkpoint(
                cfg.ckpt,
                target={"params": self.state.params, "batch_stats": self.state.batch_stats},
            )
            self.state = self.state.replace(params=restored["params"])
            if "batch_stats" in restored:
                self.state = self.state.replace(batch_stats=restored["batch_stats"])
            if "feature_center" in restored:
                self.state = self.state.replace(feature_center=jnp.asarray(restored["feature_center"]))
            logging.info("restored checkpoint from %s", cfg.ckpt)

        # replicate state over the mesh
        rep = replicated(self.mesh)
        self.state = jax.device_put(self.state, rep)
        self.train_step = make_train_step(self.model, cfg, num_batches_per_epoch)
        self.eval_step = make_eval_step(self.model, num_classes)
        self.best_val_acc = float("-inf")
        self.best_val_history: list = []
        self.logs: dict = {}

    def run_epoch(self, epoch: int, batches: Iterable) -> dict:
        cfg = self.cfg
        loss_meter = AverageMeter()
        raw_acc = TopKAccuracy()
        aug_acc = TopKAccuracy()
        aux_acc = TopKAccuracy()
        t0 = time.time()
        n = 0

        # metrics are consumed one step behind the dispatch (like the
        # generation driver's double buffer): materializing step i's loss
        # would otherwise block the host until the device finishes step i,
        # serializing host batch prep with device compute
        # without WSDAN the step's "aug"/"aux" logits are just the raw B-sized
        # views, not the 2B crop+drop / 3B concat batches
        den_aug, den_aux = (1, 1) if cfg.dont_use_wsdan else (2, 3)

        def consume(m, bs):
            loss_meter.update(float(m["loss"]), 1)
            raw_acc.update(np.asarray(m["raw_correct"]), bs)
            aug_acc.update(np.asarray(m["aug_correct"]), bs * den_aug)
            aux_acc.update(np.asarray(m["aux_correct"]), bs * den_aux)

        pending = None
        for i, batch in enumerate(batches):
            X, y = batch[0], batch[1]
            y_soft = batch[2] if len(batch) > 2 else None
            clip_logits = batch[3] if len(batch) > 3 else None
            key = rngs.item_key(cfg.seed, "dropout", epoch, i)
            sharded = shard_batch(self.mesh, {"X": X, "y": y})
            self.state, m = self.train_step(
                self.state, sharded["X"], sharded["y"], key,
                None if y_soft is None else shard_batch(self.mesh, y_soft),
                None if clip_logits is None else shard_batch(self.mesh, clip_logits),
            )
            n += 1
            if pending is not None:
                consume(*pending)
            pending = (m, int(np.shape(y)[0]))
        if pending is not None:
            consume(*pending)
        dt = time.time() - t0
        out = {
            "epoch": epoch,
            "train_loss": loss_meter.value,
            "train_raw_acc": raw_acc.value.tolist(),
            "train_aug_acc": aug_acc.value.tolist(),
            "train_aux_acc": aux_acc.value.tolist(),
            "epoch_time": dt,
            "steps": n,
        }
        logging.info(
            "Epoch %03d: loss %.4f, raw acc (%.2f, %.2f), %d steps, %.1fs",
            epoch + 1, out["train_loss"], *out["train_raw_acc"][:2], n, dt,
        )
        self.logs.update({f"train_{k}": v for k, v in out.items()})
        return out

    def evaluate(self, batches: Iterable, epoch: int = 0, is_test: bool = False) -> dict:
        loss_meter = AverageMeter()
        acc = TopKAccuracy()
        mca = MeanClassAccuracy(self.num_classes)
        def consume(m, bs):
            loss_meter.update(float(m["loss"]), 1)
            acc.update(np.asarray(m["correct"]), bs)
            mca.update(np.asarray(m["class_corrects"]), np.asarray(m["class_counts"]))

        pending = None  # consume one step behind dispatch (see run_epoch)
        for i, (X, y) in enumerate(batches):
            key = rngs.item_key(self.cfg.seed, "attention_pick", epoch, i)
            sharded = shard_batch(self.mesh, {"X": X, "y": y})
            m = self.eval_step(self.state, sharded["X"], sharded["y"], key)
            if pending is not None:
                consume(*pending)
            pending = (m, int(np.shape(y)[0]))
        if pending is not None:
            consume(*pending)
        tag = "test" if is_test else "val"
        out = {f"{tag}_loss": loss_meter.value, f"{tag}_topk_accuracy": acc.value.tolist(), f"{tag}_mean_class_acc": mca.value}
        # per-class accuracies ride along for the plot hook (runner strips
        # the key from metrics.jsonl — 100+ entries per line is log noise)
        out[f"{tag}_acc_per_class"] = mca.accuracy_per_class().tolist()
        logging.info("%s: loss %.4f acc (%.2f, %.2f)", tag, loss_meter.value, *acc.value[:2])
        self.logs.update(out)
        return out

    def maybe_save_best(self, val_acc: float, path: str):
        if val_acc > self.best_val_acc:
            self.best_val_acc = val_acc
            save_checkpoint(
                path,
                self.state.params,
                feature_center=self.state.feature_center,
                opt_state=None,
                logs=self.logs,
                batch_stats=self.state.batch_stats,
            )
            logging.info("saved best checkpoint (val acc %.2f) to %s", val_acc, path)

    def should_validate(self, epoch: int) -> bool:
        cfg = self.cfg
        return epoch % cfg.val_every == 0 or epoch >= cfg.epochs - 1 or epoch == cfg.epochs - 5

    def should_stop_early(self) -> bool:
        """True when the best val acc hasn't improved in the last
        `early_stop_patience` validations.

        Note a deliberate divergence: the reference's comparison
        (fgvc/train.py:394-395, `improved_acc_in_last_20_val_epochs < ...`
        over a running-max history) can never fire because a running max is
        monotone — its early stop is dead code.  We implement the stated
        intent instead: stop once `patience` consecutive validations bring
        no new best.

        Reachability: patience counts VALIDATIONS.  Under the shipped cadence
        (val every 10 epochs + tail, ~16 validations in 140 epochs) the
        default patience 20 never accumulates — intentionally conservative,
        since the reference never early-stops in any shipped recipe and
        firing where it doesn't would diverge from the published training
        budget.  Long/custom runs (epochs > ~210, or a smaller val_every)
        do reach it; lower early_stop_patience to make it eager."""
        h = self.best_val_history
        p = self.cfg.early_stop_patience
        return len(h) > p and h[-1] <= h[-(p + 1)]
