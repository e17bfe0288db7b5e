"""Full training orchestration (fgvc/train.py main() parity).

Wires CLI args -> per-dataset config -> datasets + input pipeline -> Trainer
epoch loop with the reference's cadence: val every 10 epochs + tail, best-val
checkpointing with feature_center, early stop after 20 stale validations,
divergence abort (val acc < 2% after epoch 30, fgvc/train.py:699-701),
stop_aug_after_epoch kill-switch, optional CLIP soft-target distillation.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np


def run_training(args) -> dict:
    from saspa_tpu.data.datasets import get_datasets
    from saspa_tpu.data.pipeline import InputPipeline
    from saspa_tpu.fgvc.train import Trainer
    from saspa_tpu.utils.config import get_train_config
    from saspa_tpu.utils.logging_utils import MetricsWriter, init_logging

    cfg = get_train_config(
        args.dataset,
        seed=args.seed,
        epochs=args.epochs,
        learning_rate=args.learning_rate,
        batch_size=args.batch_size,
        weight_decay=args.weight_decay,
        net=args.net,
        aug_json=args.aug_json,
        aug_sample_ratio=args.aug_sample_ratio,
        limit_aug_per_image=args.limit_aug_per_image,
        stop_aug_after_epoch=args.stop_aug_after_epoch,
        special_aug=args.special_aug,
        train_sample_ratio=args.train_sample_ratio,
        dont_use_wsdan=args.dont_use_wsdan or None,
        use_cutmix=args.use_cutmix or None,
        use_target_soft_cross_entropy=args.use_target_soft_cross_entropy or None,
        few_shot=args.few_shot,
        ckpt=getattr(args, "ckpt", None),
    )
    if getattr(args, "image_size", None):  # test/debug hook; presets otherwise
        cfg = cfg.replace(image_size=tuple(args.image_size))
    save_dir = init_logging(logdir=args.logdir)
    cfg = cfg.replace(save_dir=save_dir)
    metrics = MetricsWriter(save_dir, use_wandb=getattr(args, "wandb", False), run_name=Path(save_dir).name)
    logging.info("train config: %s", cfg)

    train_ds, val_ds, test_ds, info = get_datasets(
        cfg.dataset,
        resize=cfg.image_size,
        train_sample_ratio=cfg.train_sample_ratio,
        aug_json=cfg.aug_json,
        aug_sample_ratio=cfg.aug_sample_ratio,
        limit_aug_per_image=cfg.limit_aug_per_image,
        special_aug=cfg.special_aug,
        use_cutmix=cfg.use_cutmix,
        few_shot=cfg.few_shot,
        seed=cfg.seed,
    )

    train_pipe = InputPipeline(
        train_ds, batch_size=cfg.batch_size, resize=cfg.image_size,
        train_transform=info["train_transform"], use_cutmix=info["use_cutmix"],
        num_classes=info["num_classes"], seed=cfg.seed, num_threads=cfg.workers * 2,
    )
    # drop_last=True at eval is reference behavior (fgvc/train.py:316-319:
    # val/test DataLoaders use batch_size*2 with drop_last=True, so up to
    # 2*bs-1 tail samples are excluded from reported accuracy there too)
    val_pipe = InputPipeline(val_ds, batch_size=cfg.batch_size * 2, resize=cfg.image_size, drop_last=True)
    test_pipe = InputPipeline(test_ds, batch_size=cfg.batch_size * 2, resize=cfg.image_size, drop_last=True) if len(test_ds) else None
    if len(val_pipe) == 0:
        logging.warning(
            "val split (%d samples) smaller than the eval batch %d — drop_last "
            "yields ZERO val batches; val metrics will read 0 and the "
            "divergence abort is disabled", len(val_ds), cfg.batch_size * 2,
        )
    if len(train_pipe) == 0:
        # same drop_last flaw exists in the reference (its train DataLoader
        # drops the only partial batch too), but training zero steps per
        # epoch is never intended — fail instead of checkpointing an
        # untrained model (hit by small few_shot K with large batch sizes)
        raise ValueError(
            f"train split ({len(train_ds)} samples) smaller than batch_size "
            f"{cfg.batch_size} — zero train batches per epoch; lower "
            f"--batch_size"
        )

    num_batches = max(len(train_pipe), 1)
    trainer = Trainer(cfg, num_classes=info["num_classes"], num_batches_per_epoch=num_batches)

    clip_scorer = None
    if cfg.use_target_soft_cross_entropy:
        clip_scorer = _make_clip_teacher(cfg.dataset, info["classes"])

    # per-class-accuracy plot hook (reference fgvc/util.py:112-135; its call
    # sites are commented out there — here a flag)
    plot_per_class = getattr(args, "plot_per_class_acc", False)
    train_samples_per_class: dict = {}
    if plot_per_class:
        from collections import Counter

        counts = Counter(train_ds.labels)
        train_samples_per_class = {c: counts.get(c, 0) for c in range(info["num_classes"])}

    def _log_eval(ev: dict, epoch: int, tag: str):
        metrics.log({"epoch": epoch, **{
            k: (v[0] if isinstance(v, list) else v) for k, v in ev.items()
            if not k.endswith("_acc_per_class")  # 100+ floats = jsonl noise
        }})
        if plot_per_class:
            from saspa_tpu.fgvc.plots import plot_samples_per_class_vs_accuracy

            acc = ev[f"{tag}_acc_per_class"]
            plot_samples_per_class_vs_accuracy(
                train_samples_per_class, dict(enumerate(acc)), epoch,
                os.path.join(save_dir, "plots", tag),
            )

    ckpt_path = os.path.join(save_dir, cfg.model_name)
    for epoch in range(cfg.epochs):
        if cfg.aug_json and cfg.stop_aug_after_epoch and epoch >= cfg.stop_aug_after_epoch:
            train_ds.stop_aug = True
            logging.info("Reached stop_aug_after_epoch=%d, stopped augmentation", cfg.stop_aug_after_epoch)

        def batches():
            for X, y, y_soft in train_pipe.iter_train(epoch):
                if clip_scorer is not None:
                    yield X, y, y_soft, clip_scorer(X)
                else:
                    yield X, y, y_soft

        out = trainer.run_epoch(epoch, batches())
        metrics.log({"epoch": epoch, **{k: v for k, v in out.items() if np.isscalar(v)}})

        if trainer.should_validate(epoch):
            ev = trainer.evaluate(val_pipe.iter_eval(), epoch=epoch, is_test=False)
            val_acc = ev["val_topk_accuracy"][0]
            trainer.best_val_history.append(max(val_acc, trainer.best_val_acc))
            trainer.maybe_save_best(val_acc, ckpt_path)
            _log_eval(ev, epoch, "val")
            if test_pipe is not None:
                et = trainer.evaluate(test_pipe.iter_eval(), epoch=epoch, is_test=True)
                _log_eval(et, epoch, "test")
            # divergence abort (fgvc/train.py:699-701); disabled when the val
            # pipe is empty (acc always 0 then — a config artifact, not
            # divergence)
            if epoch > 30 and trainer.best_val_acc < 2 and len(val_pipe) > 0:
                logging.info("Validation accuracy is too low, stopping training")
                break

        if trainer.should_stop_early():
            logging.info("Validation accuracy has not improved in the last %d validations, stopping", cfg.early_stop_patience)
            break

    return trainer.logs


def _make_clip_teacher(dataset: str, classnames):
    """CLIP zero-shot teacher logits for the soft-target CE path
    (fgvc/train.py:256-281). Text features precomputed once.

    `classnames` must be in LABEL-ID order (class j == student logit column j)
    so teacher and student columns align in soft_target_cross_entropy_T.
    DOCUMENTED DIVERGENCE: the reference builds prompts from
    `get_classes()` = `list(set(...))` (all_utils/dataset_utils.py:217-219) —
    an arbitrary hash order that does NOT match the student's label ids, so
    its teacher columns are scrambled; we implement the stated intent."""
    import jax.numpy as jnp

    from saspa_tpu.filters.clip_filters import CLIPScorer

    assert dataset in ("planes", "cars"), "soft-target CE supports planes/cars (reference parity)"
    kind = "aircraft" if dataset == "planes" else "car"
    prompts = [f"a photo of a {n}, a type of {kind}." for n in classnames]
    scorer = CLIPScorer("rn50")
    txt = scorer.text_features(prompts)

    def teacher(X):
        # the reference feeds the ImageNet-normalized train batch straight into
        # CLIP (fgvc/train.py:489) — reproduce that, features from the batch as-is
        import numpy as np

        feats = np.asarray(scorer._encode_images(jnp.asarray(X)), np.float32)
        return scorer.logits(feats, txt)

    return teacher
