"""Best per-dataset training recipes + sweep runner.

Encodes the shell-script sweep recipes (fgvc/trainings_scripts/
consecutive_runs_aug.sh:17-43, consecutive_runs_aug_few_shot.sh:15-41,
consecutive_runs_best_classic_aug.sh) as data: per-dataset special_aug +
aug_sample_ratio (planes classic/0.4, cars classic-cutmix/0.4,
compcars-parts randaug-cutmix/0.4, cub classic/0.1, dtd classic-cutmix/0.4),
limit_aug_per_image=2, seeds 1-3; few-shot K in {4,8,12,16} at ratio 0.6.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

BEST_RECIPES = {
    "planes": {"special_aug": "classic", "aug_sample_ratio": 0.4},
    "cars": {"special_aug": "classic-cutmix", "aug_sample_ratio": 0.4},
    "compcars-parts": {"special_aug": "randaug-cutmix", "aug_sample_ratio": 0.4},
    "cub": {"special_aug": "classic", "aug_sample_ratio": 0.1},
    "dtd": {"special_aug": "classic-cutmix", "aug_sample_ratio": 0.4},
    "planes_biased": {"special_aug": "classic", "aug_sample_ratio": 0.4},
}

FEW_SHOT_KS = (4, 8, 12, 16)
FEW_SHOT_AUG_RATIO = 0.6
LIMIT_AUG_PER_IMAGE = 2
SWEEP_SEEDS = (1, 2, 3)


@dataclass
class SweepRun:
    dataset: str
    seed: int
    special_aug: str
    aug_sample_ratio: float
    limit_aug_per_image: int = LIMIT_AUG_PER_IMAGE
    aug_json: Optional[str] = None
    few_shot: Optional[int] = None
    net: str = "resnet50"
    run_name: str = "saspa"

    @property
    def logdir(self) -> str:
        parts = [self.run_name, self.net, self.special_aug, f"ratio_{self.aug_sample_ratio}", f"seed_{self.seed}"]
        if self.few_shot:
            parts.insert(1, f"few_shot_{self.few_shot}")
        return f"logs/{self.dataset}/{'-'.join(parts)}"


def sweep_runs(
    dataset: str,
    aug_json: Optional[str],
    net: str = "resnet50",
    seeds: Sequence[int] = SWEEP_SEEDS,
    few_shot: bool = False,
    run_name: str = "saspa",
) -> List[SweepRun]:
    recipe = BEST_RECIPES[dataset]
    runs = []
    if few_shot:
        for k in FEW_SHOT_KS:
            for seed in seeds:
                runs.append(SweepRun(
                    dataset=dataset, seed=seed, special_aug=recipe["special_aug"],
                    aug_sample_ratio=FEW_SHOT_AUG_RATIO, aug_json=aug_json,
                    few_shot=k, net=net, run_name=run_name,
                ))
    else:
        for seed in seeds:
            runs.append(SweepRun(
                dataset=dataset, seed=seed, special_aug=recipe["special_aug"],
                aug_sample_ratio=recipe["aug_sample_ratio"], aug_json=aug_json,
                net=net, run_name=run_name,
            ))
    return runs


def run_sweep(dataset: str, aug_json: Optional[str], **kw):
    """Sequential sweep (the reference runs these as consecutive shell loops)."""
    from saspa_tpu.utils.config import TrainConfig  # noqa: F401  (typing aid)

    results = {}
    for run in sweep_runs(dataset, aug_json, **kw):
        from argparse import Namespace

        from saspa_tpu.fgvc.runner import run_training

        args = Namespace(
            dataset=run.dataset, seed=run.seed, logdir=run.logdir,
            epochs=None, learning_rate=None, batch_size=None, weight_decay=None,
            net=run.net, aug_json=run.aug_json, aug_sample_ratio=run.aug_sample_ratio,
            limit_aug_per_image=run.limit_aug_per_image, stop_aug_after_epoch=None,
            special_aug=run.special_aug, train_sample_ratio=1.0,
            dont_use_wsdan=False, use_cutmix=False, use_target_soft_cross_entropy=False,
            few_shot=run.few_shot, ckpt=None, wandb=False,
        )
        results[run.logdir] = run_training(args)
    return results
