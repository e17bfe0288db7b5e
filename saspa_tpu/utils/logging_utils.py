"""Dual console+file logging with timestamped run dirs.

Mirrors the reference's two init_logging variants (all_utils/utils.py:593-612,
fgvc/train.py:118-142): given `logs/<dataset>/<run_name>` produces
`logs/<dataset>/<date>_<run_name>` with a `log.log` inside.
"""

from __future__ import annotations

import datetime
import logging
import os
from pathlib import Path

_FMT = "%(asctime)s %(levelname)s %(message)s"


def init_logging(logdir: str | None = None, logfile: str | None = None) -> str:
    assert logdir or logfile, "logdir or logfile must be provided"
    date_uid = datetime.datetime.now().strftime("%Y_%m%d_%H%M_%S")

    for handler in logging.root.handlers[:]:
        logging.root.removeHandler(handler)

    if logdir:
        p = Path(logdir)
        logdir = str(p.parent / f"{date_uid}_{p.name}")
        os.makedirs(logdir, exist_ok=True)
        log_file = os.path.join(logdir, "log.log")
        ret = logdir
    else:
        parent = Path(logfile).parent
        parent.mkdir(parents=True, exist_ok=True)
        log_file = str(parent / f"{Path(logfile).stem}_{date_uid}{Path(logfile).suffix}")
        ret = str(parent)

    logging.basicConfig(format=_FMT, level=logging.INFO)
    fh = logging.FileHandler(log_file, mode="w")
    fh.setFormatter(logging.Formatter(_FMT))
    logging.getLogger().addHandler(fh)
    logging.info(f"Logging to {log_file}")
    return ret


class MetricsWriter:
    """Minimal metrics sink: appends JSON lines; optionally mirrors to wandb
    when available (reference hardcodes project CAL-aug-exp-new_datasets,
    fgvc/train.py:163; we keep wandb optional since it may not be installed)."""

    def __init__(self, out_dir: str, use_wandb: bool = False, project: str = "CAL-aug-exp-new_datasets", run_name: str = ""):
        import json

        self._json = json
        self.path = os.path.join(out_dir, "metrics.jsonl")
        os.makedirs(out_dir, exist_ok=True)
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project, name=run_name)
                self._wandb = wandb
            except Exception:
                logging.info("wandb unavailable; metrics go to %s only", self.path)

    def log(self, metrics: dict):
        clean = {k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()}
        with open(self.path, "a") as f:
            f.write(self._json.dumps(clean) + "\n")
        if self._wandb is not None:
            self._wandb.log(clean)
