"""Orbax checkpointing for the training stage.

Checkpoint contract mirrors the reference's dict
{'logs': dict, 'state_dict': params, 'feature_center': array}
(fgvc/util.py:196-203, fgvc/train.py:287-304) — we store
{params, opt_state, feature_center, logs} and restore size-tolerantly
(shape-mismatched leaves are skipped, like fgvc/models/cal.py:215-228's
load_state_dict, so a fine-tune head swap keeps working).
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params, feature_center=None, opt_state=None, logs: Optional[dict] = None,
                    batch_stats=None):
    """Save with orbax; logs go to a sidecar json for easy inspection.

    batch_stats (BatchNorm running statistics) are part of the model the same
    way the reference's state_dict includes them (fgvc/util.py:196-203) —
    evaluating a restored model without them runs init-value BN stats."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    payload = {"params": _to_host(params)}
    if feature_center is not None:
        payload["feature_center"] = np.asarray(feature_center)
    if batch_stats is not None and jax.tree_util.tree_leaves(batch_stats):
        payload["batch_stats"] = _to_host(batch_stats)
    if opt_state is not None:
        payload["opt_state"] = _to_host(opt_state)

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if logs is not None:
        with open(path + ".logs.json", "w") as f:
            json.dump(_jsonable(logs), f)


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.ndarray, jax.Array)):
        return np.asarray(obj).tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


def restore_checkpoint(path: str, target: Optional[dict] = None, strict: bool = False) -> dict:
    """Restore a checkpoint saved by save_checkpoint.

    If `target` (a matching pytree of abstract or concrete arrays) is given,
    restore is size-tolerant: leaves whose shapes mismatch keep the target's
    value and a warning is logged (parity with the reference's forgiving
    load_state_dict).  strict=True raises instead (torch's default
    load_state_dict) — evaluation tools want a loud failure, not plausible
    garbage from randomly initialized mismatched leaves."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)
    logs_path = path + ".logs.json"
    if os.path.exists(logs_path):
        with open(logs_path) as f:
            restored["logs"] = json.load(f)

    if target is not None and strict:
        # subtree PRESENCE must agree, both ways: a checkpoint with no
        # batch_stats validated against a BN model would otherwise pass
        # "strict" and evaluate on init-value running statistics
        for key in ("params", "batch_stats"):
            if key in target and key not in restored:
                raise ValueError(
                    f"strict checkpoint restore failed: target expects "
                    f"'{key}' but the checkpoint has none"
                )
            if key in restored and key not in target:
                raise ValueError(
                    f"strict checkpoint restore failed: checkpoint carries "
                    f"'{key}' but the target does not — pass it in the "
                    f"target so it is shape-validated"
                )
    if target is not None and "params" in restored and "params" in target:
        restored["params"] = _merge_size_tolerant(target["params"], restored["params"], strict=strict)
    if target is not None and "batch_stats" in restored and "batch_stats" in target:
        restored["batch_stats"] = _merge_size_tolerant(
            target["batch_stats"], restored["batch_stats"], strict=strict
        )
    return restored


def _merge_size_tolerant(target, loaded, strict: bool = False):
    flat_t = _flatten("", target)
    flat_l = _flatten("", loaded)
    out = dict(flat_t)
    skipped = []
    for k, v in flat_l.items():
        if k in flat_t and np.shape(flat_t[k]) == np.shape(v):
            out[k] = v
        else:
            skipped.append(k)
    missing = [k for k in flat_t if k not in flat_l]
    if strict and (skipped or missing):
        raise ValueError(
            f"strict checkpoint restore failed: {len(skipped)} mismatched keys "
            f"{skipped[:5]}, {len(missing)} missing keys {missing[:5]} — the "
            "model config (net/M/image_size) does not match the checkpoint"
        )
    if skipped:
        logging.warning("checkpoint restore skipped %d mismatched keys: %s", len(skipped), skipped[:10])
    return _unflatten(out)


def _flatten(prefix, tree):
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(f"{prefix}/{k}" if prefix else str(k), v))
    else:
        flat[prefix] = tree
    return flat


def _unflatten(flat):
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree
