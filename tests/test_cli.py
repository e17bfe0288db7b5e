import subprocess
import sys

import pytest


def _run(args):
    return subprocess.run(
        [sys.executable, "-m", "saspa_tpu.cli", *args],
        capture_output=True, text=True, cwd="/root/repo",
    )


def test_help_lists_subcommands():
    r = _run(["--help"])
    assert r.returncode == 0
    for sub in ("gen", "filter", "train", "eval-biased", "merge-jsons"):
        assert sub in r.stdout


def test_train_flags_match_reference_names():
    r = _run(["train", "--help"])
    assert r.returncode == 0
    # flag names from fgvc/train.py:46-80
    for flag in (
        "--aug_json", "--aug_sample_ratio", "--limit_aug_per_image",
        "--stop_aug_after_epoch", "--special_aug", "--train_sample_ratio",
        "--dont_use_wsdan", "--use_cutmix", "--use_target_soft_cross_entropy",
        "--few_shot", "--gpu_id", "--logdir", "--net",
    ):
        assert flag in r.stdout, flag


def test_gen_presets_listed():
    r = _run(["gen", "--help"])
    assert "real_guidance" in r.stdout and "alia" in r.stdout


def test_unknown_flag_fails_cleanly():
    r = _run(["train", "--not_a_flag"])
    assert r.returncode == 2
    assert "unrecognized arguments" in r.stderr


def test_merge_jsons_cli(tmp_path):
    import json

    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({"x.jpg": ["/1.png"]}))
    b.write_text(json.dumps({"x.jpg": ["/2.png"]}))
    out = tmp_path / "m.json"
    r = _run(["merge-jsons", "--jsons", str(a), str(b), "--output", str(out)])
    assert r.returncode == 0, r.stderr
    assert json.load(open(out))["x.jpg"] == ["/1.png", "/2.png"]


def test_train_weights_dir_sets_env(monkeypatch):
    # regression: cmd_train touches os.environ (cli.py) — a missing
    # module-level `import os` only surfaced when --weights_dir was passed
    import os

    from saspa_tpu import cli

    seen = {}
    monkeypatch.setattr(
        "saspa_tpu.fgvc.runner.run_training", lambda args: seen.update(vars(args))
    )
    monkeypatch.delenv("SASPA_WEIGHTS_DIR", raising=False)
    cli.main(["train", "--dataset", "planes", "--weights_dir", "/tmp/wd"])
    assert os.environ.get("SASPA_WEIGHTS_DIR") == "/tmp/wd"
    assert seen["dataset"] == "planes"


def test_prep_subcommands_exist():
    r = _run(["prep-captions", "--help"])
    assert r.returncode == 0 and "--images" in r.stdout
    r = _run(["prep-prompts", "--help"])
    assert r.returncode == 0 and "--all_classes" in r.stdout
