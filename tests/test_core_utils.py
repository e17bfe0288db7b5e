import jax
import numpy as np

from saspa_tpu.parallel.mesh import pad_to_multiple
from saspa_tpu.utils import rng as rngs
from saspa_tpu.utils.checkpoint import _merge_size_tolerant, restore_checkpoint, save_checkpoint


def test_rng_item_keys_are_stable_and_distinct():
    a = rngs.item_key(1, "noise", 5, 0)
    b = rngs.item_key(1, "noise", 5, 0)
    c = rngs.item_key(1, "noise", 5, 1)
    d = rngs.item_key(2, "noise", 5, 0)
    e = rngs.item_key(1, "prompt_choice", 5, 0)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    for other in (c, d, e):
        assert not np.array_equal(np.asarray(a), np.asarray(other))


def test_host_uniform_deterministic_and_spread():
    vals = [rngs.host_uniform(1, "aug_swap", i) for i in range(200)]
    assert vals == [rngs.host_uniform(1, "aug_swap", i) for i in range(200)]
    assert all(0 <= v < 1 for v in vals)
    assert 0.4 < np.mean(vals) < 0.6


def test_host_choice_bounds():
    picks = [rngs.host_choice(7, 3, "prompt_choice", i) for i in range(100)]
    assert set(picks) <= set(range(7))
    assert len(set(picks)) > 3  # spread


def test_pad_to_multiple():
    assert pad_to_multiple(13, 8) == 16
    assert pad_to_multiple(16, 8) == 16
    assert pad_to_multiple(1, 8) == 8


def test_checkpoint_size_tolerant_merge():
    target = {"a": np.zeros((2, 2)), "b": {"c": np.zeros(3)}}
    loaded = {"a": np.ones((2, 2)), "b": {"c": np.ones(5)}}  # c mismatched
    merged = _merge_size_tolerant(target, loaded)
    assert np.array_equal(merged["a"], np.ones((2, 2)))  # loaded
    assert np.array_equal(merged["b"]["c"], np.zeros(3))  # kept target


def test_checkpoint_roundtrip(tmp_path):
    params = {"layer": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    save_checkpoint(str(tmp_path / "ck"), params, feature_center=np.ones(4), logs={"epoch": 3})
    r = restore_checkpoint(str(tmp_path / "ck"))
    assert np.array_equal(r["params"]["layer"]["kernel"], params["layer"]["kernel"])
    assert np.array_equal(r["feature_center"], np.ones(4))
    assert r["logs"]["epoch"] == 3


def test_checkpoint_roundtrip_batch_stats(tmp_path):
    """BatchNorm running stats are model state (reference state_dict includes
    them, fgvc/util.py:196-203) — a restore without them evaluates against
    init-value BN statistics."""
    params = {"layer": {"kernel": np.ones((2, 2), np.float32)}}
    bs = {"layer": {"mean": np.full(2, 0.5, np.float32), "var": np.full(2, 2.0, np.float32)}}
    save_checkpoint(str(tmp_path / "ck"), params, batch_stats=bs)
    r = restore_checkpoint(
        str(tmp_path / "ck"),
        target={"params": params, "batch_stats": {"layer": {"mean": np.zeros(2), "var": np.ones(2)}}},
    )
    assert np.array_equal(r["batch_stats"]["layer"]["mean"], bs["layer"]["mean"])
    assert np.array_equal(r["batch_stats"]["layer"]["var"], bs["layer"]["var"])
    # old checkpoints without batch_stats restore cleanly (key just absent)
    save_checkpoint(str(tmp_path / "old"), params)
    r2 = restore_checkpoint(str(tmp_path / "old"), target={"params": params, "batch_stats": bs})
    assert "batch_stats" not in r2


def test_checkpoint_strict_restore_raises_on_mismatch(tmp_path):
    """val_biased needs torch load_state_dict semantics: a net/M/image-size
    mismatch must fail loudly, not score random weights."""
    import pytest

    params = {"fc": {"kernel": np.ones((4, 2), np.float32)}}
    save_checkpoint(str(tmp_path / "ck"), params)
    with pytest.raises(ValueError, match="strict checkpoint restore"):
        restore_checkpoint(
            str(tmp_path / "ck"),
            target={"params": {"fc": {"kernel": np.ones((8, 2), np.float32)}}},
            strict=True,
        )
    # matching shapes restore cleanly under strict
    r = restore_checkpoint(str(tmp_path / "ck"), target={"params": params}, strict=True)
    assert np.array_equal(r["params"]["fc"]["kernel"], params["fc"]["kernel"])


def test_checkpoint_strict_restore_requires_batch_stats_presence(tmp_path):
    """strict=True must also catch subtree-PRESENCE mismatches: a checkpoint
    without BatchNorm running stats validated against a BN model previously
    passed 'strict' and evaluated on init-value statistics."""
    import pytest

    params = {"layer": {"kernel": np.ones((2, 2), np.float32)}}
    bs = {"layer": {"mean": np.zeros(2, np.float32), "var": np.ones(2, np.float32)}}
    save_checkpoint(str(tmp_path / "nobs"), params)
    with pytest.raises(ValueError, match="batch_stats"):
        restore_checkpoint(
            str(tmp_path / "nobs"), target={"params": params, "batch_stats": bs}, strict=True
        )
    save_checkpoint(str(tmp_path / "withbs"), params, batch_stats=bs)
    with pytest.raises(ValueError, match="batch_stats"):
        restore_checkpoint(str(tmp_path / "withbs"), target={"params": params}, strict=True)
    # matching presence restores cleanly
    r = restore_checkpoint(
        str(tmp_path / "withbs"), target={"params": params, "batch_stats": bs}, strict=True
    )
    assert np.array_equal(r["batch_stats"]["layer"]["var"], bs["layer"]["var"])
