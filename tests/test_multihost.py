"""Multi-host generation semantics with mocked process_index/count.

The reference scales out by hand-launching one script per GPU and merging the
resulting aug-JSONs (all_utils/utils.py:485-511).  The driver automates the
fan-out: the worklist is sliced by process index (gen/driver.py::_shard_for_host)
and every item's randomness is keyed by (seed, image_idx, prompt_idx), so the
multi-host union must be BYTE-identical to a single-host run; the aug-JSON is
written exactly once, by process 0, after a cross-host barrier.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import saspa_tpu.gen.driver as driver_mod
from saspa_tpu.gen.driver import run_generation, run_generation_and_filter
from tests.test_generation_driver import StubPlanesUtils, _cfg, _tiny_pipe, gen_env  # noqa: F401


def _png_bytes(folder):
    return {p.name: p.read_bytes() for p in sorted(Path(folder).glob("*.png"))}


def _mock_host(monkeypatch, index, count):
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: count)
    monkeypatch.setattr(jax, "process_index", lambda: index)


def test_two_host_union_matches_single_host(gen_env, monkeypatch, tmp_path_factory):
    """Disjoint per-host coverage; union of the two shards == the 1-host run."""
    cfg = _cfg()
    pipe = _tiny_pipe()

    # ---- reference single-host run in a separate dataset root --------------
    single_root = tmp_path_factory.mktemp("single")
    import shutil

    import saspa_tpu.data.registry as R

    shutil.copytree(gen_env / "ds", single_root / "ds")
    monkeypatch.setitem(
        R.DS_UTILS_DICT, "planes",
        lambda print_func=print: StubPlanesUtils(single_root / "ds", print_func),
    )
    single_folder = run_generation(cfg, pipe=pipe)
    single = _png_bytes(single_folder)

    # ---- two mocked hosts over the original (shared) dataset root ----------
    monkeypatch.setitem(
        R.DS_UTILS_DICT, "planes",
        lambda print_func=print: StubPlanesUtils(gen_env / "ds", print_func),
    )
    shards = []
    folder = None
    for idx in (0, 1):
        _mock_host(monkeypatch, idx, 2)
        before = set(_png_bytes(folder)) if folder else set()
        folder = run_generation(cfg, pipe=pipe)
        after = _png_bytes(folder)
        shards.append({n: b for n, b in after.items() if n not in before})

    # disjoint coverage (resume-skip means host 1 never rewrites host 0 files)
    assert set(shards[0]) and set(shards[1])
    assert not (set(shards[0]) & set(shards[1]))
    # union is byte-identical to the single-host run: same file set, same pixels
    union = {**shards[0], **shards[1]}
    assert set(union) == set(single)
    for name in single:
        assert union[name] == single[name], f"{name} differs across sharding modes"


def test_single_writer_aug_json(gen_env, monkeypatch):
    """run_generation_and_filter: host!=0 returns the predicted path without
    writing; host 0 writes it; both meet at the barrier first."""
    cfg = _cfg()
    pipe = _tiny_pipe()
    barrier_calls = []
    monkeypatch.setattr(driver_mod, "_host_barrier", lambda name: barrier_calls.append(name))

    kw = dict(semantic_filtering=False, model_confidence_based_filtering=False)

    _mock_host(monkeypatch, 1, 2)
    jp_host1 = run_generation_and_filter(cfg, pipe=pipe, **kw)
    assert barrier_calls == ["saspa:generation_done"]
    assert not Path(jp_host1).exists(), "non-writer host must not write the aug-JSON"

    _mock_host(monkeypatch, 0, 2)
    jp_host0 = run_generation_and_filter(cfg, pipe=pipe, **kw)
    assert barrier_calls == ["saspa:generation_done"] * 2
    assert jp_host0 == jp_host1, "all hosts must agree on the artifact path"
    d = json.load(open(jp_host0))
    assert len(d) == 3 and all(len(v) == 2 for v in d.values())


def test_worklist_shard_is_a_partition(gen_env):
    """_shard_for_host over N hosts partitions the worklist exactly."""
    import saspa_tpu.data.registry as R
    from saspa_tpu.gen.driver import _shard_for_host, build_worklist
    from saspa_tpu.gen.prompts import PromptEngine

    cfg = _cfg().with_dataset_overrides()
    ds = R.DS_UTILS_DICT["planes"]()
    engine = PromptEngine(cfg, ds, ds.get_image_stem_to_class_str_dict())
    items = build_worklist(cfg, ds, engine, str(gen_env / "out"))
    assert len(items) == 6

    import jax

    seen = []
    for idx in range(3):
        orig_count, orig_index = jax.process_count, jax.process_index
        jax.process_count, jax.process_index = (lambda: 3), (lambda i=idx: i)
        try:
            seen.extend((it.image_index, it.prompt_index) for it in _shard_for_host(items))
        finally:
            jax.process_count, jax.process_index = orig_count, orig_index
    assert sorted(seen) == sorted((it.image_index, it.prompt_index) for it in items)
