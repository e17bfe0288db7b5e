"""Multi-device generation: the fused path sharded over the 8-device CPU mesh."""

import numpy as np
import pytest
from pathlib import Path
from PIL import Image

import jax
import jax.numpy as jnp

from saspa_tpu.gen.driver import run_generation
from saspa_tpu.utils.config import GenerationConfig
from tests.test_generation_driver import StubPlanesUtils, _tiny_pipe


def test_fused_generation_shards_over_8_devices(tmp_path, monkeypatch):
    assert jax.device_count() == 8
    images = tmp_path / "ds" / "images"
    images.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8)).save(images / f"{4000000 + i}.jpg")

    import saspa_tpu.data.registry as R

    monkeypatch.setitem(
        R.DS_UTILS_DICT, "planes", lambda print_func=print: StubPlanesUtils(tmp_path / "ds", print_func)
    )

    cfg = GenerationConfig(
        dataset="planes", base_model="sd_v1.5", controlnet="canny",
        num_per_image=1, seed=1, resolution=64, guidance_scale=7.5,
        num_inference_steps=2, batch_size=8,  # divisible by 8 devices
    )
    pipe = _tiny_pipe(controlnet="canny")
    out_folder = run_generation(cfg, pipe=pipe)
    gen_files = [f for f in Path(out_folder).glob("*.png") if "_source" not in f.name and "_control" not in f.name]
    assert len(gen_files) == 8
    for f in gen_files[:2]:
        img = np.asarray(Image.open(f))
        assert img.shape[2] == 3 and np.isfinite(img).all()


def test_blip_fused_generation_shards_over_8_devices(tmp_path, monkeypatch):
    """The blip_diffusion backbone (best for CompCars/Cars/DTD,
    README.md:115) rides the SAME fused+sharded path: the driver routes it
    through make_fused_generate with Q-Former inputs DP-sharded."""
    from tests.test_blip_edit import _tiny_blip_pipe

    assert jax.device_count() == 8
    images = tmp_path / "ds" / "images"
    images.mkdir(parents=True)
    rng = np.random.RandomState(1)
    for i in range(8):
        Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8)).save(images / f"{5000000 + i}.jpg")

    import saspa_tpu.data.registry as R

    monkeypatch.setitem(
        R.DS_UTILS_DICT, "planes", lambda print_func=print: StubPlanesUtils(tmp_path / "ds", print_func)
    )

    cfg = GenerationConfig(
        dataset="planes", base_model="blip_diffusion", controlnet=None,
        num_per_image=1, seed=1, resolution=64, guidance_scale=7.5,
        num_inference_steps=2, batch_size=8,
    )
    pipe = _tiny_blip_pipe()
    out_folder = run_generation(cfg, pipe=pipe)
    gen_files = [f for f in Path(out_folder).glob("*.png")
                 if all(s not in f.name for s in ("_source", "_control", "_subject"))]
    assert len(gen_files) == 8
    # subject side files saved per item (run_aug/run_aug.py:453)
    assert len(list(Path(out_folder).glob("*_subject_*.png"))) == 8
    for f in gen_files[:2]:
        img = np.asarray(Image.open(f))
        assert img.shape[2] == 3 and np.isfinite(img).all()
