import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from saspa_tpu.diffusion.pipelines import DiffusionPipeline
from saspa_tpu.gen.driver import build_worklist, run_generation
from saspa_tpu.gen.prompts import ARTISTIC_PROMPTS, PromptEngine, resolve_prompt_files
from saspa_tpu.utils.config import GenerationConfig
from tests.test_diffusion_pipeline import TINY_TEXT, TINY_UNET, TINY_VAE


class StubPlanesUtils:
    name = "planes"
    meta_class = "airplane"

    def __init__(self, root, print_func=print):
        self.root_path = Path(root)
        self.print_func = print_func
        self.images = self.root_path / "images"
        self.original_images_paths = sorted(str(p) for p in self.images.glob("*.jpg"))

    def get_image_stem_to_class_str_dict(self):
        return {Path(p).stem: "Boeing 707-320" for p in self.original_images_paths}

    def get_image_path_to_class_str_dict(self):
        return {p: "Boeing 707-320" for p in self.original_images_paths}

    def get_basic_prompt(self):
        return "a photo of an aircraft"

    def get_image_path_with_same_class(self, image_path):
        return self.original_images_paths


@pytest.fixture()
def gen_env(tmp_path, monkeypatch):
    images = tmp_path / "ds" / "images"
    images.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (96, 128, 3), np.uint8)).save(images / f"{2000000 + i}.jpg")

    import saspa_tpu.data.registry as R

    monkeypatch.setitem(R.DS_UTILS_DICT, "planes", lambda print_func=print: StubPlanesUtils(tmp_path / "ds", print_func))
    return tmp_path


def _tiny_pipe(controlnet=None):
    return DiffusionPipeline(
        base_model="sd_v1.5", controlnet=controlnet, sampler="ddim", dtype=jnp.float32,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, text_cfgs=TINY_TEXT,
    )


def _cfg(**kw):
    base = dict(
        dataset="planes", base_model="sd_v1.5", controlnet=None, num_per_image=2,
        seed=1, prompt_type="gpt-meta_class", prompt_with_sub_class=True,
        use_artistic_prompts=True, artistic_prompts_prob=0.5,
        resolution=64, guidance_scale=7.5, num_inference_steps=2, batch_size=2,
    )
    base.update(kw)
    return GenerationConfig(**base)


def test_prompt_engine_rules(gen_env):
    import saspa_tpu.data.registry as R

    cfg = _cfg()
    ds = R.DS_UTILS_DICT["planes"]()
    engine = PromptEngine(cfg, ds, ds.get_image_stem_to_class_str_dict())
    p0 = engine.build(ds.original_images_paths[0], 0, 0)
    p1 = engine.build(ds.original_images_paths[0], 0, 1)
    # sub-class substitution happened
    assert "Boeing 707-320 airplane" in p0 or "Boeing 707-320" in p0
    # every-2nd artistic rule at p=0.5: prompt 0 gets an artistic suffix, 1 doesn't
    assert any(a in p0 for a in ARTISTIC_PROMPTS)
    assert not any(a in p1 for a in ARTISTIC_PROMPTS)
    # deterministic
    assert engine.build(ds.original_images_paths[0], 0, 0) == p0
    # no trailing period from the pool
    assert not p1.endswith(".")


def test_output_folder_layout():
    cfg = _cfg(controlnet="canny")
    folder = cfg.output_folder("/data/planes")
    # exact reference layout (run_aug/run_aug.py:692; note the reference
    # computes last_folder_name at :682-687 but never appends it)
    assert folder == (
        "/data/planes/aug_data/controlnet/sd_v1.5/canny/"
        "gpt-meta_class_prompt_w_sub_class_artistic_prompts_p_0.5_seed_1/images"
    )


def test_generation_end_to_end_and_resume(gen_env):
    cfg = _cfg()
    pipe = _tiny_pipe()
    out_folder = run_generation(cfg, pipe=pipe)
    files = sorted(Path(out_folder).glob("*.png"))
    gen_files = [f for f in files if "_source" not in f.name and "_control" not in f.name]
    src_files = [f for f in files if "_source" in f.name]
    assert len(gen_files) == 6  # 3 images x 2 prompts
    assert len(src_files) == 3
    # naming contract: stem[:40]_prompt_{prompt}_{i}.png
    assert all("_prompt_" in f.name for f in gen_files)

    # resume: second run has nothing to do (same outputs exist)
    import saspa_tpu.data.registry as R

    ds = R.DS_UTILS_DICT["planes"]()
    from saspa_tpu.gen.prompts import PromptEngine

    engine = PromptEngine(cfg.with_dataset_overrides(), ds, ds.get_image_stem_to_class_str_dict())
    items = build_worklist(cfg.with_dataset_overrides(), ds, engine, out_folder)
    assert items == []


def test_generation_with_canny_controlnet(gen_env):
    # the driver resizes the control image to latent_size*8 itself, so a small
    # resolution keeps this test fast on the CPU backend
    cfg = _cfg(controlnet="canny", resolution=64, num_per_image=1, batch_size=3)
    pipe = _tiny_pipe(controlnet="canny")
    out_folder = run_generation(cfg, pipe=pipe)
    files = list(Path(out_folder).glob("*_control.png"))
    assert len(files) == 3  # first 10 images get control side files
    gen_files = [f for f in Path(out_folder).glob("*.png") if "_source" not in f.name and "_control" not in f.name]
    assert len(gen_files) == 3


def test_generation_with_hed_controlnet_fused(gen_env):
    """HED now runs INSIDE the fused program (one jit per batch, like canny):
    the pipeline owns the HED params and the driver routes controlnet=hed
    through make_fused_generate (run_aug/run_aug.py:312,438-439)."""
    cfg = _cfg(controlnet="hed", resolution=64, num_per_image=1, batch_size=3)
    pipe = _tiny_pipe(controlnet="hed")
    assert pipe.hed is not None and "hed" in pipe.params
    out_folder = run_generation(cfg, pipe=pipe)
    gen_files = [f for f in Path(out_folder).glob("*.png") if "_source" not in f.name and "_control" not in f.name]
    assert len(gen_files) == 3
    for f in gen_files:
        img = np.asarray(Image.open(f))
        assert img.shape == (64, 64, 3)


def test_aug_json_from_generated_folder(gen_env, monkeypatch):
    cfg = _cfg()
    pipe = _tiny_pipe()
    out_folder = run_generation(cfg, pipe=pipe)

    import saspa_tpu.data.registry as R
    from saspa_tpu.filters.aug_json import create_json_of_image_name_to_augmented_images_paths

    jp = create_json_of_image_name_to_augmented_images_paths(
        "planes", out_folder, semantic_filtering=False, model_confidence_based_filtering=False,
        init_log=False,
    )
    d = json.load(open(jp))
    assert len(d) == 3
    assert all(len(v) == 2 for v in d.values())  # the side files were excluded


def test_save_source_and_control_uses_global_index(tmp_path):
    """Multi-host shards pass (global_index, path) pairs, so the first-10
    _control.png rule follows the reference's first-10-overall contract
    (run_aug/run_aug.py:441-442), not the shard-local position."""
    from saspa_tpu.gen.driver import _save_source_and_control

    paths = []
    for i in range(12):
        p = tmp_path / f"img_{i:02d}.png"
        Image.fromarray((np.random.RandomState(i).rand(32, 32, 3) * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
    cfg = GenerationConfig(dataset="planes", controlnet="canny", resolution=64)
    out = tmp_path / "out"
    out.mkdir()
    shard = list(enumerate(paths))[1::2]  # host 1 of 2: global indices 1,3,...,11
    _save_source_and_control(cfg, shard, str(out))
    ctrl = sorted(f.name for f in out.glob("*_control.png"))
    assert ctrl == [f"img_{i:02d}_control.png" for i in (1, 3, 5, 7, 9)]
    assert len(list(out.glob("*_source.png"))) == 6  # every shard member


@pytest.mark.slow
def test_generation_blip_edit_end_to_end(gen_env):
    """base_model='blip_diffusion-edit' routes through pipe.edit() — the
    LAVIS inversion-edit path (run_aug/run_aug.py:60,458-462): DDIM-invert
    the source, regenerate under the subject embeddings."""
    from tests.test_blip_edit import _tiny_blip_pipe

    cfg = _cfg(base_model="blip_diffusion-edit", num_per_image=1, batch_size=3,
               num_inference_steps=2)
    out_folder = run_generation(cfg, pipe=_tiny_blip_pipe())
    files = list(Path(out_folder).glob("*.png"))
    gen_files = [f for f in files if not any(s in f.name for s in ("_source", "_control", "_subject"))]
    subj_files = [f for f in files if "_subject" in f.name]
    assert len(gen_files) == 3
    assert len(subj_files) == 3  # style_img_from_diff_img side files
    for f in gen_files:
        arr = np.asarray(Image.open(f))
        assert arr.shape[-1] == 3 and arr.size > 0
