import numpy as np
import pytest

from saspa_tpu.gen.tokenizer import CLIPTokenizer, CONTEXT_LENGTH, EOT, SOT
from saspa_tpu.gen.prompts import ARTISTIC_PROMPTS, IMAGE_VARIATIONS_PROMPTS, resolve_prompt_files
from saspa_tpu.utils.config import GenerationConfig


def test_tokenizer_framing_and_shape():
    tok = CLIPTokenizer()
    ids = tok(["a photo of an airplane", ""])
    assert ids.shape == (2, CONTEXT_LENGTH)
    assert ids[0, 0] == SOT
    assert EOT in ids[0]
    # empty prompt: SOT EOT pad
    assert ids[1, 0] == SOT and ids[1, 1] == EOT and ids[1, 2] == 0


def test_tokenizer_deterministic_and_distinct():
    tok = CLIPTokenizer()
    a = tok("a red car")
    b = tok("a red car")
    c = tok("a blue bird")
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_tokenizer_truncation():
    tok = CLIPTokenizer()
    long = "airplane " * 200
    ids = tok(long)
    assert ids.shape == (1, CONTEXT_LENGTH)
    assert ids[0, -1] == EOT


def test_static_prompt_pools_sizes():
    assert len(ARTISTIC_PROMPTS) == 10
    assert len(IMAGE_VARIATIONS_PROMPTS) == 20
    assert ARTISTIC_PROMPTS[0] == "a painting of van gogh"


def test_resolve_prompt_files_gpt_meta_class():
    cfg = resolve_prompt_files(GenerationConfig(dataset="planes", prompt_type="gpt-meta_class"))
    assert cfg.prompts_file.endswith("gpt_prompts/planes-100-gpt_v1.txt")
    with open(cfg.prompts_file) as f:
        assert len([l for l in f if l.strip()]) == 100


def test_resolve_prompt_files_dtd_forces_captions():
    cfg = resolve_prompt_files(GenerationConfig(dataset="dtd", prompt_type="gpt-meta_class"))
    assert cfg.prompt_type == "captions"
    assert cfg.blip_captions.endswith("captions/dtd_captions.json")


def test_resolve_prompt_files_compcars_uses_cars_prompts():
    cfg = resolve_prompt_files(GenerationConfig(dataset="compcars-parts", prompt_type="gpt-meta_class"))
    assert cfg.prompts_file.endswith("gpt_prompts/cars-100-gpt_v1.txt")


def test_sweep_recipes():
    from saspa_tpu.gen.recipes import BEST_RECIPES, sweep_runs

    assert BEST_RECIPES["cub"]["aug_sample_ratio"] == 0.1
    assert BEST_RECIPES["compcars-parts"]["special_aug"] == "randaug-cutmix"
    runs = sweep_runs("planes", aug_json="x.json")
    assert len(runs) == 3  # seeds 1-3
    assert all(r.limit_aug_per_image == 2 for r in runs)
    fs = sweep_runs("dtd", aug_json=None, few_shot=True)
    assert len(fs) == 12  # 4 K values x 3 seeds
    assert all(r.aug_sample_ratio == 0.6 for r in fs)
