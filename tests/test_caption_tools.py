import json

import pytest

from saspa_tpu.gen.caption_tools import (
    extract_unique_alia_prompts,
    generate_txt2sentence_prompts,
    write_captions_of_a_dataset_to_json,
)


def test_caption_writer_with_fake_model(tmp_path):
    out = write_captions_of_a_dataset_to_json(
        "planes",
        ["/x/a.jpg", "/x/b.jpg"],
        str(tmp_path / "caps.json"),
        questions=["is it day or night?"],
        captioner=lambda p: f"a photo of {p}",
        vqa=lambda p, q: "day",
    )
    d = json.load(open(tmp_path / "caps.json"))
    assert d["/x/a.jpg"]["caption"] == "a photo of /x/a.jpg"
    assert d["/x/b.jpg"]["is it day or night?"] == "day"


def test_txt2sentence_keyword_check_and_dedup(tmp_path):
    calls = {"n": 0}

    def fake_gen(inp):
        calls["n"] += 1
        # every 3rd output lacks the keyword; duplicates otherwise
        if calls["n"] % 3 == 0:
            return "a boat on the water"
        return "an airplane flying high"

    path = generate_txt2sentence_prompts(
        "planes", num=9, output_path=str(tmp_path), all_classes=False,
        sentence_generator=fake_gen, classnames=["707-320"],
    )
    assert path.endswith("LE_9_planes_all_classes_False.json")
    d = json.load(open(path))
    assert d == {"707-320": ["an airplane flying high"]}  # deduped + filtered


def test_extract_unique_alia_prompts():
    lines = [
        '1. "A plane on a runway."',
        "2. A plane on a runway.",
        "3) a plane in cloudy skies",
        "",
    ]
    out = extract_unique_alia_prompts(lines)
    assert out == ["A plane on a runway.", "a plane in cloudy skies"]
