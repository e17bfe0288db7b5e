"""Offline prompt-preparation tools (run once per dataset).

Covers the reference's prompt-engineering tooling (SURVEY §2a#20):
  * write_captions_of_a_dataset_to_json — BLIP captioning (+optional VQA)
    producing the captions JSON {image_path: {"caption": str, <question>: a}}
    (prompts_engineering/blip_utils.py:28-58)
  * generate_txt2sentence_prompts — keyword->sentence generation with the
    keyword-membership check and dedup (prompts_engineering/
    txt2sentance_prompts.py:9-56), writing LE_{num}_{ds}_all_classes_{b}.json
  * extract_unique_alia_prompts — ALIA prompt post-processing
    (prompts_engineering/ALIA_prompts/get_unique_prompts.py)

The neural generators are pluggable callables so the tools are testable
without weights; the default factories use local converted checkpoints (BLIP
captioner / T5 keytotext) and raise a clear error when absent — the shipped
static assets in prompts_engineering/ cover the published recipes.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

# one of these keywords must appear in a generated sentence
# (prompts_engineering/txt2sentance_prompts.py:84-91)
DATASET_TO_LABEL_DICT = {
    "planes": ["airplane", "plane", "aircraft", "jet", "aircraft"],
    "cars": ["car", "vehicle", "automobile", "auto", "motorcar"],
    "compcars": ["car", "vehicle", "automobile", "auto", "motorcar"],
    "compcars-parts": ["car", "vehicle", "automobile", "auto", "motorcar"],
    "cub": ["bird"],
    "dtd": ["texture"],
}


def write_captions_of_a_dataset_to_json(
    dataset_name: str,
    image_paths: Sequence[str],
    output_file: str,
    questions: Sequence[str] = (),
    captioner: Optional[Callable[[str], str]] = None,
    vqa: Optional[Callable[[str, str], str]] = None,
) -> Dict[str, dict]:
    """Produce the captions JSON the 'captions' prompt type consumes."""
    if captioner is None:
        captioner = _default_captioner()
    if questions and vqa is None:
        vqa = _default_vqa()
    Path(output_file).parent.mkdir(parents=True, exist_ok=True)
    out: Dict[str, dict] = {}
    for p in image_paths:
        entry = {"caption": captioner(p)}
        if questions:
            if hasattr(vqa, "answer_questions"):
                # one vision-tower pass per image, all questions in one
                # fused decode (FlaxBlipVQA); injectable (path, q) callables
                # keep the per-pair path below
                entry.update(zip(questions, vqa.answer_questions(p, questions)))
            else:
                for q in questions:
                    entry[q] = vqa(p, q)
        out[p] = entry
    with open(output_file, "w") as f:
        json.dump(out, f)
    logging.info("wrote %d captions to %s", len(out), output_file)
    return out


def _default_captioner(weights_dir: Optional[str] = None):
    """BLIP captioner.  Preference order: (1) the TPU-native Flax captioner
    (models/blip_caption.py) with a converted LAVIS checkpoint under
    weights_dir (tools/convert_weights.py blip_caption); (2) transformers'
    torch BLIP if those weights are local; (3) a clear error."""
    import os

    weights_dir = weights_dir or os.environ.get("SASPA_WEIGHTS_DIR", "weights")
    if (Path(weights_dir) / "blip_caption").exists():
        from saspa_tpu.models.blip_caption import FlaxBlipCaptioner

        return FlaxBlipCaptioner(weights_dir=weights_dir)
    try:
        from transformers import BlipForConditionalGeneration, BlipProcessor

        processor = BlipProcessor.from_pretrained("Salesforce/blip-image-captioning-base")
        model = BlipForConditionalGeneration.from_pretrained("Salesforce/blip-image-captioning-base")

        def cap(path: str) -> str:
            from PIL import Image

            inputs = processor(Image.open(path).convert("RGB"), return_tensors="pt")
            ids = model.generate(**inputs, max_new_tokens=30)
            return processor.decode(ids[0], skip_special_tokens=True)

        return cap
    except Exception as e:  # zero-egress env / no local weights
        raise RuntimeError(
            "No BLIP captioner available: no converted LAVIS checkpoint at "
            f"{weights_dir}/blip_caption (tools/convert_weights.py blip_caption) "
            "and no local transformers BLIP weights. Pass captioner= explicitly, "
            f"or use the shipped captions assets in prompts_engineering/captions. ({e})"
        )


def _default_vqa(weights_dir: Optional[str] = None):
    """BLIP VQA (the reference loads `blip_vqa` next to the captioner,
    prompts_engineering/blip_utils.py:35).  Preference order: (1) the
    TPU-native Flax VQA model (models/blip_vqa.py) with a converted LAVIS
    checkpoint under weights_dir (tools/convert_weights.py blip_vqa);
    (2) transformers' torch BLIP-VQA if those weights are local; (3) a clear
    error."""
    import os

    weights_dir = weights_dir or os.environ.get("SASPA_WEIGHTS_DIR", "weights")
    if (Path(weights_dir) / "blip_vqa").exists():
        from saspa_tpu.models.blip_vqa import FlaxBlipVQA

        return FlaxBlipVQA(weights_dir=weights_dir)
    try:
        from transformers import BlipForQuestionAnswering, BlipProcessor

        processor = BlipProcessor.from_pretrained("Salesforce/blip-vqa-base")
        model = BlipForQuestionAnswering.from_pretrained("Salesforce/blip-vqa-base")

        def vqa(path: str, question: str) -> str:
            from PIL import Image

            inputs = processor(Image.open(path).convert("RGB"), question, return_tensors="pt")
            ids = model.generate(**inputs, max_new_tokens=10)
            return processor.decode(ids[0], skip_special_tokens=True)

        return vqa
    except Exception as e:  # zero-egress env / no local weights
        raise RuntimeError(
            "No BLIP VQA available: no converted LAVIS checkpoint at "
            f"{weights_dir}/blip_vqa (tools/convert_weights.py blip_vqa) and no "
            "local transformers BLIP-VQA weights. Pass vqa= explicitly, or drop "
            f"--questions (captions alone cover the published recipes). ({e})"
        )


def generate_txt2sentence_prompts(
    dataset: str,
    num: int,
    output_path: str,
    all_classes: bool = False,
    sentence_generator: Optional[Callable[[str], str]] = None,
    classnames: Optional[List[str]] = None,
) -> str:
    """Keyword->sentence prompt pool with membership check + dedup.

    Writes LE_{num}_{dataset}_all_classes_{all_classes}.json in the exact
    {class: [sentences]} schema read_prompts_from_json expects."""
    assert dataset in DATASET_TO_LABEL_DICT
    if sentence_generator is None:
        sentence_generator = _default_sentence_generator()
    must_keywords = DATASET_TO_LABEL_DICT[dataset]

    if classnames is None:
        if all_classes:
            from saspa_tpu.data.registry import DS_UTILS_DICT

            classnames = DS_UTILS_DICT[dataset]().get_classes()
        elif dataset == "compcars-parts":
            from saspa_tpu.data.registry import CompCarsPartsUtils

            utils_to_use = CompCarsPartsUtils()
            classnames = [utils_to_use.get_basic_prompt(str(p)) for p in range(1, 5)]
        else:
            classnames = list(must_keywords)

    skipped = 0
    result: Dict[str, List[str]] = {}
    for cls in classnames:
        sentences = []
        for i in range(num):
            inp = f"{must_keywords[0]}, of type {cls}" if all_classes else (
                cls if dataset == "compcars-parts" else must_keywords[0]
            )
            s = sentence_generator(inp)
            if any(kw in s.lower() for kw in must_keywords):
                sentences.append(s)
            else:
                skipped += 1
        result[cls] = sorted(set(sentences))
    logging.info("skipped %d sentences without keywords", skipped)

    Path(output_path).mkdir(parents=True, exist_ok=True)
    save_path = Path(output_path) / f"LE_{num}_{dataset}_all_classes_{all_classes}.json"
    with open(save_path, "w") as f:
        json.dump(result, f)
    return str(save_path)


def _default_sentence_generator(weights_dir: Optional[str] = None):
    """Keytotext T5.  Preference order: (1) the TPU-native Flax T5
    (models/t5.py) with a converted HF checkpoint under weights_dir
    (tools/convert_weights.py t5) + spiece.model; (2) transformers' torch T5
    if those weights are local; (3) a clear error."""
    import os

    weights_dir = weights_dir or os.environ.get("SASPA_WEIGHTS_DIR", "weights")
    if (Path(weights_dir) / "t5_keytotext").exists():
        from saspa_tpu.models.t5 import FlaxKeytotextT5

        return FlaxKeytotextT5(weights_dir=weights_dir)
    try:
        from transformers import T5ForConditionalGeneration, T5Tokenizer

        name = "mrm8488/t5-base-finetuned-common_gen"
        tok = T5Tokenizer.from_pretrained(name)
        model = T5ForConditionalGeneration.from_pretrained(name)

        def gen(keywords: str) -> str:
            ids = tok(keywords, return_tensors="pt").input_ids
            out = model.generate(ids, do_sample=True, max_new_tokens=32)
            return tok.decode(out[0], skip_special_tokens=True)

        return gen
    except Exception as e:
        raise RuntimeError(
            "No keytotext T5 available: no converted checkpoint at "
            f"{weights_dir}/t5_keytotext (tools/convert_weights.py t5) and no "
            "local mrm8488/t5-base-finetuned-common_gen weights. Pass "
            f"sentence_generator= explicitly, or use the shipped assets. ({e})"
        )


def extract_unique_alia_prompts(captions: Sequence[str], max_prompts: int = 30) -> List[str]:
    """Deduplicate/normalize GPT-summarized ALIA prompts (the get_unique_prompts
    post-processing step): strip numbering/quotes, drop dups case-insensitively."""
    seen = set()
    out: List[str] = []
    for line in captions:
        s = line.strip()
        # drop leading "12." / "3)" style numbering, then surrounding quotes
        while s and (s[0].isdigit() or s[0] in ".)-"):
            s = s[1:].lstrip()
        s = s.strip('"').strip()
        key = s.lower()
        if s and key not in seen:
            seen.add(key)
            out.append(s)
        if len(out) >= max_prompts:
            break
    return out
