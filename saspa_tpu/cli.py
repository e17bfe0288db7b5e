"""Command-line interface: gen / filter / train / eval-biased / merge.

Replaces the reference's three entry styles (edit-the-file constants in
run_aug/run_aug.py:513-556, argparse in fgvc/train.py:46-80, __main__ block in
all_utils/utils.py:821-839) with subcommands.  The train flags keep the
reference's exact names so existing sweep scripts translate 1:1
(fgvc/trainings_scripts/*.sh).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from pathlib import Path


def _add_gen(sub):
    p = sub.add_parser("gen", help="generate augmentations (run_aug equivalent)")
    p.add_argument("--dataset", default="planes")
    p.add_argument("--base_model", default=None, help="default: sd_v1.5 for planes, blip_diffusion otherwise")
    p.add_argument("--controlnet", default="canny", choices=["canny", "hed", "none"])
    p.add_argument("--sdedit", action="store_true")
    p.add_argument("--sdedit_strength", type=float, default=0.85)
    p.add_argument("--num_per_image", type=int, default=2)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--prompt_type", default="gpt-meta_class")
    p.add_argument("--no_sub_class", action="store_true")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--num_inference_steps", type=int, default=30)
    p.add_argument("--sampler", default="ddim", choices=["ddim", "unipcmultistep"])
    p.add_argument("--controlnet_scale", type=float, default=0.75)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--weights_dir", default=None)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--skip_filter", action="store_true")
    p.add_argument("--version", default="v1")
    p.add_argument("--preset", default=None, choices=["real_guidance", "alia"],
                   help="baseline presets (run_aug_real_guidance.py equivalents)")
    return p


def _add_filter(sub):
    p = sub.add_parser("filter", help="build the aug-JSON from a folder of generated images")
    p.add_argument("--dataset", required=True)
    p.add_argument("--aug_folder", required=True)
    p.add_argument("--lpips_min", type=float, default=None)
    p.add_argument("--lpips_max", type=float, default=None)
    p.add_argument("--clip_filtering", default=None, choices=[None, "per_class"])
    p.add_argument("--clip_filtering_discount", type=float, default=1.0)
    p.add_argument("--no_semantic_filtering", action="store_true")
    p.add_argument("--no_model_confidence", action="store_true")
    p.add_argument("--conf_top_k", type=int, default=10)
    p.add_argument("--alia_conf_filtering", action="store_true")
    p.add_argument("--weights_dir", default=None)
    p.add_argument("--batch_size", type=int, default=64)
    return p


def _add_train(sub):
    # flag names mirror fgvc/train.py:46-80 exactly
    p = sub.add_parser("train", help="train the WS-DAN/CAL classifier")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--gpu_id", type=int, default=0, help="accepted for parity; ignored on TPU")
    p.add_argument("--logdir", type=str, default="logs")
    p.add_argument("--dataset", type=str, default="planes")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument("--net", type=str, default="resnet101")
    p.add_argument("--aug_json", type=str, default=None)
    p.add_argument("--aug_sample_ratio", type=float, default=None)
    p.add_argument("--limit_aug_per_image", type=int, default=None)
    p.add_argument("--stop_aug_after_epoch", type=int, default=None)
    p.add_argument("--special_aug", type=str, default="classic")
    p.add_argument("--train_sample_ratio", type=float, default=1.0)
    p.add_argument("--dont_use_wsdan", action="store_true", default=False)
    p.add_argument("--use_cutmix", action="store_true", default=False)
    p.add_argument("--use_target_soft_cross_entropy", action="store_true", default=False)
    p.add_argument("--few_shot", type=int, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--wandb", action="store_true", default=False)
    p.add_argument("--plot_per_class_acc", action="store_true", default=False,
                   help="write samples-per-class vs class-accuracy scatter PNGs "
                        "each validation (fgvc/util.py:112-135 parity)")
    # extra vs the reference flag set: the reference downloads CLIP at runtime
    # (fgvc/train.py:267); here the soft-CE teacher loads converted weights
    p.add_argument("--weights_dir", default=None,
                   help="converted-checkpoint dir for the CLIP soft-CE teacher")
    return p


def _add_eval_biased(sub):
    p = sub.add_parser("eval-biased", help="OOD/ID eval on planes_biased (val_biased equivalent)")
    p.add_argument("--ckpt_folder", required=True)
    p.add_argument("--net", default="resnet101")
    p.add_argument("--batch_size", type=int, default=16)
    return p


def _add_merge(sub):
    p = sub.add_parser("merge-jsons", help="merge aug-JSONs")
    p.add_argument("--jsons", nargs="+", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--amount_per_json", type=int, default=None)
    return p


def _add_prep_captions(sub):
    p = sub.add_parser(
        "prep-captions",
        help="offline: BLIP-caption a dataset into the captions JSON "
             "(prompts_engineering/blip_utils.py equivalent)",
    )
    p.add_argument("--dataset", required=True)
    p.add_argument("--images", nargs="+", required=True, help="image paths to caption")
    p.add_argument("--output", required=True)
    p.add_argument("--questions", nargs="*", default=[])
    p.add_argument("--weights_dir", default=None)
    return p


def _add_prep_prompts(sub):
    p = sub.add_parser(
        "prep-prompts",
        help="offline: keytotext-T5 sentence pool with keyword filter "
             "(prompts_engineering/txt2sentance_prompts.py equivalent)",
    )
    p.add_argument("--dataset", required=True)
    p.add_argument("--num", type=int, default=100)
    p.add_argument("--output_path", required=True)
    p.add_argument("--all_classes", action="store_true")
    p.add_argument("--weights_dir", default=None)
    return p


def cmd_prep_captions(args):
    from saspa_tpu.gen.caption_tools import write_captions_of_a_dataset_to_json

    if args.weights_dir:
        os.environ["SASPA_WEIGHTS_DIR"] = args.weights_dir
    write_captions_of_a_dataset_to_json(
        args.dataset, args.images, args.output, questions=args.questions
    )


def cmd_prep_prompts(args):
    from saspa_tpu.gen.caption_tools import generate_txt2sentence_prompts

    if args.weights_dir:
        os.environ["SASPA_WEIGHTS_DIR"] = args.weights_dir
    path = generate_txt2sentence_prompts(
        args.dataset, args.num, args.output_path, all_classes=args.all_classes
    )
    print(path)


def cmd_gen(args):
    from saspa_tpu.gen.driver import run_generation, run_generation_and_filter
    from saspa_tpu.utils.config import GenerationConfig
    from saspa_tpu.utils.logging_utils import init_logging

    base_model = args.base_model or ("sd_v1.5" if args.dataset == "planes" else "blip_diffusion")
    if args.preset == "real_guidance":
        cfg = GenerationConfig.real_guidance(
            args.dataset, num_per_image=args.num_per_image, seed=args.seed,
            batch_size=args.batch_size, weights_dir=args.weights_dir,
            debug=args.debug, version=args.version,
        )
        init_logging(logdir=f"logs/gen/{args.dataset}")
        run_generation_and_filter(cfg, clip_filtering="per_class", semantic_filtering=False,
                                  model_confidence_based_filtering=False)
        return
    if args.preset == "alia":
        cfg = GenerationConfig.alia(
            args.dataset, num_per_image=args.num_per_image, seed=args.seed,
            batch_size=args.batch_size, weights_dir=args.weights_dir,
            debug=args.debug, version=args.version,
        )
        init_logging(logdir=f"logs/gen/{args.dataset}")
        run_generation_and_filter(cfg, semantic_filtering=True,
                                  model_confidence_based_filtering=False,
                                  alia_conf_filtering=True)
        return
    cfg = GenerationConfig(
        dataset=args.dataset,
        base_model=base_model,
        controlnet=None if args.controlnet == "none" else args.controlnet,
        sdedit=args.sdedit,
        sdedit_strength=args.sdedit_strength,
        num_per_image=args.num_per_image,
        seed=args.seed,
        prompt_type=args.prompt_type,
        prompt_with_sub_class=not args.no_sub_class,
        use_artistic_prompts=base_model == "sd_v1.5",
        resolution=args.resolution,
        guidance_scale=args.guidance_scale,
        num_inference_steps=args.num_inference_steps,
        sampler=args.sampler,
        controlnet_conditioning_scale=args.controlnet_scale,
        batch_size=args.batch_size,
        weights_dir=args.weights_dir,
        debug=args.debug,
        version=args.version,
    )
    init_logging(logdir=f"logs/gen/{args.dataset}")
    if args.skip_filter:
        run_generation(cfg)
    else:
        run_generation_and_filter(
            cfg, semantic_filtering=True, model_confidence_based_filtering=True
        )


def cmd_filter(args):
    from saspa_tpu.filters.aug_json import create_json_of_image_name_to_augmented_images_paths

    path = create_json_of_image_name_to_augmented_images_paths(
        args.dataset,
        augmented_image_folder_path=args.aug_folder,
        lpips_min=args.lpips_min,
        lpips_max=args.lpips_max,
        clip_filtering=args.clip_filtering,
        clip_filtering_discount=args.clip_filtering_discount,
        semantic_filtering=not args.no_semantic_filtering,
        model_confidence_based_filtering=not args.no_model_confidence,
        conf_top_k=args.conf_top_k,
        alia_conf_filtering=args.alia_conf_filtering,
        weights_dir=args.weights_dir,
        batch_size=args.batch_size,
    )
    print(path)


def cmd_train(args):
    from saspa_tpu.fgvc.runner import run_training

    if args.weights_dir:
        # CLIPScorer (the soft-CE teacher) falls back to $SASPA_WEIGHTS_DIR
        os.environ["SASPA_WEIGHTS_DIR"] = args.weights_dir
    run_training(args)


def cmd_eval_biased(args):
    from saspa_tpu.fgvc.val_biased import main as vb_main

    vb_main(args.ckpt_folder, net=args.net, batch_size=args.batch_size)


def cmd_merge(args):
    from saspa_tpu.filters.aug_json import merge_aug_jsons, merge_aug_jsons_with_amount_per_json

    if args.amount_per_json:
        merge_aug_jsons_with_amount_per_json({j: args.amount_per_json for j in args.jsons}, args.output)
    else:
        merge_aug_jsons(args.jsons, args.output)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="saspa_tpu")
    sub = parser.add_subparsers(dest="command", required=True)
    _add_gen(sub)
    _add_filter(sub)
    _add_train(sub)
    _add_eval_biased(sub)
    _add_merge(sub)
    _add_prep_captions(sub)
    _add_prep_prompts(sub)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from saspa_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    {
        "gen": cmd_gen,
        "filter": cmd_filter,
        "train": cmd_train,
        "eval-biased": cmd_eval_biased,
        "merge-jsons": cmd_merge,
        "prep-captions": cmd_prep_captions,
        "prep-prompts": cmd_prep_prompts,
    }[args.command](args)


if __name__ == "__main__":
    main()
