"""Baseline fine-tuners (one entry, `--pruning_type` selects the variant).

Covers the reference's scripts/baselines/* family (BaselineFineTuner,
trainer.py:1935-2030 + SingleArchFinetuner :1854-1932):
  no-pruning   dense student (plain SD fine-tuning)
  magnitude    global magnitude-ranked gate units (models/unet/magnitude.py)
  random       random arch vector at the target ratio
  structural   arch vector loaded from --finetuning_ckpt_dir/arch_vector.pt
  single-arch  the uni-arch hypernet parameter (requires --pruning_ckpt_dir)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from diffusion_pruning_tpu.utils.arg_utils import parse_args
    args = parse_args()
    pruning_type = args.pruning_type or "no-pruning"
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(args.jax_cache_dir))

    from diffusion_pruning_tpu.core import build_structure
    from diffusion_pruning_tpu.models.hypernet import random_arch_vector
    from diffusion_pruning_tpu.models.unet.magnitude import magnitude_arch_vector
    from diffusion_pruning_tpu.models.unet.pruned import (
        expert_macs_ratio, make_expert_plan, slice_expert_params,
    )
    from diffusion_pruning_tpu.models.unet.unet import GatedUNet
    from diffusion_pruning_tpu.parallel import data_mesh, shard_batch
    from diffusion_pruning_tpu.training.factory import (
        build_schedule, build_text_encoder, build_unet, build_vae, unet_config_from_yaml,
    )
    from diffusion_pruning_tpu.training.finetuner import (
        FineTuneConfig, FineTunerModules, make_finetune_optimizer, make_finetune_step,
    )
    from diffusion_pruning_tpu.training.loop import FineTuneLoop, LoopConfig
    from diffusion_pruning_tpu.utils.checkpoint import load_torch_artifact
    from diffusion_pruning_tpu.utils.config import load_config
    from diffusion_pruning_tpu.utils.logging_utils import init_logging, make_run_dir

    cfg = load_config(args.base_config_path)
    cfg.update_flat(vars(args))
    run_dir = make_run_dir(cfg.training.logging.get("logging_dir", "runs"),
                           args.base_config_path, f"baseline-{pruning_type}")
    init_logging(run_dir)

    sd_root = args.pretrained_model_name_or_path
    tiny = not os.path.exists(os.path.join(sd_root or "", "unet"))
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    ucfg = unet_config_from_yaml(cfg, tiny=tiny)
    spec = build_structure(ucfg)
    teacher, dense_params = build_unet(ucfg, sd_root, dtype=dtype)

    target = cfg.training.losses.resource_loss.get("pruning_target", 0.6)
    arch = None
    if pruning_type == "no-pruning":
        student, student_params = teacher, dense_params
    else:
        if pruning_type == "magnitude":
            arch = magnitude_arch_vector(spec, dense_params, target, seed=args.seed)
        elif pruning_type == "random":
            arch = np.asarray(random_arch_vector(jax.random.PRNGKey(args.seed), spec, target))
        elif pruning_type == "structural":
            arch = np.asarray(load_torch_artifact(
                os.path.join(args.finetuning_ckpt_dir, "arch_vector.pt")))
        elif pruning_type == "single-arch":
            emb = load_torch_artifact(
                os.path.join(args.pruning_ckpt_dir, "arch_vector.pt"))
            arch = np.asarray(emb)
        else:
            raise ValueError(pruning_type)
        plan = make_expert_plan(spec, np.asarray(arch).reshape(-1))
        student = GatedUNet(ucfg, plan=plan, dtype=dtype)
        student_params = slice_expert_params(dense_params, plan)
        print(f"{pruning_type}: MACs ratio {expert_macs_ratio(spec, plan):.3f}",
              file=sys.stderr)

    vae, vae_params = build_vae(sd_root, tiny=tiny, dtype=dtype)
    text, text_params = build_text_encoder(sd_root, tiny=tiny, dtype=dtype)
    mods = FineTunerModules(student=student, teacher=teacher, vae=vae,
                            text_encoder=text, schedule=build_schedule(cfg))
    frozen = {"teacher": dense_params, "vae": vae_params, "text": text_params}

    ft_cfg = FineTuneConfig(
        snr_gamma=cfg.training.losses.diffusion_loss.get("snr_gamma"),
        distillation_weight=cfg.training.losses.get("distillation_loss", {}).get("weight", 0.2),
        block_weight=cfg.training.losses.get("block_loss", {}).get("weight", 0.2),
        unet_lr=float(cfg.training.optim.get("unet_learning_rate", 1e-5)),
        scale_lr=cfg.training.optim.get("scale_lr", True),
    )
    mesh = data_mesh()
    global_batch = cfg.data.dataloader.get("train_batch_size", 8) * mesh.shape["data"]
    optimizer = make_finetune_optimizer(ft_cfg, global_batch)
    step = make_finetune_step(mods, ft_cfg, optimizer, mesh=mesh, donate=True)
    loop_cfg = LoopConfig(max_train_steps=cfg.training.get("max_train_steps", 30000),
                          checkpoints_total_limit=cfg.training.logging.get(
                              "checkpoints_total_limit", 1))
    loop = FineTuneLoop(step, None, jax.tree.map(jnp.asarray, student_params),
                        frozen, optimizer, loop_cfg, run_dir,
                        arch_vector=arch, seed=args.seed)

    resolution = ucfg.sample_size * 8
    data_dir = cfg.data.get("data_dir") or ""
    if os.path.exists(data_dir):
        from diffusion_pruning_tpu.data import get_dataset
        from diffusion_pruning_tpu.data.loader import DataPipeline
        from diffusion_pruning_tpu.data.tokenizers import build_clip_tokenizer
        clip_tok = build_clip_tokenizer(sd_root, vocab_size=text.cfg.vocab_size)

        def tok_clip(caps):
            return np.asarray(clip_tok(caps, max_length=77, padding="max_length",
                                       truncation=True, return_tensors="np").input_ids)
        splits = get_dataset(cfg.data)
        pipe = DataPipeline(splits["train"], global_batch, resolution, tok_clip,
                            None, train=True, seed=args.seed)
        train_batches = pipe.epoch
    else:
        print(f"[smoke] synthetic data", file=sys.stderr)
        rng = np.random.RandomState(args.seed)

        def train_batches(_epoch=0):
            for _ in range(loop_cfg.max_train_steps):
                yield {"pixel_values": rng.randn(global_batch, resolution, resolution, 3
                                                 ).astype(np.float32) * 0.5,
                       "input_ids": rng.randint(0, 128, (global_batch, 77)).astype(np.int32)}

    loop.train(train_batches, place_batch=lambda b: shard_batch(mesh, b))
    print(f"done: {run_dir}")


if __name__ == "__main__":
    main()
