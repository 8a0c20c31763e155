"""Stage-2 (expert fine-tuning) entry point.

Equivalent of /root/reference/scripts/aptp/finetune.py: pick codebook row
`--expert_id` from the stage-1 checkpoint's `quantizer_embeddings.pt`,
materialise the physically pruned expert (pretrained weight slices — an
improvement over the reference's prune-then-load quirk, SURVEY §2.1), and
fine-tune it with the dense U-Net as distillation teacher on the expert's
prompt subset.
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
    assert args.pruning_ckpt_dir and args.expert_id is not None, \
        "--pruning_ckpt_dir and --expert_id are required"
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(args.jax_cache_dir))

    from diffusion_pruning_tpu.core import build_structure
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
                           args.base_config_path,
                           (args.wandb_run_name or "") + f"-expert{args.expert_id}")
    init_logging(run_dir)

    sd_root = args.pretrained_model_name_or_path
    tiny = not os.path.exists(os.path.join(sd_root or "", "unet"))
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    ucfg = unet_config_from_yaml(cfg, tiny=tiny)
    spec = build_structure(ucfg)

    # expert arch vector = codebook row from the stage-1 checkpoint
    from diffusion_pruning_tpu.utils.checkpoint import latest_checkpoint_dir
    latest = latest_checkpoint_dir(args.pruning_ckpt_dir)
    emb_path = os.path.join(latest or args.pruning_ckpt_dir, "quantizer_embeddings.pt")
    embeddings = load_torch_artifact(emb_path)
    arch_vector = np.asarray(embeddings)[args.expert_id]
    from diffusion_pruning_tpu.utils.checkpoint import save_torch_artifact
    save_torch_artifact(arch_vector, os.path.join(run_dir, "arch_vector.pt"))

    mp = cfg.training.get("mixed_precision") or args.compute_dtype
    pdt = jnp.bfloat16 if mp in ("bf16", "bfloat16") else None
    # teacher is frozen — bf16 params halve its HBM footprint/traffic;
    # the STUDENT stays f32 (it trains)
    teacher, teacher_params = build_unet(ucfg, sd_root, dtype=dtype)
    frozen_teacher_params = teacher_params if pdt is None else jax.tree.map(
        lambda x: jnp.asarray(x, pdt), teacher_params)
    plan = make_expert_plan(spec, arch_vector)
    student = GatedUNet(ucfg, plan=plan, dtype=dtype)
    student_params = slice_expert_params(teacher_params, plan)
    print(f"expert {args.expert_id}: MACs ratio "
          f"{expert_macs_ratio(spec, plan):.3f} of dense", file=sys.stderr)

    vae, vae_params = build_vae(sd_root, tiny=tiny, dtype=dtype, param_dtype=pdt)
    text, text_params = build_text_encoder(sd_root, tiny=tiny, dtype=dtype, param_dtype=pdt)
    schedule = build_schedule(cfg)
    mods = FineTunerModules(student=student, teacher=teacher, vae=vae,
                            text_encoder=text, schedule=schedule)
    frozen = {"teacher": frozen_teacher_params, "vae": vae_params, "text": text_params}

    ft_cfg = FineTuneConfig(
        snr_gamma=cfg.training.losses.diffusion_loss.get("snr_gamma"),
        distillation_weight=cfg.training.losses.get("distillation_loss", {}).get("weight", 0.2),
        block_weight=cfg.training.losses.get("block_loss", {}).get("weight", 0.2),
        unet_lr=float(cfg.training.optim.get("unet_learning_rate", 1e-5)),
        lr_warmup_steps=cfg.training.optim.get("lr_warmup_steps", 100),
        scale_lr=cfg.training.optim.get("scale_lr", True),
    )
    # parallelism: 1-D data mesh (+ ZeRO-1) by default; optim.tensor_parallel
    # = M switches to a 2-D data×model mesh with the GSPMD step
    tp = int(cfg.training.optim.get("tensor_parallel", 1))
    n_total = len(jax.devices())
    opt_state = None
    if tp > 1:
        from diffusion_pruning_tpu.parallel.tp import dp_tp_mesh, shard_params
        from diffusion_pruning_tpu.training.finetuner import make_finetune_step_gspmd
        assert n_total % tp == 0, (n_total, tp)
        mesh = dp_tp_mesh(n_total // tp, tp)
        n_dev = n_total // tp
        global_batch = cfg.data.dataloader.get("train_batch_size", 8) * n_dev
        optimizer = make_finetune_optimizer(ft_cfg, global_batch)
        student_params = shard_params(mesh, jax.tree.map(jnp.asarray, student_params))
        frozen["teacher"] = shard_params(mesh, frozen["teacher"])
        step = make_finetune_step_gspmd(mods, ft_cfg, optimizer, mesh, donate=True)
        opt_state = optimizer.init(student_params)
    else:
        mesh = data_mesh()
        n_dev = mesh.shape["data"]
        global_batch = cfg.data.dataloader.get("train_batch_size", 8) * n_dev
        # ZeRO-1 (optim.zero1): shard the AdamW moments over the data axis —
        # ~6 GB/chip freed for the SD-2.1 U-Net on an 8-chip mesh
        zero1 = bool(cfg.training.optim.get("zero1", n_dev > 1))
        optimizer = make_finetune_optimizer(ft_cfg, global_batch, elementwise=zero1)
        step = make_finetune_step(
            mods, ft_cfg, optimizer, mesh=mesh, donate=True, zero1=zero1,
            accum_steps=int(cfg.training.get("gradient_accumulation_steps", 1)))
        if zero1:
            from diffusion_pruning_tpu.parallel.zero1 import init_global_opt_state
            opt_state = init_global_opt_state(
                optimizer, jax.tree.map(jnp.asarray, student_params), mesh)

    loop_cfg = LoopConfig(
        max_train_steps=cfg.training.get("max_train_steps", 30000),
        validation_steps=cfg.training.get("validation_steps", 1000),
        checkpoints_total_limit=cfg.training.logging.get("checkpoints_total_limit", 1),
        resume_from=cfg.training.logging.get("resume_from_checkpoint"),
    )
    loop = FineTuneLoop(step, None, jax.tree.map(jnp.asarray, student_params),
                        frozen, optimizer, loop_cfg, run_dir,
                        arch_vector=arch_vector, seed=args.seed,
                        opt_state=opt_state)

    resolution = ucfg.sample_size * 8
    data_dir = cfg.data.get("data_dir") or ""
    if os.path.exists(data_dir):
        from diffusion_pruning_tpu.data import get_dataset
        from diffusion_pruning_tpu.data.loader import DataPipeline
        from diffusion_pruning_tpu.data.tokenizers import build_clip_tokenizer
        clip_tok = build_clip_tokenizer(
            sd_root, vocab_size=mods.text_encoder.cfg.vocab_size)

        def tok_clip(caps):
            return np.asarray(clip_tok(caps, max_length=77, padding="max_length",
                                       truncation=True, return_tensors="np").input_ids)

        splits = get_dataset(cfg.data)
        # expert's prompt subset via the saved router assignment
        idx_path = os.path.join(args.pruning_ckpt_dir,
                                f"{cfg.data.dataset_name}_train_mapped_indices.pt")
        cols = splits["train"]
        if os.path.exists(idx_path):
            assigned = np.asarray(load_torch_artifact(idx_path))
            keep = np.nonzero(assigned == args.expert_id)[0]
            cols = {"image": [cols["image"][i] for i in keep],
                    "caption": [cols["caption"][i] for i in keep]}
            print(f"expert {args.expert_id}: {len(keep)} assigned prompts", file=sys.stderr)
        pipe = DataPipeline(cols, global_batch, resolution, tok_clip, None,
                            train=True, seed=args.seed)
        train_batches = pipe.epoch
    else:
        print(f"[smoke] dataset dir {data_dir!r} missing — synthetic data", file=sys.stderr)
        rng = np.random.RandomState(args.seed)

        def train_batches(_epoch=0):
            for _ in range(loop_cfg.max_train_steps):
                yield {"pixel_values": rng.randn(global_batch, resolution, resolution, 3
                                                 ).astype(np.float32) * 0.5,
                       "input_ids": rng.randint(0, 128, (global_batch, 77)).astype(np.int32)}

    loop.train(train_batches, place_batch=lambda b: shard_batch(mesh, b))
    from diffusion_pruning_tpu.utils.model_card import write_model_card
    write_model_card(run_dir, sd_root or "stable-diffusion-2-1",
                     cfg.data.get("dataset_name", "?"), expert_id=args.expert_id,
                     macs_ratio=expert_macs_ratio(spec, plan),
                     extra={"max_train_steps": loop_cfg.max_train_steps,
                            "unet_lr": ft_cfg.unet_lr})
    from diffusion_pruning_tpu.utils.hub import maybe_push_to_hub
    maybe_push_to_hub(cfg, run_dir)
    print(f"done: {run_dir}")


if __name__ == "__main__":
    main()
