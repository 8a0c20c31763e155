"""Stage-1 (APTP pruning) entry point.

Equivalent of /root/reference/scripts/aptp/prune.py: YAML config + CLI args
→ Pruner training. TPU-native: one jitted SPMD step over a data mesh.

  python scripts/aptp/prune.py --base_config_path configs/pruning/sd-2-1_coco2014.yaml \
      --pretrained_model_name_or_path /path/to/sd-2-1 \
      --prompt_encoder_model_name_or_path /path/to/all-mpnet-base-v2

With missing checkpoint/dataset paths the script runs in smoke mode (tiny
random models + synthetic data) so the full pipeline stays executable in CI.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from diffusion_pruning_tpu.utils.arg_utils import parse_args
    from diffusion_pruning_tpu.utils.launch import init_distributed
    args = parse_args()
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(args.jax_cache_dir))
    init_distributed()

    from diffusion_pruning_tpu.data import get_dataset
    from diffusion_pruning_tpu.data.loader import DataPipeline
    from diffusion_pruning_tpu.models.text_encoders import mean_pool
    from diffusion_pruning_tpu.parallel import data_mesh, shard_batch
    from diffusion_pruning_tpu.training import PrunerConfig, PrunerModules, make_pruner_step
    from diffusion_pruning_tpu.training.factory import (
        build_hypernet, build_mpnet, build_quantizer, build_schedule,
        build_text_encoder, build_unet, build_vae, unet_config_from_yaml,
    )
    from diffusion_pruning_tpu.training.loop import LoopConfig, PrunerLoop
    from diffusion_pruning_tpu.training.pruner import make_optimizer, make_validation_step
    from diffusion_pruning_tpu.utils.config import load_config
    from diffusion_pruning_tpu.utils.logging_utils import Tracker, init_logging, make_run_dir

    cfg = load_config(args.base_config_path)
    cfg.update_flat(vars(args))
    run_dir = make_run_dir(cfg.training.logging.get("logging_dir", "runs"),
                           args.base_config_path, args.wandb_run_name)
    init_logging(run_dir)
    cfg.dump(os.path.join(run_dir, "config.yaml"))

    sd_root = args.pretrained_model_name_or_path
    tiny = not os.path.exists(os.path.join(sd_root or "", "unet"))
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32

    ucfg = unet_config_from_yaml(cfg, tiny=tiny)
    from diffusion_pruning_tpu.core import build_structure
    spec = build_structure(ucfg)
    # frozen-model mixed precision (reference trainer.py:456-466): the
    # U-Net / VAE / text encoder are all frozen in stage 1 — their params
    # follow training.mixed_precision (default = the compute dtype)
    mp = cfg.training.get("mixed_precision") or args.compute_dtype
    pdt = jnp.bfloat16 if mp in ("bf16", "bfloat16") else None
    unet, unet_params = build_unet(ucfg, sd_root, dtype=dtype, param_dtype=pdt)
    vae, vae_params = build_vae(sd_root, tiny=tiny, dtype=dtype, param_dtype=pdt)
    text, text_params = build_text_encoder(sd_root, tiny=tiny, dtype=dtype, param_dtype=pdt)
    mpnet, mpnet_params = build_mpnet(args.prompt_encoder_model_name_or_path, tiny=tiny)
    mp_dim = 768 if not tiny else mpnet.cfg.hidden_size
    hypernet, hn_params = build_hypernet(spec, cfg, input_dim=mp_dim)
    quantizer, q_params = build_quantizer(spec, cfg)
    schedule = build_schedule(cfg)

    mods = PrunerModules(unet=unet, vae=vae, text_encoder=text,
                         hypernet=hypernet, quantizer=quantizer, schedule=schedule)
    frozen = {"unet": unet_params, "vae": vae_params, "text": text_params}
    trainable = {"hypernet": hn_params, "quantizer": q_params}

    losses = cfg.training.losses
    pruner_cfg = PrunerConfig(
        snr_gamma=losses.diffusion_loss.get("snr_gamma"),
        diffusion_weight=losses.diffusion_loss.get("weight", 1.0),
        resource_weight=losses.resource_loss.get("weight", 2.0),
        resource_type=losses.resource_loss.get("type", "log"),
        pruning_target=losses.resource_loss.get("pruning_target", 0.6),
        contrastive_weight=losses.contrastive_loss.get("weight", 100.0),
        arch_temperature=losses.contrastive_loss.get("arch_vector_temperature", 0.03),
        prompt_temperature=losses.contrastive_loss.get("prompt_embedding_temperature", 0.03),
        distillation_weight=losses.distillation_loss.get("weight", 0.2),
        block_weight=losses.block_loss.get("weight", 0.2),
        std_weight=losses.std_loss.get("weight", 0.1),
        max_weight=losses.max_loss.get("weight", 0.1),
        hypernet_lr=float(cfg.training.optim.get("hypernet_learning_rate", 2e-4)),
        quantizer_lr=float(cfg.training.optim.get("quantizer_learning_rate", 2e-4)),
        lr_warmup_steps=cfg.training.optim.get("lr_warmup_steps", 100),
        scale_lr=cfg.training.optim.get("scale_lr", True),
        max_grad_norm=cfg.training.optim.get("max_grad_norm"),
        noise_offset=cfg.model.unet.get("noise_offset", 0.0) or 0.0,
        input_perturbation=cfg.model.unet.get("input_perturbation", 0.0) or 0.0,
        max_scheduler_steps=cfg.model.unet.get("max_scheduler_steps"),
    )
    mesh = data_mesh()
    n_dev = mesh.shape["data"]
    batch_per_dev = cfg.data.dataloader.get("train_batch_size", 8)
    global_batch = batch_per_dev * n_dev
    optimizer = make_optimizer(pruner_cfg, global_batch)

    loop_cfg = LoopConfig(
        max_train_steps=cfg.training.get("max_train_steps", 5000),
        hypernet_pretraining_steps=cfg.training.get("hypernet_pretraining_steps", 500),
        validation_steps=cfg.training.get("validation_steps", 1000),
        image_logging_steps=cfg.training.get("image_logging_steps", 1000),
        checkpoints_total_limit=cfg.training.logging.get("checkpoints_total_limit", 1),
        resume_from=cfg.training.logging.get("resume_from_checkpoint"),
    )

    # ---------------- data ----------------
    resolution = ucfg.sample_size * 8
    embed_mpnet = jax.jit(lambda ids, mask: mean_pool(
        mpnet.apply({"params": mpnet_params}, ids, mask), mask))

    data_dir = cfg.data.get("data_dir") or ""
    if os.path.exists(data_dir):
        from diffusion_pruning_tpu.data.tokenizers import (
            build_clip_tokenizer, build_mpnet_tokenizer)
        clip_tok = build_clip_tokenizer(sd_root, vocab_size=text.cfg.vocab_size)
        mp_tok = build_mpnet_tokenizer(args.prompt_encoder_model_name_or_path,
                                       vocab_size=mpnet.cfg.vocab_size)

        def tok_clip(caps):
            return np.asarray(clip_tok(caps, max_length=77, padding="max_length",
                                       truncation=True, return_tensors="np").input_ids)

        def tok_mp(caps):
            # cap at the model's position table (tiny smoke MPNet has 64)
            mp_len = min(128, mpnet.cfg.max_positions)
            enc = mp_tok(caps, padding="max_length", max_length=mp_len,
                         truncation=True, return_tensors="np")
            return {"mpnet_input_ids": enc.input_ids,
                    "mpnet_attention_mask": enc.attention_mask}

        splits = get_dataset(cfg.data)
        train_pipe = DataPipeline(splits["train"], global_batch, resolution,
                                  tok_clip, tok_mp, train=True,
                                  center_crop=cfg.data.dataloader.get("center_crop", False),
                                  random_flip=cfg.data.dataloader.get("random_flip", True),
                                  seed=args.seed,
                                  max_samples=cfg.data.get("max_train_samples"))
        val_pipe = DataPipeline(splits["validation"],
                                cfg.data.dataloader.get("validation_batch_size", 16) * n_dev,
                                resolution, tok_clip, tok_mp, train=False,
                                seed=args.seed,
                                max_samples=cfg.data.get("max_validation_samples"))

        def train_batches(epoch):
            for b in train_pipe.epoch(epoch):
                b["mpnet_embeddings"] = np.asarray(
                    embed_mpnet(b.pop("mpnet_input_ids"), b.pop("mpnet_attention_mask")))
                yield b

        def val_batches():
            for b in val_pipe.epoch(0):
                b["mpnet_embeddings"] = np.asarray(
                    embed_mpnet(b.pop("mpnet_input_ids"), b.pop("mpnet_attention_mask")))
                yield b
    else:
        print(f"[smoke] dataset dir {data_dir!r} missing — synthetic data", file=sys.stderr)
        rng = np.random.RandomState(args.seed)

        def synth(n):
            def gen(_epoch=0):
                for _ in range(n):
                    yield {
                        "pixel_values": rng.randn(global_batch, resolution, resolution, 3
                                                  ).astype(np.float32) * 0.5,
                        "input_ids": rng.randint(0, 128, (global_batch, 77)).astype(np.int32),
                        "mpnet_embeddings": rng.randn(global_batch, mp_dim).astype(np.float32),
                    }
            return gen
        train_batches = synth(max(loop_cfg.max_train_steps, 1))
        val_batches = lambda: synth(2)(0)

    import functools
    accum = int(cfg.training.get("gradient_accumulation_steps", 1))
    make_step = (functools.partial(make_pruner_step, accum_steps=accum)
                 if accum > 1 else make_pruner_step)
    loop = PrunerLoop(mods, pruner_cfg, loop_cfg, optimizer,
                      make_step, make_validation_step,
                      trainable, frozen, run_dir, mesh=mesh,
                      tracker=Tracker(run_dir,
                                      use_wandb=cfg.training.logging.get("report_to") == "wandb"),
                      seed=args.seed)
    # the reference writes a unet/ subfolder in every pruning checkpoint
    # (trainer.py:253-313) — the U-Net is frozen in stage 1, so this is the
    # pretrained weights re-exported; downstream reference tooling expects it
    if cfg.training.logging.get("export_unet", True):
        loop.export_unet_ref = (ucfg, frozen["unet"])

    # periodic routed sample generation from fixed prompts
    # (trainer.py:996-1001 / generate_samples_from_prompts)
    prompts = cfg.data.get("prompts")
    if prompts and os.path.exists(data_dir):
        from diffusion_pruning_tpu.pipelines import PruningPipeline
        from diffusion_pruning_tpu.utils.logging_utils import image_grid

        def image_logger(lp):
            pipe = PruningPipeline(
                unet=unet, unet_params=frozen["unet"],
                vae=vae, vae_params=frozen["vae"],
                text_encoder=text, text_params=frozen["text"],
                hypernet=hypernet, hypernet_params=lp.trainable["hypernet"],
                quantizer=quantizer, quantizer_params=lp.trainable["quantizer"],
                quantizer_state=lp.q_state, schedule=schedule)
            ids = tok_clip(list(prompts))
            neg = tok_clip([""] * len(prompts))
            emb = embed_mpnet(*[v for v in tok_mp(list(prompts)).values()])
            imgs, idx, _ = pipe(jnp.asarray(ids), jnp.asarray(neg),
                                jax.random.PRNGKey(lp.global_step),
                                hyper_net_input=jnp.asarray(emb),
                                num_inference_steps=cfg.training.get(
                                    "num_inference_steps", 50))
            out = os.path.join(run_dir, "samples")
            os.makedirs(out, exist_ok=True)
            grid = image_grid(np.asarray(imgs))
            grid.save(os.path.join(out, f"samples_{lp.global_step}.png"))
            # unconditional generation from EVERY codebook entry — the
            # reference's log_quantizer_embedding_samples
            # (trainer.py:1001,1308-1402): empty prompt, no CFG, one image
            # per expert architecture from the embedding_gs snapshot
            n_e = quantizer.n_e
            ids_u = jnp.asarray(tok_clip([""] * n_e))
            q_imgs = pipe.quantizer_samples(
                ids_u, ids_u, jax.random.PRNGKey(lp.global_step),
                expert_ids=list(range(n_e)), guidance_scale=1.0,
                num_inference_steps=cfg.training.get("num_inference_steps", 50))
            q_grid = image_grid(np.asarray(q_imgs))
            q_grid.save(os.path.join(out, f"quantizer_samples_{lp.global_step}.png"))
            lp.tracker.log_images({"validation_samples": grid,
                                   "quantizer_embedding_samples": q_grid},
                                  lp.global_step)

        loop.image_logger = image_logger
    loop.train(train_batches, val_batches, place_batch=lambda b: shard_batch(mesh, b))
    from diffusion_pruning_tpu.utils.hub import maybe_push_to_hub
    maybe_push_to_hub(cfg, run_dir)
    print(f"done: {run_dir}")


if __name__ == "__main__":
    main()
