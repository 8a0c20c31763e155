"""Baseline FID-image generation (dense SD / magnitude / random / structural).

Equivalent of the reference's scripts/baselines/{sd,magnitude,structural}/
generate_images.py family: PNDM 25 steps, 256² uint8 .npy outputs.
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
    from diffusion_pruning_tpu.data import get_dataset
    from diffusion_pruning_tpu.models.hypernet import random_arch_vector
    from diffusion_pruning_tpu.models.unet.magnitude import magnitude_arch_vector
    from diffusion_pruning_tpu.models.unet.pruned import make_expert_plan, slice_expert_params
    from diffusion_pruning_tpu.models.unet.unet import GatedUNet
    from diffusion_pruning_tpu.pipelines import PruningPipeline
    from diffusion_pruning_tpu.schedulers import DiffusionSchedule
    from diffusion_pruning_tpu.training.factory import (
        build_text_encoder, build_unet, build_vae, unet_config_from_yaml,
    )
    from diffusion_pruning_tpu.utils.checkpoint import CheckpointManager, load_torch_artifact
    from diffusion_pruning_tpu.utils.config import load_config

    cfg = load_config(args.base_config_path)
    cfg.update_flat(vars(args))
    sd_root = args.pretrained_model_name_or_path
    tiny = not os.path.exists(os.path.join(sd_root or "", "unet"))
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    ucfg = unet_config_from_yaml(cfg, tiny=tiny)
    spec = build_structure(ucfg)
    dense_model, dense_params = build_unet(ucfg, sd_root, dtype=dtype)

    target = cfg.training.losses.resource_loss.get("pruning_target", 0.6)
    if pruning_type == "no-pruning":
        model, params = dense_model, dense_params
    else:
        if pruning_type == "magnitude":
            arch = magnitude_arch_vector(spec, dense_params, target, seed=args.seed)
        elif pruning_type == "random":
            arch = np.asarray(random_arch_vector(jax.random.PRNGKey(args.seed), spec, target))
        else:  # structural
            arch = np.asarray(load_torch_artifact(
                os.path.join(args.finetuning_ckpt_dir, "arch_vector.pt")))
        plan = make_expert_plan(spec, np.asarray(arch).reshape(-1))
        model = GatedUNet(ucfg, plan=plan, dtype=dtype)
        params = slice_expert_params(dense_params, plan)
        if args.finetuning_ckpt_dir:
            mgr = CheckpointManager(args.finetuning_ckpt_dir)
            # template-free: saved opt_state isn't reconstructible here
            params = mgr.restore()["params"]

    vae, vae_params = build_vae(sd_root, tiny=tiny, dtype=dtype)
    text, text_params = build_text_encoder(sd_root, tiny=tiny, dtype=dtype)
    pipe = PruningPipeline(unet=model, unet_params=jax.tree.map(jnp.asarray, params),
                           vae=vae, vae_params=vae_params,
                           text_encoder=text, text_params=text_params,
                           schedule=DiffusionSchedule(),
                           sampler=cfg.training.get("sampler", "pndm"))

    splits = get_dataset(cfg.data)
    caps = splits["validation"]["caption"]
    max_n = cfg.data.get("max_generated_samples")
    if max_n:
        caps = caps[:max_n]
    from diffusion_pruning_tpu.data.tokenizers import build_clip_tokenizer
    clip_tok = build_clip_tokenizer(sd_root, vocab_size=text.cfg.vocab_size)

    def tok(c):
        return jnp.asarray(clip_tok(c, max_length=77, padding="max_length",
                                    truncation=True, return_tensors="np").input_ids)

    out_dir = os.path.join(cfg.training.logging.get("logging_dir", "runs"),
                           f"fid_images_baseline_{pruning_type}")
    os.makedirs(out_dir, exist_ok=True)
    bs = cfg.data.dataloader.get("image_generation_batch_size", 4)
    steps = cfg.training.get("num_inference_steps", 25)
    key = jax.random.PRNGKey(args.seed)
    for b in range(0, len(caps), bs):
        chunk = list(caps[b:b + bs])
        if len(chunk) < bs:
            chunk += [""] * (bs - len(chunk))
        key, sub = jax.random.split(key)
        imgs = pipe.generate_samples(tok(chunk), tok([""] * bs), sub,
                                     arch=None, num_inference_steps=steps)
        imgs = (np.asarray(imgs) * 255).astype(np.uint8)
        for j in range(len(caps[b:b + bs])):
            np.save(os.path.join(out_dir, f"{b + j:06d}.npy"), imgs[j])
    print(out_dir)


if __name__ == "__main__":
    main()
