"""Precompute VAE latent moments for a dataset (data/latent_cache.py).

    python scripts/other/cache_latents.py --base_config_path configs/pruning/... \
        --pretrained_model_name_or_path /ckpts/sd-2-1 --cache_dir latents/coco_train

Training then runs with the cache (PrunerLoop consumes latent batches
directly), removing the frozen VAE encode from every step.
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
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(args.jax_cache_dir))

    from diffusion_pruning_tpu.data import get_dataset
    from diffusion_pruning_tpu.data.loader import DataPipeline
    from diffusion_pruning_tpu.data.latent_cache import build_latent_cache
    from diffusion_pruning_tpu.models.vae import AutoencoderKL
    from diffusion_pruning_tpu.training.factory import build_vae, unet_config_from_yaml
    from diffusion_pruning_tpu.utils.config import load_config

    cfg = load_config(args.base_config_path)
    cfg.update_flat(vars(args))
    sd_root = args.pretrained_model_name_or_path
    tiny = not os.path.exists(os.path.join(sd_root or "", "unet"))
    ucfg = unet_config_from_yaml(cfg, tiny=tiny)
    vae, vae_params = build_vae(sd_root, tiny=tiny, dtype=jnp.bfloat16)

    encode = jax.jit(lambda px: vae.apply({"params": vae_params}, px,
                                          method=AutoencoderKL.encode_moments))
    splits = get_dataset(cfg.data)
    resolution = ucfg.sample_size * vae.cfg.spatial_scale
    out_root = args.cache_dir or "latent_cache"
    for split, cols in splits.items():
        pipe = DataPipeline(cols, batch_size=32, resolution=resolution,
                            train=False, center_crop=True, random_flip=False,
                            seed=args.seed)
        shards = build_latent_cache(pipe.epoch(0), lambda px: encode(px),
                                    os.path.join(out_root, split))
        print(f"{split}: {len(shards)} shards → {os.path.join(out_root, split)}")


if __name__ == "__main__":
    main()
