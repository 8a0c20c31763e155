"""Depth-gate ablation driver.

Equivalent of /root/reference/scripts/other/depth_analysis.py +
Trainer.depth_analysis (trainer.py:623-690) / pipeline depth_analysis
(pruning_pipelines.py:1449-1600): generate with an all-ones arch vector
whose chosen depth gates are zeroed, one ablation per depth index, to rank
subblock importance.
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

    from diffusion_pruning_tpu.core import build_structure
    from diffusion_pruning_tpu.models.unet.unet import GatedUNet
    from diffusion_pruning_tpu.training.factory import build_unet, unet_config_from_yaml
    from diffusion_pruning_tpu.utils.config import load_config

    cfg = load_config(args.base_config_path)
    sd_root = args.pretrained_model_name_or_path
    tiny = not os.path.exists(os.path.join(sd_root or "", "unet"))
    ucfg = unet_config_from_yaml(cfg, tiny=tiny)
    spec = build_structure(ucfg)
    model, params = build_unet(ucfg, sd_root)

    key = jax.random.PRNGKey(args.seed)
    ks = jax.random.split(key, 3)
    b = 2
    x = jax.random.normal(ks[0], (b, ucfg.sample_size, ucfg.sample_size, ucfg.in_channels))
    t = jnp.asarray([100, 600])
    ehs = jax.random.normal(ks[1], (b, ucfg.max_text_len, ucfg.cross_attention_dim))

    fwd = jax.jit(lambda a: model.apply({"params": params}, x, t, ehs, arch=a))
    dense = fwd(jnp.ones((b, spec.vq_dim)))
    names = [sb.name for sb in spec.subblocks if sb.depth_index >= 0]
    print("depth-gate ablation: output MSE vs dense (higher = more important)")
    for d in range(spec.num_depth):
        arch = jnp.ones((b, spec.vq_dim)).at[:, spec.num_width + d].set(0.0)
        out = fwd(arch)
        mse = float(jnp.mean((out - dense) ** 2))
        print(f"  depth {d:2d} ({names[d]:>18s}): {mse:.6f}")


if __name__ == "__main__":
    main()
