"""Offline MACs / resource-ratio report for all experts.

Equivalent of /root/reference/scripts/other/calculate_pruning_ratio.py:84-122
— prints each codebook expert's MACs ratio and parameter count, computed
analytically from the structure spec (no forward passes needed).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    from diffusion_pruning_tpu.utils.arg_utils import parse_args
    args = parse_args()
    assert args.pruning_ckpt_dir

    from diffusion_pruning_tpu.core import ResourceModel, build_structure
    from diffusion_pruning_tpu.models.unet.pruned import expert_macs_ratio, make_expert_plan
    from diffusion_pruning_tpu.training.factory import unet_config_from_yaml
    from diffusion_pruning_tpu.utils.checkpoint import load_torch_artifact
    from diffusion_pruning_tpu.utils.config import load_config

    cfg = load_config(args.base_config_path)
    tiny = not os.path.exists(os.path.join(args.pretrained_model_name_or_path or "", "unet"))
    ucfg = unet_config_from_yaml(cfg, tiny=tiny)
    spec = build_structure(ucfg)
    rm = ResourceModel(spec)

    from diffusion_pruning_tpu.utils.checkpoint import latest_checkpoint_dir
    latest = latest_checkpoint_dir(args.pruning_ckpt_dir)
    emb_path = os.path.join(latest or args.pruning_ckpt_dir, "quantizer_embeddings.pt")
    embeddings = np.asarray(load_torch_artifact(emb_path))
    print(f"dense total MACs: {spec.total_macs / 1e9:.2f} G "
          f"(prunable {spec.prunable_macs / 1e9:.2f} G)")
    for i, arch in enumerate(embeddings):
        plan = make_expert_plan(spec, arch)
        ratio = expert_macs_ratio(spec, plan)
        dropped = sum(sb.dropped for sb in plan.subblocks)
        width_keep = float(np.mean([(arch[s.start:s.start + s.width] >= 0.5).mean()
                                    for sb in spec.subblocks for s in sb.sites]))
        print(f"expert {i}: MACs ratio {ratio:.3f}  dropped subblocks {dropped}/"
              f"{spec.num_depth}  mean width keep {width_keep:.3f}")


if __name__ == "__main__":
    main()
