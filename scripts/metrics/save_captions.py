"""Save the validation captions aligned with generated images as json
(CLIP-score input; fixes the reference's broken save_captions.py import)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base_config_path", required=True)
    p.add_argument("--pruning_ckpt_dir", default=None)
    p.add_argument("--expert_id", type=int, default=None)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from diffusion_pruning_tpu.data import get_dataset
    from diffusion_pruning_tpu.utils.checkpoint import load_torch_artifact
    from diffusion_pruning_tpu.utils.config import load_config
    import numpy as np

    cfg = load_config(args.base_config_path)
    caps = get_dataset(cfg.data)["validation"]["caption"]
    if args.pruning_ckpt_dir and args.expert_id is not None:
        idx_path = os.path.join(args.pruning_ckpt_dir,
                                f"{cfg.data.dataset_name}_validation_mapped_indices.pt")
        assigned = np.asarray(load_torch_artifact(idx_path))
        caps = [caps[i] for i in np.nonzero(assigned == args.expert_id)[0]]
    with open(args.out, "w") as f:
        json.dump(list(caps), f)
    print(f"{len(caps)} captions → {args.out}")


if __name__ == "__main__":
    main()
