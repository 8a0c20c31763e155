"""FID between generated .npy images and reference stats.

Equivalent of /root/reference/scripts/metrics/fid.py:10-31. Uses clean-fid
when installed (same `legacy_pytorch` mode); otherwise falls back to the
native Fréchet-distance implementation with a locally-provided feature
extractor.

  python scripts/metrics/fid.py GEN_DIR --ref_stats ref_stats.npz \
      [--inception /path/to/inception.pt]

Extractor contract (--inception): a TorchScript module mapping NCHW float
images to (N, D) features — produce one from a local torchvision install
with `torch.jit.trace(torchvision.models.inception_v3(...), example)` and
clean-fid reference stats stay comparable. Neither clean-fid nor InceptionV3
weights ship in this environment (no egress), so CI exercises this path with
a stub extractor (tests/test_metrics.py::test_fid_script_fallback_executes);
real-FID runs require dropping the weights file in locally.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def inception_features(image_dir: str, model_path: str, batch_size: int = 32):
    import torch
    model = torch.jit.load(model_path).eval()
    files = sorted(f for f in os.listdir(image_dir) if f.endswith(".npy"))
    feats = []
    with torch.no_grad():
        for i in range(0, len(files), batch_size):
            imgs = np.stack([np.load(os.path.join(image_dir, f))
                             for f in files[i:i + batch_size]])
            x = torch.from_numpy(imgs).permute(0, 3, 1, 2).float()
            feats.append(model(x).numpy())
    return np.concatenate(feats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("gen_dir")
    p.add_argument("--ref_stats", required=True,
                   help=".npz with mu/sigma, or an image dir to compute from")
    p.add_argument("--inception", default=None,
                   help="local InceptionV3 TorchScript file (native mode)")
    p.add_argument("--dataset_name", default="custom")
    args = p.parse_args()

    try:
        from cleanfid import fid as cleanfid
        score = cleanfid.compute_fid(args.gen_dir, dataset_name=args.dataset_name,
                                     mode="legacy_pytorch", dataset_split="custom")
        print(f"FID: {score:.4f}")
        return
    except ImportError:
        pass

    from diffusion_pruning_tpu.metrics import frechet_distance, gaussian_stats
    assert args.inception, "clean-fid not installed: provide --inception weights"
    gen_feats = inception_features(args.gen_dir, args.inception)
    mu_g, sig_g = gaussian_stats(gen_feats)
    if args.ref_stats.endswith(".npz"):
        ref = np.load(args.ref_stats)
        mu_r, sig_r = ref["mu"], ref["sigma"]
    else:
        ref_feats = inception_features(args.ref_stats, args.inception)
        mu_r, sig_r = gaussian_stats(ref_feats)
    print(f"FID: {frechet_distance(mu_g, sig_g, mu_r, sig_r):.4f}")


if __name__ == "__main__":
    main()
