"""CMMD between generated images and reference images/embeddings.

Equivalent of the vendored /root/reference/cmmd-pytorch/ (compute_cmmd.py,
embedding.py, distance.py): CLIP-ViT-L/14-336 image embeddings, RBF-kernel
MMD with σ=10 scaled ×1000. The CLIP model loads from a LOCAL checkpoint.

  python scripts/metrics/cmmd.py GEN_DIR REF_DIR_OR_NPY --clip_model /path/to/clip-vit-large-patch14-336
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def embed_dir(path: str, model, proc, batch_size: int = 16) -> np.ndarray:
    import torch
    if path.endswith(".npy"):
        return np.load(path)
    files = sorted(f for f in os.listdir(path) if f.endswith((".npy", ".png", ".jpg")))
    feats = []
    with torch.no_grad():
        for i in range(0, len(files), batch_size):
            imgs = []
            for f in files[i:i + batch_size]:
                fp = os.path.join(path, f)
                if f.endswith(".npy"):
                    imgs.append(np.load(fp))
                else:
                    from PIL import Image
                    imgs.append(np.asarray(Image.open(fp).convert("RGB")))
            inputs = proc(images=imgs, return_tensors="pt")
            e = model.get_image_features(pixel_values=inputs["pixel_values"])
            e = e / e.norm(dim=-1, keepdim=True)
            feats.append(e.numpy())
    return np.concatenate(feats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("gen_dir")
    p.add_argument("ref")
    p.add_argument("--clip_model", required=True)
    p.add_argument("--sigma", type=float, default=10.0)
    p.add_argument("--scale", type=float, default=1000.0)
    p.add_argument("--save_ref_embeddings", default=None)
    args = p.parse_args()

    from transformers import CLIPModel, CLIPProcessor
    from diffusion_pruning_tpu.metrics import cmmd

    model = CLIPModel.from_pretrained(args.clip_model).eval()
    proc = CLIPProcessor.from_pretrained(args.clip_model)
    ref = embed_dir(args.ref, model, proc)
    if args.save_ref_embeddings:
        np.save(args.save_ref_embeddings, ref)
    gen = embed_dir(args.gen_dir, model, proc)
    print(f"CMMD: {cmmd(ref, gen, args.sigma, args.scale):.4f}")


if __name__ == "__main__":
    main()
