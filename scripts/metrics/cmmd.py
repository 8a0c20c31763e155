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


def _load_images(path, files):
    imgs = []
    for f in files:
        fp = os.path.join(path, f)
        if f.endswith(".npy"):
            imgs.append(np.load(fp))
        else:
            from PIL import Image
            imgs.append(np.asarray(Image.open(fp).convert("RGB")))
    return imgs


def embed_dir(path: str, model, proc, batch_size: int = 16) -> np.ndarray:
    import torch
    if path.endswith(".npy"):
        return np.load(path)
    files = sorted(f for f in os.listdir(path) if f.endswith((".npy", ".png", ".jpg")))
    feats = []
    with torch.no_grad():
        for i in range(0, len(files), batch_size):
            imgs = _load_images(path, files[i:i + batch_size])
            inputs = proc(images=imgs, return_tensors="pt")
            e = model.get_image_features(pixel_values=inputs["pixel_values"])
            e = e / e.norm(dim=-1, keepdim=True)
            feats.append(e.numpy())
    return np.concatenate(feats)


def embed_dir_jax(path: str, clip_model_dir: str, batch_size: int = 16) -> np.ndarray:
    """TPU path: the flax CLIP vision tower (models/clip_vision.py, golden-
    parity-tested vs transformers) embeds 30k-image directories in minutes
    instead of CPU-torch hours. Weights convert from the same local
    checkpoint."""
    import jax
    import jax.numpy as jnp
    from diffusion_pruning_tpu.models.clip_vision import (
        CLIPVisionConfig, CLIPVisionEncoder,
    )
    from diffusion_pruning_tpu.models.convert import (
        convert_clip_vision_state_dict, load_torch_state_dict,
    )
    from diffusion_pruning_tpu.models.safety import clip_preprocess

    if path.endswith(".npy"):
        return np.load(path)
    cfg = CLIPVisionConfig.vit_l14_336()
    sd = load_torch_state_dict(clip_model_dir)
    params = convert_clip_vision_state_dict(sd, cfg)
    enc = CLIPVisionEncoder(cfg, dtype=jnp.bfloat16)

    @jax.jit
    def embed(p, px):
        _, e = enc.apply({"params": p}, px)
        e = e.astype(jnp.float32)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

    files = sorted(f for f in os.listdir(path) if f.endswith((".npy", ".png", ".jpg")))
    feats = []
    for i in range(0, len(files), batch_size):
        chunk = files[i:i + batch_size]
        imgs = _load_images(path, chunk)
        imgs = np.stack([np.asarray(im, np.float32) / 255.0 for im in imgs])
        if len(chunk) < batch_size:  # static shapes
            imgs = np.concatenate([imgs, np.zeros(
                (batch_size - len(chunk), *imgs.shape[1:]), np.float32)])
        px = clip_preprocess(jnp.asarray(imgs), cfg.image_size)
        feats.append(np.asarray(embed(params, px))[: len(chunk)])
    return np.concatenate(feats)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("gen_dir")
    p.add_argument("ref")
    p.add_argument("--clip_model", required=True)
    p.add_argument("--sigma", type=float, default=10.0)
    p.add_argument("--scale", type=float, default=1000.0)
    p.add_argument("--save_ref_embeddings", default=None)
    p.add_argument("--backend", choices=("torch", "jax"), default="torch",
                   help="jax = flax ViT-L/14-336 tower on the accelerator")
    args = p.parse_args()

    from diffusion_pruning_tpu.metrics import cmmd

    if args.backend == "jax":
        ref = embed_dir_jax(args.ref, args.clip_model)
        gen = embed_dir_jax(args.gen_dir, args.clip_model)
    else:
        from transformers import CLIPModel, CLIPProcessor
        model = CLIPModel.from_pretrained(args.clip_model).eval()
        proc = CLIPProcessor.from_pretrained(args.clip_model)
        ref = embed_dir(args.ref, model, proc)
        gen = embed_dir(args.gen_dir, model, proc)
    if args.save_ref_embeddings:
        np.save(args.save_ref_embeddings, ref)
    print(f"CMMD: {cmmd(ref, gen, args.sigma, args.scale):.4f}")


if __name__ == "__main__":
    main()
