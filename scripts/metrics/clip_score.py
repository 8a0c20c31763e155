"""CLIP-score between generated .npy images and their prompts.

Equivalent of /root/reference/scripts/metrics/clip_score.py +
pdm/utils/clip_utils.py:141-170: ViT-B/32 cosine × logit-scale over aligned
pairs. The CLIP model loads from a LOCAL transformers checkpoint dir.

  python scripts/metrics/clip_score.py GEN_DIR --captions captions.json \
      --clip_model /path/to/clip-vit-base-patch32
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("gen_dir")
    p.add_argument("--captions", required=True, help="json list aligned with sorted .npy files")
    p.add_argument("--clip_model", required=True)
    p.add_argument("--batch_size", type=int, default=32)
    args = p.parse_args()

    import torch
    from transformers import CLIPModel, CLIPProcessor
    from diffusion_pruning_tpu.metrics import clip_score

    model = CLIPModel.from_pretrained(args.clip_model).eval()
    proc = CLIPProcessor.from_pretrained(args.clip_model)
    with open(args.captions) as f:
        captions = json.load(f)
    files = sorted(f for f in os.listdir(args.gen_dir) if f.endswith(".npy"))
    assert len(files) == len(captions), (len(files), len(captions))

    img_feats, txt_feats = [], []
    with torch.no_grad():
        for i in range(0, len(files), args.batch_size):
            imgs = [np.load(os.path.join(args.gen_dir, f)) for f in files[i:i + args.batch_size]]
            caps = captions[i:i + args.batch_size]
            inputs = proc(text=caps, images=imgs, return_tensors="pt",
                          padding=True, truncation=True)
            img_feats.append(model.get_image_features(
                pixel_values=inputs["pixel_values"]).numpy())
            txt_feats.append(model.get_text_features(
                input_ids=inputs["input_ids"],
                attention_mask=inputs["attention_mask"]).numpy())
    score = clip_score(np.concatenate(img_feats), np.concatenate(txt_feats),
                       logit_scale=float(model.logit_scale.exp()))
    print(f"CLIP-score: {score:.4f}")


if __name__ == "__main__":
    main()
