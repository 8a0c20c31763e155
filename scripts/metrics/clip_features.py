"""Precompute CLIP text features for CLIP-score (reference
scripts/metrics/clip_features.py): one .npy per caption, from a LOCAL CLIP
checkpoint."""
import argparse
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--captions", required=True, help="json list of captions")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--clip_model", required=True)
    p.add_argument("--batch_size", type=int, default=64)
    args = p.parse_args()

    import torch
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(args.clip_model).eval()
    proc = CLIPProcessor.from_pretrained(args.clip_model)
    with open(args.captions) as f:
        captions = json.load(f)
    os.makedirs(args.out_dir, exist_ok=True)
    with torch.no_grad():
        for i in range(0, len(captions), args.batch_size):
            chunk = captions[i:i + args.batch_size]
            inputs = proc(text=chunk, return_tensors="pt", padding=True, truncation=True)
            feats = model.get_text_features(**inputs).numpy()
            for j, f_ in enumerate(feats):
                np.save(os.path.join(args.out_dir, f"{i + j:06d}.npy"), f_)
    print(f"{len(captions)} text features → {args.out_dir}")


if __name__ == "__main__":
    main()
