"""Build the COCO-30k FID reference set.

Equivalent of /root/reference/scripts/metrics/sample_coco_30k.py:10-62:
dedup COCO-2014 val by image, sample 30k with seed 42, save resized 256²
uint8 .npy images + the 30k annotations json.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--year", type=int, default=2014)
    p.add_argument("--n", type=int, default=30000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resolution", type=int, default=256)
    args = p.parse_args()

    ann_file = os.path.join(args.data_dir, "annotations", f"captions_val{args.year}.json")
    with open(ann_file) as f:
        ann = json.load(f)
    # dedup: one caption per image
    seen, rows = set(), []
    for a in ann["annotations"]:
        if a["image_id"] not in seen:
            seen.add(a["image_id"])
            rows.append(a)
    rng = np.random.RandomState(args.seed)
    idx = rng.choice(len(rows), size=min(args.n, len(rows)), replace=False)
    sample = [rows[i] for i in idx]

    img_dir = os.path.join(args.data_dir, "images", f"val{args.year}")
    os.makedirs(args.out_dir, exist_ok=True)
    kept = []
    for j, a in enumerate(sample):
        name = (f"COCO_val{args.year}_{a['image_id']:012d}.jpg"
                if args.year == 2014 else f"{a['image_id']:012d}.jpg")
        path = os.path.join(img_dir, name)
        try:
            img = Image.open(path).convert("RGB").resize(
                (args.resolution, args.resolution), Image.BILINEAR)
        except OSError:
            continue
        np.save(os.path.join(args.out_dir, f"{j:06d}.npy"),
                np.asarray(img, dtype=np.uint8))
        kept.append(a)
    with open(os.path.join(args.out_dir, "annotations_30k.json"), "w") as f:
        json.dump({"annotations": kept}, f)
    print(f"{len(kept)} images → {args.out_dir}")


if __name__ == "__main__":
    main()
