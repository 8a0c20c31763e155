"""Resize a directory of images to uint8 .npy files (FID/CLIP reference prep;
reference scripts/metrics/resize_and_save_images.py)."""
import argparse
import os

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src_dir")
    p.add_argument("out_dir")
    p.add_argument("--resolution", type=int, default=256)
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(args.src_dir)):
        if not name.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        try:
            img = Image.open(os.path.join(args.src_dir, name)).convert("RGB")
        except OSError:
            continue
        img = img.resize((args.resolution, args.resolution), Image.BILINEAR)
        np.save(os.path.join(args.out_dir, os.path.splitext(name)[0] + ".npy"),
                np.asarray(img, dtype=np.uint8))
        n += 1
    print(f"{n} images → {args.out_dir}")


if __name__ == "__main__":
    main()
