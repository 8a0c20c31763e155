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
    p.add_argument("--backend", choices=("torch", "jax"), default="torch",
                   help="jax = flax CLIP towers on the accelerator "
                        "(models/clip_vision.py + clip_pooled_text_features)")
    args = p.parse_args()

    if args.backend == "jax":
        return main_jax(args)

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


def main_jax(args):
    """Accelerator path: flax CLIP vision + text towers (golden-parity-tested
    vs transformers), weights converted from the same local checkpoint."""
    import json as _json

    import jax
    import jax.numpy as jnp
    from transformers import CLIPTokenizer

    from diffusion_pruning_tpu.metrics import clip_score
    from diffusion_pruning_tpu.models.clip_vision import (
        CLIPVisionConfig, CLIPVisionEncoder,
    )
    from diffusion_pruning_tpu.models.convert import (
        convert_clip_text_state_dict, convert_clip_vision_state_dict,
        load_torch_state_dict, _np,
    )
    from diffusion_pruning_tpu.models.safety import clip_preprocess
    from diffusion_pruning_tpu.models.text_encoders import (
        CLIPTextConfig, CLIPTextEncoder, clip_pooled_text_features,
    )

    with open(os.path.join(args.clip_model, "config.json")) as f:
        conf = _json.load(f)
    tcfg_raw, vcfg_raw = conf["text_config"], conf["vision_config"]
    tcfg = CLIPTextConfig(
        vocab_size=tcfg_raw.get("vocab_size", 49408),
        hidden_size=tcfg_raw.get("hidden_size", 512),
        num_layers=tcfg_raw.get("num_hidden_layers", 12),
        num_heads=tcfg_raw.get("num_attention_heads", 8),
        intermediate_size=tcfg_raw.get("intermediate_size", 2048),
        max_positions=tcfg_raw.get("max_position_embeddings", 77))
    vcfg = CLIPVisionConfig(
        hidden_size=vcfg_raw.get("hidden_size", 768),
        num_layers=vcfg_raw.get("num_hidden_layers", 12),
        num_heads=vcfg_raw.get("num_attention_heads", 12),
        intermediate_size=vcfg_raw.get("intermediate_size", 3072),
        image_size=vcfg_raw.get("image_size", 224),
        patch_size=vcfg_raw.get("patch_size", 32),
        projection_dim=conf.get("projection_dim", 512),
        hidden_act=vcfg_raw.get("hidden_act", "quick_gelu"))
    sd = load_torch_state_dict(args.clip_model)
    t_sd = {k[len("text_model."):]: v for k, v in sd.items()
            if k.startswith("text_model.")}
    t_params = convert_clip_text_state_dict(t_sd, tcfg)
    v_params = convert_clip_vision_state_dict(sd, vcfg)
    text_proj = jnp.asarray(_np(sd["text_projection.weight"]).T)
    logit_scale = float(np.exp(_np(sd["logit_scale"])))

    text_enc = CLIPTextEncoder(tcfg)
    vis_enc = CLIPVisionEncoder(vcfg, dtype=jnp.bfloat16)
    tok = CLIPTokenizer.from_pretrained(args.clip_model)

    @jax.jit
    def embed_text(p, ids):
        hidden = text_enc.apply({"params": p}, ids)
        return clip_pooled_text_features(hidden, ids, projection=text_proj)

    @jax.jit
    def embed_img(p, px):
        return vis_enc.apply({"params": p}, px)[1].astype(jnp.float32)

    with open(args.captions) as f:
        captions = _json.load(f)
    files = sorted(f for f in os.listdir(args.gen_dir) if f.endswith(".npy"))
    assert len(files) == len(captions), (len(files), len(captions))
    bs = args.batch_size
    img_feats, txt_feats = [], []
    for i in range(0, len(files), bs):
        chunk = files[i:i + bs]
        caps = captions[i:i + bs]
        n = len(chunk)
        ids = np.asarray(tok(caps, max_length=tcfg.max_positions,
                             padding="max_length", truncation=True,
                             return_tensors="np").input_ids)
        imgs = np.stack([np.load(os.path.join(args.gen_dir, f)).astype(np.float32)
                         / 255.0 for f in chunk])
        if n < bs:   # static shapes
            ids = np.concatenate([ids, np.zeros((bs - n, ids.shape[1]), ids.dtype)])
            imgs = np.concatenate([imgs, np.zeros((bs - n, *imgs.shape[1:]),
                                                  np.float32)])
        px = clip_preprocess(jnp.asarray(imgs), vcfg.image_size)
        img_feats.append(np.asarray(embed_img(v_params, px))[:n])
        txt_feats.append(np.asarray(embed_text(t_params, jnp.asarray(ids)))[:n])
    score = clip_score(np.concatenate(img_feats), np.concatenate(txt_feats),
                       logit_scale=logit_scale)
    print(f"CLIP-score: {score:.4f}")


if __name__ == "__main__":
    main()
