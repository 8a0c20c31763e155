"""Router assignment: write `{dataset}_{split}_mapped_indices.pt`.

Equivalent of /root/reference/scripts/aptp/filter_dataset.py:28-81: load the
hypernet + quantizer from a stage-1 checkpoint, embed every caption with
MPNet (2048-caption batches), route by cosine similarity against the frozen
codebook snapshot, save the per-sample expert indices in the reference's .pt
format so its downstream tooling reads them unchanged.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from diffusion_pruning_tpu.utils.arg_utils import parse_args
    args = parse_args()
    assert args.pruning_ckpt_dir, "--pruning_ckpt_dir required"
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(args.jax_cache_dir))

    from diffusion_pruning_tpu.core import build_structure
    from diffusion_pruning_tpu.data import get_dataset
    from diffusion_pruning_tpu.data.loader import filter_dataset
    from diffusion_pruning_tpu.training.factory import (
        build_hypernet, build_mpnet, build_quantizer, unet_config_from_yaml,
    )
    from diffusion_pruning_tpu.utils.checkpoint import CheckpointManager, save_torch_artifact
    from diffusion_pruning_tpu.utils.config import load_config

    cfg = load_config(args.base_config_path)
    cfg.update_flat(vars(args))
    tiny = not os.path.exists(os.path.join(args.pretrained_model_name_or_path or "", "unet"))
    ucfg = unet_config_from_yaml(cfg, tiny=tiny)
    spec = build_structure(ucfg)

    mpnet, mpnet_params = build_mpnet(args.prompt_encoder_model_name_or_path, tiny=tiny)
    hypernet, hn_params = build_hypernet(spec, cfg, input_dim=mpnet.cfg.hidden_size)
    quantizer, q_params = build_quantizer(spec, cfg)

    mgr = CheckpointManager(args.pruning_ckpt_dir)
    restored = mgr.restore()  # structure-free restore; pick what we need
    hn_params = restored["trainable"]["hypernet"]
    q_state = restored["q_state"]

    from diffusion_pruning_tpu.data.tokenizers import build_mpnet_tokenizer
    tok = build_mpnet_tokenizer(args.prompt_encoder_model_name_or_path,
                                vocab_size=mpnet.cfg.vocab_size)

    @jax.jit
    def route(emb):
        logits = hypernet.apply({"params": hn_params}, emb)
        return quantizer.cosine_indices(logits, q_state["embedding_gs"], key=None)

    from diffusion_pruning_tpu.models.text_encoders import (
        MPNET_MAX_LEN, jit_sentence_embed)
    mp_fwd = jit_sentence_embed(mpnet)

    def embed(caps):
        # cap at the model's position table (tiny smoke MPNet has 64);
        # MUST match prune.py's tokenization so routing is consistent
        enc = tok(caps, padding="max_length",
                  max_length=min(MPNET_MAX_LEN, mpnet.cfg.max_positions),
                  truncation=True, return_tensors="np")
        return np.asarray(mp_fwd(mpnet_params, jnp.asarray(enc["input_ids"]),
                                 jnp.asarray(enc["attention_mask"])))

    data_dir = cfg.data.get("data_dir") or ""
    if os.path.exists(data_dir):
        splits = get_dataset(cfg.data)
    else:
        print(f"[smoke] dataset dir {data_dir!r} missing — synthetic captions",
              file=sys.stderr)
        splits = {s: {"caption": [f"{s} prompt number {i} about topic {i % 7}"
                                  for i in range(64)]}
                  for s in ("train", "validation")}
    for split, cols in splits.items():
        idx = filter_dataset(cols["caption"], embed, lambda e: route(jnp.asarray(e)))
        out = os.path.join(args.pruning_ckpt_dir,
                           f"{cfg.data.dataset_name}_{split}_mapped_indices.pt")
        save_torch_artifact(idx.astype(np.int64), out)
        counts = np.bincount(idx, minlength=quantizer.n_e)
        print(f"{split}: {len(idx)} prompts → experts {counts.tolist()} → {out}")


if __name__ == "__main__":
    main()
