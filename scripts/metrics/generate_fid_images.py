"""Per-expert FID image generation.

Equivalent of /root/reference/scripts/metrics/generate_fid_images.py:32-143
(which, note, has a broken `pdm.models.diffusion` import upstream): for one
expert, generate over that expert's val-prompt subset with the PNDM sampler
(25 steps) and save 256×256 uint8 `.npy` files — the exact format the
reference's clean-fid/CLIP-score tooling consumes.
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
    assert args.expert_id is not None and args.pruning_ckpt_dir
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(args.jax_cache_dir))

    from diffusion_pruning_tpu.core import build_structure
    from diffusion_pruning_tpu.data import get_dataset
    from diffusion_pruning_tpu.models.unet.pruned import make_expert_plan, slice_expert_params
    from diffusion_pruning_tpu.models.unet.unet import GatedUNet
    from diffusion_pruning_tpu.pipelines import PruningPipeline
    from diffusion_pruning_tpu.schedulers import DiffusionSchedule
    from diffusion_pruning_tpu.training.factory import (
        build_text_encoder, build_unet, build_vae, unet_config_from_yaml,
    )
    from diffusion_pruning_tpu.utils.checkpoint import load_torch_artifact
    from diffusion_pruning_tpu.utils.config import load_config

    cfg = load_config(args.base_config_path)
    cfg.update_flat(vars(args))
    sd_root = args.pretrained_model_name_or_path
    tiny = not os.path.exists(os.path.join(sd_root or "", "unet"))
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    ucfg = unet_config_from_yaml(cfg, tiny=tiny)
    spec = build_structure(ucfg)

    # expert arch + weights: finetuned checkpoint if given, else sliced dense
    if args.finetuning_ckpt_dir:
        arch = load_torch_artifact(os.path.join(args.finetuning_ckpt_dir, "arch_vector.pt"))
    else:
        from diffusion_pruning_tpu.utils.checkpoint import latest_checkpoint_dir
        latest = latest_checkpoint_dir(args.pruning_ckpt_dir)
        emb = load_torch_artifact(os.path.join(latest or args.pruning_ckpt_dir,
                                               "quantizer_embeddings.pt"))
        arch = np.asarray(emb)[args.expert_id]
    plan = make_expert_plan(spec, np.asarray(arch).reshape(-1))

    teacher, dense_params = build_unet(ucfg, sd_root, dtype=dtype)
    expert = GatedUNet(ucfg, plan=plan, dtype=dtype)
    expert_params = slice_expert_params(dense_params, plan)
    if args.finetuning_ckpt_dir:
        from diffusion_pruning_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(args.finetuning_ckpt_dir)
        # template-free restore: the saved opt_state pytree (adamw lists)
        # isn't reconstructible here, and orbax rejects a None placeholder
        expert_params = mgr.restore()["params"]

    vae, vae_params = build_vae(sd_root, tiny=tiny, dtype=dtype)
    text, text_params = build_text_encoder(sd_root, tiny=tiny, dtype=dtype)
    pipe = PruningPipeline(unet=expert, unet_params=jax.tree.map(jnp.asarray, expert_params),
                           vae=vae, vae_params=vae_params,
                           text_encoder=text, text_params=text_params,
                           schedule=DiffusionSchedule(),
                           # reference parity: PNDM for FID images
                           # (generate_fid_images.py:104). YAML override
                           # training.sampler: dpm++ halves the step count
                           # at equal quality (schedulers/dpm.py).
                           sampler=cfg.training.get("sampler", "pndm"))

    # prompts: the expert's val subset
    data_dir = cfg.data.get("data_dir") or ""
    if os.path.exists(data_dir):
        splits = get_dataset(cfg.data)
        caps = splits["validation"]["caption"]
    else:
        print(f"[smoke] dataset dir {data_dir!r} missing — synthetic captions",
              file=sys.stderr)
        caps = None  # sized to the mapped-indices file below
    idx_path = os.path.join(args.pruning_ckpt_dir,
                            f"{cfg.data.dataset_name}_validation_mapped_indices.pt")
    if os.path.exists(idx_path):
        assigned = np.asarray(load_torch_artifact(idx_path))
        if caps is None:
            caps = [f"validation prompt {i}" for i in range(len(assigned))]
        caps = [caps[i] for i in np.nonzero(assigned == args.expert_id)[0]]
    elif caps is None:
        caps = [f"validation prompt {i}" for i in range(8)]
    max_n = cfg.data.get("max_generated_samples")
    if max_n:
        caps = caps[:max_n]

    from diffusion_pruning_tpu.data.tokenizers import build_clip_tokenizer
    clip_tok = build_clip_tokenizer(sd_root, vocab_size=text.cfg.vocab_size)

    def tok(c):
        return jnp.asarray(clip_tok(c, max_length=77, padding="max_length",
                                    truncation=True, return_tensors="np").input_ids)

    out_dir = os.path.join(cfg.training.logging.get("logging_dir", "runs"),
                           f"fid_images_expert_{args.expert_id}")
    os.makedirs(out_dir, exist_ok=True)
    bs = cfg.data.dataloader.get("image_generation_batch_size", 4)
    steps = cfg.training.get("num_inference_steps", 25)
    key = jax.random.PRNGKey(args.seed)
    for b in range(0, len(caps), bs):
        chunk = caps[b:b + bs]
        if len(chunk) < bs:
            chunk = chunk + [""] * (bs - len(chunk))  # static shapes
        key, sub = jax.random.split(key)
        imgs = pipe.generate_samples(tok(list(chunk)), tok([""] * bs), sub,
                                     arch=None, num_inference_steps=steps)
        imgs = (np.asarray(imgs) * 255).astype(np.uint8)
        for j, cap in enumerate(caps[b:b + bs]):
            np.save(os.path.join(out_dir, f"{b + j:06d}.npy"), imgs[j])
        print(f"{min(b + bs, len(caps))}/{len(caps)}", file=sys.stderr)
    print(out_dir)


if __name__ == "__main__":
    main()
