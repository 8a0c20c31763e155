"""Online expert-serving CLI — the deployment entry the reference lacks.

The reference only generates expert images offline, one expert per process
(`/root/reference/scripts/metrics/generate_fid_images.py:32-143`). This
entry serves LIVE traffic through the full APTP deployment premise: load a
stage-1 pruning checkpoint (router + codebook), materialise every codebook
expert from the dense U-Net (optionally replacing weights with stage-2
fine-tuned checkpoints), AOT-warm all (expert, tier) programs, then run
prompts through `ServingQueue` — continuous tiered batching with
`flush_async` double-buffering so host-side routing/tokenising of the next
arrival batch overlaps the device trajectories of the previous one.

Smoke mode (like every entry point): tiny random models + synthetic
prompts when checkpoint/model dirs are missing, so the serving path is
executable in CI end to end.

  python scripts/other/serve.py --base_config_path configs/pruning/tiny_smoke.yaml \
      --pruning_ckpt_dir runs/tiny_smoke --prompts_file prompts.txt \
      --aot_dir /tmp/dpt_aot --out_dir runs/served
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Serve APTP experts online")
    p.add_argument("--base_config_path", type=str, required=True)
    p.add_argument("--pruning_ckpt_dir", type=str, default=None,
                   help="Stage-1 checkpoint (router + codebook + dense unet).")
    p.add_argument("--finetuning_ckpt_dirs", type=str, default=None,
                   help="Comma-separated per-expert stage-2 dirs (index = "
                        "expert id; empty slot = pretrained slice).")
    p.add_argument("--pretrained_model_name_or_path", type=str,
                   default="stabilityai/stable-diffusion-2-1")
    p.add_argument("--prompt_encoder_model_name_or_path", type=str,
                   default="sentence-transformers/all-mpnet-base-v2",
                   help="MPNet dir — the router's input space (stage 1 "
                        "trains the hypernet on MPNet sentence embeddings).")
    p.add_argument("--prompts_file", type=str, default=None,
                   help="One prompt per line; default: synthetic prompts.")
    p.add_argument("--n_synthetic", type=int, default=16)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--batch_size", type=int, default=8,
                   help="Largest expert tier (powers of two below it too).")
    p.add_argument("--arrival_batch", type=int, default=8,
                   help="Prompts submitted per request wave.")
    p.add_argument("--num_inference_steps", type=int, default=25)
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddim", "pndm", "dpm++"],
                   help="dpm++ (2nd-order multistep) reaches DDIM quality "
                        "in roughly half the steps — pair with a lower "
                        "--num_inference_steps for a direct img/s win.")
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--mode", type=str, default="experts",
                   choices=["experts", "hybrid", "routed"],
                   help="hybrid: sub-tier remainders pool into one gated "
                        "batch; routed: no materialised experts — the gated "
                        "U-Net with per-prompt archs (A/B baseline).")
    p.add_argument("--aot_dir", type=str, default=None,
                   help="Persist/load AOT programs (pipelines/aot.py).")
    p.add_argument("--no_warmup", action="store_true")
    p.add_argument("--warmup_parallel", type=int, default=4,
                   help="thread-pool width for warmup program prep "
                        "(overlaps compile/load waits — measured 6.3x faster "
                        "AOT restart at width 4, PERFORMANCE.md round-5; "
                        "1 = sequential)")
    p.add_argument("--out_dir", type=str, default="runs/served")
    p.add_argument("--seed", type=int, default=43)
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--jax_cache_dir", type=str, default=".jax_cache")
    return p.parse_args(argv)


def log(m):
    print(f"# serve: {m}", file=sys.stderr, flush=True)


def build_server(args):
    from diffusion_pruning_tpu.core import build_structure
    from diffusion_pruning_tpu.pipelines import PruningPipeline
    from diffusion_pruning_tpu.pipelines.expert_server import ExpertServer
    from diffusion_pruning_tpu.schedulers import DiffusionSchedule
    from diffusion_pruning_tpu.training.factory import (
        build_hypernet, build_mpnet, build_quantizer, build_text_encoder,
        build_unet, build_vae, unet_config_from_yaml,
    )
    from diffusion_pruning_tpu.utils.checkpoint import CheckpointManager
    from diffusion_pruning_tpu.utils.config import load_config

    cfg = load_config(args.base_config_path)
    sd_root = args.pretrained_model_name_or_path
    tiny = not os.path.exists(os.path.join(sd_root or "", "unet"))
    log(f"building models (tiny={tiny}, dtype={args.compute_dtype})")
    if tiny:
        log(f"[smoke] SD checkpoint {sd_root!r} missing — tiny random models")
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    ucfg = unet_config_from_yaml(cfg, tiny=tiny)
    spec = build_structure(ucfg)

    unet, unet_params = build_unet(ucfg, sd_root, dtype=dtype)
    vae, vae_params = build_vae(sd_root, tiny=tiny, dtype=dtype)
    text, text_params = build_text_encoder(sd_root, tiny=tiny, dtype=dtype)
    mpnet, mpnet_params = build_mpnet(args.prompt_encoder_model_name_or_path,
                                      tiny=tiny)
    hypernet, hn_params = build_hypernet(spec, cfg,
                                         input_dim=mpnet.cfg.hidden_size)
    quantizer, q_params = build_quantizer(spec, cfg)
    q_state = quantizer.init_state(q_params)

    if args.pruning_ckpt_dir and os.path.exists(args.pruning_ckpt_dir):
        log(f"restoring router from {args.pruning_ckpt_dir}")
        restored = CheckpointManager(args.pruning_ckpt_dir).restore()
        hn_params = restored["trainable"]["hypernet"]
        q_state = restored["q_state"]
        log(f"router + codebook restored from {args.pruning_ckpt_dir}")
    else:
        log("[smoke] no pruning checkpoint — random router/codebook")

    pipe = PruningPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        text_encoder=text, text_params=text_params,
        hypernet=hypernet, hypernet_params=hn_params,
        quantizer=quantizer, quantizer_params=q_params,
        quantizer_state=q_state, schedule=DiffusionSchedule(),
        sampler=args.sampler)

    expert_weights = None
    if args.finetuning_ckpt_dirs:
        from diffusion_pruning_tpu.models.unet.pruned import (
            make_expert_plan, slice_expert_params)
        codes = (np.asarray(q_state["embedding_gs"]) >= 0.5).astype(np.float32)
        expert_weights = []
        for e, d in enumerate(args.finetuning_ckpt_dirs.split(",")):
            d = d.strip()
            if not d or not os.path.exists(d):
                expert_weights.append(None)
                continue
            plan = make_expert_plan(spec, codes[e])
            tmpl = slice_expert_params(unet_params, plan)
            r = CheckpointManager(d).restore(
                template={"params": tmpl, "opt_state": None,
                          "step": np.asarray(0)})
            expert_weights.append(r["params"])
            log(f"expert {e}: fine-tuned weights from {d}")

    if args.mode == "routed":
        # no materialised experts: the routed baseline serves through the
        # dense gated U-Net only (K resident experts would waste ~K×1.2 GB)
        server = ExpertServer(pipe, [], [], [], args.batch_size)
    else:
        log("materialising experts")
        server = ExpertServer.from_codebook(
            pipe, unet_params, spec, ucfg, expert_weights=expert_weights,
            batch_size=args.batch_size, param_dtype=dtype)
        log(f"experts materialised: MACs ratios "
            f"{[round(r, 3) for r in server.expert_ratios]}")
    return server, ucfg, tiny, (mpnet, mpnet_params)


def main(argv=None):
    args = parse_args(argv)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(args.jax_cache_dir))
    from diffusion_pruning_tpu.pipelines.expert_server import ServingQueue

    server, ucfg, tiny, (mpnet, mpnet_params) = build_server(args)

    if not args.no_warmup and args.mode != "routed":
        t0 = time.perf_counter()
        stats = server.warmup(num_inference_steps=args.num_inference_steps,
                              guidance_scale=args.guidance_scale,
                              hybrid=args.mode == "hybrid",
                              aot_dir=args.aot_dir,
                              parallel=args.warmup_parallel)
        log(f"warmup {time.perf_counter() - t0:.1f}s "
            f"(loaded {stats['loaded']}, built {stats['built']})")

    if args.prompts_file and os.path.exists(args.prompts_file):
        with open(args.prompts_file) as f:
            prompts = [ln.strip() for ln in f if ln.strip()]
    else:
        prompts = [f"a photo of subject {i} in scene {i % 7}"
                   for i in range(args.n_synthetic)]

    sd_root = args.pretrained_model_name_or_path
    from diffusion_pruning_tpu.data.tokenizers import build_clip_tokenizer
    tok = build_clip_tokenizer(
        sd_root, max_length=ucfg.max_text_len,
        vocab_size=server.base_pipeline.text_encoder.cfg.vocab_size)

    def ids_of(caps):
        return jnp.asarray(tok(caps, max_length=ucfg.max_text_len,
                               padding="max_length", truncation=True,
                               return_tensors="np").input_ids)

    # router features: MPNet sentence embeddings — the space the stage-1
    # hypernet trained on; SAME tokenization + jitted embed as
    # filter_dataset.py so serve-time routing matches stage-1 filtering
    from diffusion_pruning_tpu.models.text_encoders import (
        MPNET_MAX_LEN, jit_sentence_embed)
    from diffusion_pruning_tpu.data.tokenizers import build_mpnet_tokenizer
    # cap at the model's position table (tiny smoke MPNet has 64); MUST
    # match prune.py/filter_dataset.py tokenization so routing is consistent
    mp_len = min(MPNET_MAX_LEN, mpnet.cfg.max_positions)
    mp_tok = build_mpnet_tokenizer(args.prompt_encoder_model_name_or_path,
                                   vocab_size=mpnet.cfg.vocab_size,
                                   max_length=mp_len)
    mp_fwd = jit_sentence_embed(mpnet)

    def route_features(caps):
        enc = mp_tok(caps, padding="max_length", max_length=mp_len,
                     truncation=True, return_tensors="np")
        return mp_fwd(mpnet_params, jnp.asarray(enc["input_ids"]),
                      jnp.asarray(enc["attention_mask"]))

    queue = ServingQueue(server, num_inference_steps=args.num_inference_steps,
                         guidance_scale=args.guidance_scale,
                         hybrid=args.mode == "hybrid")
    neg = ids_of([args.negative_prompt])
    key = jax.random.PRNGKey(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)

    # arrival waves: submit (host work) overlaps the previous flush's device
    # trajectories via flush_async double-buffering
    t0 = time.perf_counter()
    pending_fut, results = None, {}
    for lo in range(0, len(prompts), args.arrival_batch):
        wave = prompts[lo: lo + args.arrival_batch]
        if args.mode == "routed":
            # A/B baseline: per-prompt gated archs through the dense U-Net
            # (the reference's only online path, pruning_pipelines.py:767)
            key, sub = jax.random.split(key)
            imgs = server.base_pipeline(
                ids_of(wave), jnp.tile(neg, (len(wave), 1)), sub,
                hyper_net_input=route_features(wave),
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale)[0]
            for j in range(len(wave)):
                results[lo + j] = np.asarray(imgs[j])
            continue
        queue.submit(ids_of(wave), neg, hyper_net_input=route_features(wave))
        if pending_fut is not None:
            results.update(pending_fut.result())
        key, sub = jax.random.split(key)
        pending_fut = queue.flush_async(sub)
    if pending_fut is not None:
        results.update(pending_fut.result())
    dt = time.perf_counter() - t0
    log(f"{len(results)} images in {dt:.1f}s "
        f"({len(results) / dt:.2f} img/s)")

    for rid in sorted(results):
        np.save(os.path.join(args.out_dir, f"img_{rid:05d}.npy"),
                (results[rid] * 255).astype(np.uint8))
    log(f"wrote {len(results)} .npy images to {args.out_dir}")
    return len(results)


if __name__ == "__main__":
    main()
