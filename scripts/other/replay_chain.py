"""Full reference-workflow replay, purely via CLIs + on-disk artifacts.

Replays the reference's actual artifact chain end-to-end the way a user
would (no in-process objects — every arrow below is a subprocess handing
off files, the contract pinned by /root/reference/pdm/training/trainer.py:253-313
and /root/reference/scripts/aptp/filter_dataset.py:28-81):

  prune.py ──checkpoint-{N}/ (orbax state + quantizer_embeddings.pt +
     │        hypernet/ quantizer/ unet/ safetensors exports)
     ▼
  filter_dataset.py ──{dataset}_{split}_mapped_indices.pt
     ▼
  finetune.py × K experts ──per-expert checkpoints + arch_vector.pt
     ▼
  generate_fid_images.py × K ──.npy image dirs      save_captions.py × K
     ▼                                                  │
  fid.py / clip_score.py / cmmd.py ◄── resize_and_save_images.py (ref set)
     ▼
  REPLAY_RESULTS.json + markdown table

Runs self-contained: fabricates a tiny on-disk COCO-layout dataset (real
JPEG decode + DataPipeline path), a tiny LOCAL transformers CLIP checkpoint
(real CLIPModel/CLIPProcessor load path in clip_score/cmmd), and a stub
TorchScript Inception (the fid.py --inception contract). Models are tiny
random (no SD weights in this environment); metric VALUES are therefore
not quality statements — what this proves is that every artifact format,
file name, and CLI flag of the reference workflow round-trips.

  JAX_PLATFORMS='' python scripts/other/replay_chain.py \
      --workspace /tmp/dpt_replay --experts 8 --platform tpu

CI runs the same harness at --experts 2 --platform cpu
(tests/test_replay_chain.py).
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

TOPICS = [
    ("red car", "driving on a sunny road"),
    ("small dog", "playing in the green park"),
    ("old boat", "sailing near the rocky coast"),
    ("tall tower", "standing over the night city"),
    ("fresh bread", "cooling on a wooden table"),
    ("blue bird", "sitting on a snowy branch"),
    ("fast train", "crossing the steel bridge"),
    ("warm soup", "served in a clay bowl"),
]


def log(msg):
    print(f"[replay] {msg}", file=sys.stderr, flush=True)


def make_tiny_coco(root, n_train_imgs=64, caps_per_img=4, n_val_imgs=16,
                   val_caps_per_img=4, resolution=64, seed=0):
    """COCO-2014 on-disk layout (images/train2014/COCO_train2014_*.jpg +
    annotations/captions_train2014.json) with topic-clustered captions so
    router assignment is non-degenerate."""
    import numpy as np
    from PIL import Image
    rng = np.random.RandomState(seed)
    for split, n_imgs, cpi in (("train", n_train_imgs, caps_per_img),
                               ("val", n_val_imgs, val_caps_per_img)):
        img_dir = os.path.join(root, "images", f"{split}2014")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
        annotations = []
        for i in range(n_imgs):
            base = rng.randint(0, 200, 3)
            arr = (base[None, None, :] +
                   rng.randint(0, 56, (resolution, resolution, 3))
                   ).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(img_dir, f"COCO_{split}2014_{i:012d}.jpg"))
            for c in range(cpi):
                subj, rest = TOPICS[(i * cpi + c) % len(TOPICS)]
                annotations.append({
                    "image_id": i,
                    "caption": f"a photo of a {subj} {rest} number {i * cpi + c}",
                })
        with open(os.path.join(root, "annotations",
                               f"captions_{split}2014.json"), "w") as f:
            json.dump({"annotations": annotations}, f)
    log(f"tiny COCO dataset at {root}")


def make_tiny_clip(d, seed=0):
    """Tiny LOCAL transformers CLIP checkpoint dir — the real
    CLIPModel/CLIPProcessor/CLIPTokenizer load path that clip_score.py and
    cmmd.py use with production checkpoints."""
    import string
    import torch
    from transformers import (CLIPConfig, CLIPImageProcessor, CLIPModel,
                              CLIPTextConfig, CLIPTokenizer, CLIPVisionConfig)
    os.makedirs(d, exist_ok=True)
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, ch in enumerate(string.ascii_lowercase):
        vocab[ch + "</w>"] = 2 + i
        vocab[ch] = 2 + 26 + i
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    CLIPTokenizer(vocab_file=os.path.join(d, "vocab.json"),
                  merges_file=os.path.join(d, "merges.txt"),
                  model_max_length=77).save_pretrained(d)
    CLIPImageProcessor(size={"shortest_edge": 32},
                       crop_size={"height": 32, "width": 32}).save_pretrained(d)
    cfg = CLIPConfig(
        text_config=CLIPTextConfig(
            vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=77).to_dict(),
        vision_config=CLIPVisionConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, image_size=32, patch_size=8).to_dict(),
        projection_dim=16)
    torch.manual_seed(seed)
    CLIPModel(cfg).save_pretrained(d, safe_serialization=True)
    log(f"tiny CLIP checkpoint at {d}")


def make_stub_inception(path):
    """Stub feature extractor honouring fid.py's --inception TorchScript
    contract (NCHW float → (N, D))."""
    import torch

    class Stub(torch.nn.Module):
        def forward(self, x):
            return torch.cat([x.mean(dim=(2, 3)), x.amax(dim=(2, 3))], dim=1)

    torch.jit.script(Stub()).save(path)
    log(f"stub inception at {path}")


PRUNE_YAML = """\
model:
  unet:
    pretrained_model_name_or_path: /nonexistent
    input_perturbation: 0.0
    resolution: 64
    noise_offset: 0.0
    prediction_type: v_prediction
    max_scheduler_steps: null
    unet_down_blocks: [CrossAttnDownBlock2DHalfGated, DownBlock2DHalfGated]
    unet_mid_block: UNetMidBlock2DCrossAttnWidthGated
    unet_up_blocks: [UpBlock2DHalfGated, CrossAttnUpBlock2DHalfGated]
    gated_ff: true
    ff_gate_width: 4
  hypernet: {{weight_norm: false, linear_bias: true, single_arch_param: false}}
  quantizer:
    quantizer_T: 0.4
    quantizer_base: 3
    num_arch_vq_codebook_embeddings: {experts}
    arch_vq_beta: 0.25
    depth_order: [-1, -2, 0, 1, -3, 2]
    non_zero_width: true
    resource_aware_normalization: false
    optimal_transport: true
data:
  dataset_name: coco
  data_dir: {data_dir}
  year: 2014
  max_train_samples: null
  max_validation_samples: null
  max_generated_samples: 8
  dataloader:
    train_batch_size: {batch}
    validation_batch_size: {batch}
    image_generation_batch_size: 4
    center_crop: false
    random_flip: true
training:
  max_train_steps: {steps}
  hypernet_pretraining_steps: {pretrain}
  validation_steps: 1000
  image_logging_steps: 100000
  num_inference_steps: {infer_steps}
  losses:
    diffusion_loss: {{snr_gamma: 5.0, weight: 1.0}}
    resource_loss: {{type: log, weight: 2.0, pruning_target: 0.6}}
    contrastive_loss: {{arch_vector_temperature: 0.03, prompt_embedding_temperature: 0.03, weight: 100.0}}
    distillation_loss: {{weight: 0.2}}
    block_loss: {{weight: 0.2}}
    std_loss: {{weight: 0.1}}
    max_loss: {{weight: 0.1}}
  optim:
    hypernet_learning_rate: {router_lr}
    quantizer_learning_rate: {router_lr}
    unet_learning_rate: 5e-5
    scale_lr: false
    lr_scheduler: constant_with_warmup
    lr_warmup_steps: 2
  logging:
    logging_dir: {runs}
    report_to: jsonl
    checkpoints_total_limit: 1
    resume_from_checkpoint: null
"""

FINETUNE_YAML = """\
model:
  unet:
    pretrained_model_name_or_path: /nonexistent
    input_perturbation: 0.0
    resolution: 64
    noise_offset: 0.0
    prediction_type: v_prediction
    max_scheduler_steps: null
    unet_down_blocks: [CrossAttnDownBlock2DHalfGated, DownBlock2DHalfGated]
    unet_mid_block: UNetMidBlock2DCrossAttnWidthGated
    unet_up_blocks: [UpBlock2DHalfGated, CrossAttnUpBlock2DHalfGated]
    gated_ff: true
    ff_gate_width: 4
  hypernet: {{weight_norm: false, linear_bias: true, single_arch_param: false}}
  quantizer:
    quantizer_T: 0.4
    quantizer_base: 3
    num_arch_vq_codebook_embeddings: {experts}
    depth_order: [-1, -2, 0, 1, -3, 2]
    non_zero_width: true
    resource_aware_normalization: false
    optimal_transport: true
data:
  dataset_name: coco
  data_dir: {data_dir}
  year: 2014
  max_train_samples: null
  max_validation_samples: null
  max_generated_samples: 8
  dataloader:
    train_batch_size: {batch}
    validation_batch_size: {batch}
    image_generation_batch_size: 4
    center_crop: false
    random_flip: true
training:
  max_train_steps: {steps}
  validation_steps: 1000
  image_logging_steps: 100000
  num_inference_steps: {infer_steps}
  gradient_checkpointing: false
  losses:
    diffusion_loss: {{snr_gamma: 5.0, weight: 1.0}}
    resource_loss: {{type: log, weight: 2.0, pruning_target: 0.6}}
    distillation_loss: {{weight: 0.2}}
    block_loss: {{weight: 0.2}}
  optim:
    unet_learning_rate: 1e-5
    scale_lr: false
    lr_scheduler: constant_with_warmup
    lr_warmup_steps: 2
  logging:
    logging_dir: {runs}
    report_to: jsonl
    checkpoints_total_limit: 1
    resume_from_checkpoint: null
"""


def leg_done(tag, *paths):
    """Artifact-reuse: a leg whose output files already exist is skipped,
    so a crashed chain resumes from the failed leg instead of re-running
    hours of prune/finetune/generate (pass --fresh to force a full rerun)."""
    if paths and all(os.path.exists(p) for p in paths):
        log(f"{tag}: artifacts exist — skipping (resume)")
        return True
    return False


def run_cli(script, args, env, tag, capture=None):
    """One chain link = one subprocess (never two JAX processes at once)."""
    cmd = [sys.executable, os.path.join(ROOT, script)] + args
    log(f"$ {' '.join(cmd)}")
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, cwd=ROOT,
                          capture_output=True, text=True)
    dt = time.time() - t0
    if capture is not None:
        capture.append({"step": tag, "cmd": cmd, "seconds": round(dt, 1)})
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-8000:])
        raise RuntimeError(f"{tag} failed (rc={proc.returncode})")
    log(f"{tag}: ok in {dt:.1f}s")
    return proc.stdout


def chain_env(platform):
    env = dict(os.environ)
    if platform == "tpu":
        env["JAX_PLATFORMS"] = ""
    else:
        # pure local CPU jax: skip axon registration entirely (its hook
        # overrides JAX_PLATFORMS programmatically — CLAUDE.md)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        env["JAX_PLATFORMS"] = "cpu"
    return env


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workspace", default="/tmp/dpt_replay")
    p.add_argument("--experts", type=int, default=8)
    p.add_argument("--steps", type=int, default=10,
                   help="stage-1 train steps")
    p.add_argument("--ft_steps", type=int, default=4,
                   help="stage-2 steps per expert")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--router_lr", default="2e-4",
                   help="hypernet/quantizer LR; at chip scale pass ~4e-3 "
                        "(the convergence-run recipe) so Sinkhorn balancing "
                        "spreads codebook assignment within a short schedule")
    p.add_argument("--infer_steps", type=int, default=3)
    p.add_argument("--platform", choices=("tpu", "cpu"), default="tpu")
    p.add_argument("--fresh", action="store_true",
                   help="wipe the workspace first")
    p.add_argument("--out_json", default=None,
                   help="also write the results json here")
    args = p.parse_args()

    ws = os.path.abspath(args.workspace)
    if args.fresh and os.path.isdir(ws):
        shutil.rmtree(ws)
    os.makedirs(ws, exist_ok=True)
    runs = os.path.join(ws, "runs")
    os.makedirs(runs, exist_ok=True)
    env = chain_env(args.platform)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(ws, "jax_cache")
    timings = []
    results = {"platform": args.platform, "experts": args.experts,
               "steps": {"prune": args.steps, "finetune": args.ft_steps},
               "chain": timings, "per_expert": {}}

    # ---- fixtures (host-side, no JAX) ----
    data_dir = os.path.join(ws, "coco")
    if not os.path.isdir(data_dir):
        make_tiny_coco(data_dir)
    clip_dir = os.path.join(ws, "tiny_clip")
    if not os.path.isdir(clip_dir):
        make_tiny_clip(clip_dir)
    stub_incep = os.path.join(ws, "stub_inception.pt")
    if not os.path.exists(stub_incep):
        make_stub_inception(stub_incep)

    prune_cfg = os.path.join(ws, "replay_prune.yaml")
    with open(prune_cfg, "w") as f:
        f.write(PRUNE_YAML.format(experts=args.experts, data_dir=data_dir,
                                  runs=runs, steps=args.steps,
                                  pretrain=max(args.steps // 3, 1),
                                  batch=args.batch,
                                  router_lr=args.router_lr,
                                  infer_steps=args.infer_steps))
    ft_cfg = os.path.join(ws, "replay_finetune.yaml")
    with open(ft_cfg, "w") as f:
        f.write(FINETUNE_YAML.format(experts=args.experts, data_dir=data_dir,
                                     runs=runs, steps=args.ft_steps,
                                     batch=args.batch,
                                     infer_steps=args.infer_steps))

    common = ["--pretrained_model_name_or_path", "",
              "--prompt_encoder_model_name_or_path", "",
              "--jax_cache_dir", os.path.join(ws, "jax_cache")]

    # ---- 1. stage-1 prune ----
    prune_run = os.path.join(runs, "replay_prune", "s1")
    prune_artifacts = ("quantizer_embeddings.pt", "state",
                       "hypernet/diffusion_pytorch_model.safetensors",
                       "quantizer/diffusion_pytorch_model.safetensors",
                       "unet/diffusion_pytorch_model.safetensors")

    def _latest_ckpt():
        if not os.path.isdir(prune_run):
            return None
        cs = sorted(d for d in os.listdir(prune_run)
                    if d.startswith("checkpoint-"))
        return os.path.join(prune_run, cs[-1]) if cs else None

    ck = _latest_ckpt()
    if not (ck and leg_done("prune",
                            *(os.path.join(ck, a) for a in prune_artifacts))):
        run_cli("scripts/aptp/prune.py",
                ["--base_config_path", prune_cfg,
                 "--wandb_run_name", "s1"] + common, env, "prune", timings)
    latest_ckpt = _latest_ckpt()
    assert latest_ckpt, f"prune wrote no checkpoint under {prune_run}"
    for artifact in prune_artifacts:
        assert os.path.exists(os.path.join(latest_ckpt, artifact)), artifact
    results["prune_run"] = prune_run
    log(f"stage-1 checkpoint: {latest_ckpt}")

    # ---- 2. router assignment ----
    if not leg_done("filter_dataset",
                    os.path.join(prune_run, "coco_train_mapped_indices.pt"),
                    os.path.join(prune_run, "coco_validation_mapped_indices.pt")):
        run_cli("scripts/aptp/filter_dataset.py",
                ["--base_config_path", prune_cfg,
                 "--pruning_ckpt_dir", prune_run] + common,
                env, "filter_dataset", timings)
    import numpy as np

    def _load_pt(path):
        import torch
        return np.asarray(torch.load(path, map_location="cpu",
                                     weights_only=False))

    train_idx = _load_pt(os.path.join(prune_run, "coco_train_mapped_indices.pt"))
    val_idx = _load_pt(os.path.join(prune_run, "coco_validation_mapped_indices.pt"))
    train_counts = np.bincount(train_idx, minlength=args.experts)
    val_counts = np.bincount(val_idx, minlength=args.experts)
    results["train_counts"] = train_counts.tolist()
    results["val_counts"] = val_counts.tolist()
    log(f"router: train {train_counts.tolist()} val {val_counts.tolist()}")

    # ---- 3-6. per-expert: finetune → generate → captions → metrics ----
    ref_npy = os.path.join(ws, "ref_npy")
    if not os.path.isdir(ref_npy):
        run_cli("scripts/metrics/resize_and_save_images.py",
                [os.path.join(data_dir, "images", "val2014"), ref_npy,
                 "--resolution", "64"], env, "resize_ref", timings)

    for e in range(args.experts):
        r = {"train_prompts": int(train_counts[e]),
             "val_prompts": int(val_counts[e])}
        results["per_expert"][e] = r
        ft_run = None
        if train_counts[e] >= args.batch:
            ft_run = os.path.join(runs, "replay_finetune", f"ft-expert{e}")
            if not leg_done(f"finetune[{e}]",
                            os.path.join(ft_run, "arch_vector.pt")):
                run_cli("scripts/aptp/finetune.py",
                        ["--base_config_path", ft_cfg,
                         "--pruning_ckpt_dir", prune_run,
                         "--wandb_run_name", "ft",
                         "--expert_id", str(e)] + common,
                        env, f"finetune[{e}]", timings)
            assert os.path.isdir(ft_run), ft_run
            assert os.path.exists(os.path.join(ft_run, "arch_vector.pt"))
            ft_ckpts = [d for d in os.listdir(ft_run)
                        if d.startswith("checkpoint-")]
            assert ft_ckpts, f"finetune[{e}] wrote no checkpoint"
            assert os.path.exists(os.path.join(
                ft_run, sorted(ft_ckpts)[-1], "arch_vector.pt"))
            r["finetune_run"] = ft_run
        else:
            log(f"expert {e}: {train_counts[e]} train prompts < batch "
                f"{args.batch} — generating from sliced dense weights")
        if val_counts[e] == 0:
            log(f"expert {e}: no validation prompts routed — skipping metrics")
            continue

        gen_dir = os.path.join(runs, f"fid_images_expert_{e}")
        if not (os.path.isdir(gen_dir)
                and any(f.endswith(".npy") for f in os.listdir(gen_dir))
                and leg_done(f"generate[{e}]", gen_dir)):
            gen_args = ["--base_config_path", prune_cfg,
                        "--pruning_ckpt_dir", prune_run,
                        "--expert_id", str(e), "--seed", str(100 + e)] + common
            if ft_run:
                gen_args += ["--finetuning_ckpt_dir", ft_run]
            run_cli("scripts/metrics/generate_fid_images.py", gen_args, env,
                    f"generate[{e}]", timings)
        n_imgs = len([f for f in os.listdir(gen_dir) if f.endswith(".npy")])
        assert n_imgs > 0
        r["images"] = n_imgs

        caps_json = os.path.join(ws, f"captions_expert_{e}.json")
        if not leg_done(f"captions[{e}]", caps_json):
            run_cli("scripts/metrics/save_captions.py",
                    ["--base_config_path", prune_cfg,
                     "--pruning_ckpt_dir", prune_run,
                     "--expert_id", str(e), "--out", caps_json],
                    env, f"captions[{e}]", timings)
        caps = json.load(open(caps_json))[:n_imgs]
        json.dump(caps, open(caps_json, "w"))

        if n_imgs >= 2:
            out = run_cli("scripts/metrics/fid.py",
                          [gen_dir, "--ref_stats", ref_npy,
                           "--inception", stub_incep],
                          env, f"fid[{e}]", timings)
            r["fid_stub"] = float(out.strip().split("FID:")[1])
        else:
            # Fréchet stats need >=2 samples; clean-fid degenerates the
            # same way. CLIP-score/CMMD below remain well-defined at N=1.
            log(f"expert {e}: only {n_imgs} image — FID undefined, skipping")
            r["fid_stub"] = None
        out = run_cli("scripts/metrics/clip_score.py",
                      [gen_dir, "--captions", caps_json,
                       "--clip_model", clip_dir],
                      env, f"clip_score[{e}]", timings)
        r["clip_score_tiny"] = float(out.strip().split("CLIP-score:")[1])
        out = run_cli("scripts/metrics/cmmd.py",
                      [gen_dir, ref_npy, "--clip_model", clip_dir],
                      env, f"cmmd[{e}]", timings)
        r["cmmd_tiny"] = float(out.strip().split("CMMD:")[1])

    # ---- results ----
    results["total_seconds"] = round(sum(t["seconds"] for t in timings), 1)
    out_path = os.path.join(ws, "REPLAY_RESULTS.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(results, f, indent=2)

    print(f"\n| expert | train | val | finetuned | imgs | FID(stub) "
          f"| CLIP(tiny) | CMMD(tiny) |")
    print("|---|---|---|---|---|---|---|---|")
    def fmt(v, spec):
        return format(v, spec) if isinstance(v, float) else "—"

    for e in range(args.experts):
        r = results["per_expert"][e]
        print(f"| {e} | {r['train_prompts']} | {r['val_prompts']} "
              f"| {'yes' if 'finetune_run' in r else 'no'} "
              f"| {r.get('images', '—')} "
              f"| {fmt(r.get('fid_stub'), '.2f')} "
              f"| {fmt(r.get('clip_score_tiny'), '.2f')} "
              f"| {fmt(r.get('cmmd_tiny'), '.3f')} |")
    print(f"\nchain total: {results['total_seconds']}s over "
          f"{len(timings)} CLI invocations → {out_path}")


if __name__ == "__main__":
    main()
