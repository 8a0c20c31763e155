"""End-to-end CLI pipeline: prune (stage-1 smoke) → serve (online expert
serving from the written checkpoint).

Drives the two entry points exactly as a user would — prune.py writes a
checkpoint (orbax state + quantizer_embeddings.pt), serve.py restores the
router + codebook from it, materialises experts, and serves prompt waves
with continuous batching + AOT warmup. Marked slow (two full CLI runs with
fresh compiles on the CPU host)."""
import glob
import importlib.util
import os
import runpy
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _load_cli(rel):
    spec = importlib.util.spec_from_file_location(
        os.path.basename(rel)[:-3], os.path.join(ROOT, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_prune_then_serve(tmp_path, monkeypatch):
    # stage 1 smoke into tmp (rewrite the config's logging_dir)
    cfg_text = open(os.path.join(ROOT, "configs/pruning/tiny_smoke.yaml")).read()
    cfg_path = tmp_path / "tiny_smoke.yaml"
    cfg_path.write_text(cfg_text.replace("logging_dir: runs",
                                         f"logging_dir: {tmp_path}/runs"))
    # NEVER .jax_cache (or any SHARED dir) here: these are XLA:CPU runs and
    # the axon remote-compile hook makes persisted CPU executables SIGILL
    # when RELOADED (CLAUDE.md) — every invocation gets a fresh dir so no
    # reload ever happens
    monkeypatch.setattr(sys, "argv", [
        "prune.py", "--base_config_path", str(cfg_path),
        "--pretrained_model_name_or_path", "",
        "--prompt_encoder_model_name_or_path", "",
        "--jax_cache_dir", str(tmp_path / "cache0")])
    runpy.run_path(os.path.join(ROOT, "scripts/aptp/prune.py"),
                   run_name="__main__")
    ckpts = glob.glob(f"{tmp_path}/runs/**/checkpoint-*", recursive=True)
    assert ckpts, "prune smoke wrote no checkpoint"
    run_dir = os.path.dirname(sorted(ckpts)[-1])

    # serve from the checkpoint: restored router + codebook, AOT warmup
    serve = _load_cli("scripts/other/serve.py")
    aot_dir = str(tmp_path / "aot")
    out_dir = str(tmp_path / "served")
    argv = ["--base_config_path", str(cfg_path),
            "--pruning_ckpt_dir", run_dir,
            "--n_synthetic", "6", "--batch_size", "2",
            "--num_inference_steps", "2", "--arrival_batch", "3",
            "--aot_dir", aot_dir, "--out_dir", out_dir,
            "--pretrained_model_name_or_path", "",
            "--prompt_encoder_model_name_or_path", "",
            "--jax_cache_dir", str(tmp_path / "cache1")]
    n = serve.main(argv)
    assert n == 6
    imgs = sorted(glob.glob(os.path.join(out_dir, "img_*.npy")))
    assert len(imgs) == 6
    arr = np.load(imgs[0])
    assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[-1] == 3
    assert glob.glob(os.path.join(aot_dir, "*.jaxpgm")), "no AOT artifacts"

    # restart: every program must deserialize instead of retracing
    n2 = serve.main(argv + ["--out_dir", str(tmp_path / "served2"),
                            "--jax_cache_dir", str(tmp_path / "cache2")])
    assert n2 == 6
