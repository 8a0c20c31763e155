"""CI leg of the full reference-workflow replay (VERDICT r3 next-round #1).

Runs scripts/other/replay_chain.py at --experts 2 --platform cpu: every
chain link is a REAL subprocess handing off on-disk artifacts exactly as a
reference user would (prune -> filter_dataset -> finetune -> generate ->
fid/clip_score/cmmd), per the contract in
/root/reference/pdm/training/trainer.py:253-313 and
/root/reference/scripts/aptp/filter_dataset.py:28-81.

The chip-scale run (--experts 8 --platform tpu) is recorded in
REPLAY_RESULTS.json at the repo root; this test keeps the chain from
rotting between chip sessions.
"""
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_replay_chain_cpu(tmp_path):
    ws = tmp_path / "replay"
    env = dict(os.environ)
    # pure local CPU jax for the child processes (the conftest config.update
    # only covers THIS process) — chain_env('cpu') inside the script also
    # strips the axon hooks; belt and braces here for the harness itself.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts/other/replay_chain.py"),
         "--workspace", str(ws), "--experts", "2", "--steps", "4",
         "--ft_steps", "2", "--infer_steps", "2", "--platform", "cpu"],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]

    results = json.load(open(ws / "REPLAY_RESULTS.json"))
    assert results["experts"] == 2
    # router assignment produced a full partition of the caption pools
    assert sum(results["train_counts"]) == 64 * 4
    assert sum(results["val_counts"]) == 16 * 4
    # at least one expert went through the full finetune -> generate ->
    # metrics leg and produced finite metric values
    full = [r for r in results["per_expert"].values() if "cmmd_tiny" in r]
    assert full, results
    for r in full:
        assert r["images"] > 0
        for k in ("fid_stub", "clip_score_tiny", "cmmd_tiny"):
            assert r[k] == r[k], (k, r)  # not NaN
