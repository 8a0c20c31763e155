import os

import numpy as np
import pytest

from diffusion_pruning_tpu.utils.checkpoint import (
    CheckpointManager, load_torch_artifact, save_torch_artifact,
)
from diffusion_pruning_tpu.utils.config import Config, load_config


def test_config_load_merge_dump(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  unet:\n    resolution: 256\ntraining:\n  max_train_steps: 5000\n")
    cfg = load_config(str(p))
    assert cfg.model.unet.resolution == 256
    # argparse-style flat merge; None must not clobber
    cfg.update_flat({"seed": 43, "expert_id": None})
    assert cfg.seed == 43
    cfg.set_path("training.losses.resource_loss.weight", 2.0)
    assert cfg.training.losses.resource_loss.weight == 2.0
    out = tmp_path / "dump.yaml"
    cfg.dump(str(out))
    cfg2 = load_config(str(out))
    assert cfg2.training.max_train_steps == 5000
    assert cfg2.training.losses.resource_loss.weight == 2.0


def test_config_none_does_not_clobber(tmp_path):
    cfg = Config({"a": {"b": 1}})
    cfg.update_flat({"a.b": None})
    assert cfg.a.b == 1
    cfg.update_flat({"a.b": 7})
    assert cfg.a.b == 7


def test_checkpoint_roundtrip_and_rotation(tmp_path):
    mgr = CheckpointManager(str(tmp_path), total_limit=2)
    state = {"w": np.arange(6, dtype=np.float32).reshape(2, 3), "step": np.asarray(1)}
    for step in (10, 20, 30):
        s = dict(state, step=np.asarray(step))
        mgr.save(step, s, artifacts={"quantizer_embeddings.pt": np.ones((4, 8))})
    assert mgr.list_steps() == [20, 30]  # rotated
    restored = mgr.restore(template=state)
    assert int(restored["step"]) == 30
    np.testing.assert_array_equal(restored["w"], state["w"])
    # reference-format artifact readable via torch
    emb = load_torch_artifact(os.path.join(mgr.dir_for(30), "quantizer_embeddings.pt"))
    assert np.asarray(emb).shape == (4, 8)


def test_torch_artifact_roundtrip(tmp_path):
    p = str(tmp_path / "arch_vector.pt")
    save_torch_artifact(np.linspace(0, 1, 10), p)
    back = np.asarray(load_torch_artifact(p))
    np.testing.assert_allclose(back, np.linspace(0, 1, 10))
