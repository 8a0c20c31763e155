"""HF-hub upload contract (utils/hub.py) driven with a stub package.

The reference creates the repo at trainer init when
`training.hf_hub.push_to_hub` and uploads the run dir at end of training
(pdm/training/trainer.py:490-494, 1015-1021). huggingface_hub is absent on
this image (no egress), so these tests inject a fake module and assert the
call contract; the missing-package path must raise a clean RuntimeError
only when the config opted in.
"""
import sys
import types

import pytest

from diffusion_pruning_tpu.utils.config import load_config_dict
from diffusion_pruning_tpu.utils import hub


def _fake_hub(calls):
    fake = types.ModuleType("huggingface_hub")

    class _Repo:
        repo_id = "user/run-x"

    def create_repo(repo_id, exist_ok=False, token=None):
        calls["create"].append((repo_id, exist_ok, token))
        return _Repo()

    def upload_folder(repo_id, folder_path, commit_message=None,
                      ignore_patterns=None, token=None):
        calls["upload"].append((repo_id, folder_path, commit_message,
                                tuple(ignore_patterns or ()), token))

    fake.create_repo = create_repo
    fake.upload_folder = upload_folder
    return fake


@pytest.fixture
def calls(monkeypatch):
    calls = {"create": [], "upload": []}
    monkeypatch.setitem(sys.modules, "huggingface_hub", _fake_hub(calls))
    return calls


def test_create_repo_defaults_to_run_dir_name(calls):
    repo_id = hub.create_training_repo("/tmp/runs/my-run/")
    # reference: hub_model_id or Path(logging_dir).name (trainer.py:492)
    assert calls["create"] == [("my-run", True, None)]
    assert repo_id == "user/run-x"  # normalised id from the hub response


def test_push_run_uploads_folder(calls):
    hub.push_run_to_hub("/tmp/runs/my-run", "user/run-x", token="tok")
    (repo_id, folder, msg, ignore, token), = calls["upload"]
    assert (repo_id, folder, token) == ("user/run-x", "/tmp/runs/my-run", "tok")
    assert msg == "End of training"
    assert "checkpoint-*/state/*" in ignore


def test_maybe_push_disabled_and_enabled(calls, tmp_path):
    cfg = load_config_dict({"training": {"hf_hub": {"push_to_hub": False}}})
    assert hub.maybe_push_to_hub(cfg, str(tmp_path)) is None
    assert not calls["create"] and not calls["upload"]

    cfg = load_config_dict({"training": {"hf_hub": {
        "push_to_hub": True, "hub_model_id": "org/experts", "hub_token": "t"}}})
    repo_id = hub.maybe_push_to_hub(cfg, str(tmp_path))
    assert repo_id == "user/run-x"
    assert calls["create"] == [("org/experts", True, "t")]
    assert calls["upload"][0][0] == "user/run-x"


def test_maybe_push_without_section_is_noop(calls, tmp_path):
    cfg = load_config_dict({"training": {}})
    assert hub.maybe_push_to_hub(cfg, str(tmp_path)) is None


def test_missing_package_raises_only_when_opted_in(monkeypatch, tmp_path):
    monkeypatch.setitem(sys.modules, "huggingface_hub", None)  # force ImportError
    cfg = load_config_dict({"training": {"hf_hub": {"push_to_hub": True}}})
    with pytest.raises(RuntimeError, match="huggingface_hub"):
        hub.maybe_push_to_hub(cfg, str(tmp_path))
    cfg = load_config_dict({"training": {"hf_hub": {"push_to_hub": False}}})
    assert hub.maybe_push_to_hub(cfg, str(tmp_path)) is None
