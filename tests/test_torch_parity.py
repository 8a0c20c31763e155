"""Golden parity vs the real HF transformers stack (VERDICT round 1, next #2).

The reference gets encoder correctness for free via `from_pretrained`
(trainer.py:706-712, data_utils.py:130-155); this repo re-implements CLIP
text + MPNet in flax and converts torch state dicts. These tests construct
genuine `transformers` models locally with random init (no network), run the
torch forward, convert via models/convert.py, and require the flax forward
to match — tiny configs AND the real SD-2.1 / all-mpnet-base-v2 shapes.
They replace the circular fixtures in test_convert.py as the source of truth
for converter layout assumptions (MPNet position ids, relative bias, CLIP
causal mask, GELU flavour).
"""
import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from diffusion_pruning_tpu.models.convert import (
    convert_clip_text_state_dict,
    convert_mpnet_state_dict,
)
from diffusion_pruning_tpu.models.text_encoders import (
    CLIPTextConfig,
    CLIPTextEncoder,
    MPNetConfig,
    MPNetEncoder,
    mean_pool,
)


def _hf_clip(cfg: CLIPTextConfig):
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_positions,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_act="gelu",  # SD-2.1's OpenCLIP text encoder uses exact GELU
    )
    torch.manual_seed(0)
    model = transformers.CLIPTextModel(hf_cfg).eval()
    return model


def _clip_parity(cfg: CLIPTextConfig, atol: float):
    model = _hf_clip(cfg)
    ids = torch.randint(0, cfg.vocab_size, (2, cfg.max_positions),
                        generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref = model(ids).last_hidden_state.numpy()

    params = convert_clip_text_state_dict(model.state_dict(), cfg)
    ours = np.asarray(CLIPTextEncoder(cfg).apply(
        {"params": params}, jnp.asarray(ids.numpy())))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=atol)


def test_clip_text_tiny_matches_torch():
    _clip_parity(CLIPTextConfig.tiny(), atol=1e-5)


def test_clip_text_sd21_config_matches_torch():
    """Real SD-2.1 shapes (d=1024, 23 layers, 16 heads), random weights."""
    _clip_parity(CLIPTextConfig.sd21(), atol=5e-4)


def _hf_mpnet(cfg: MPNetConfig):
    hf_cfg = transformers.MPNetConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_positions,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        layer_norm_eps=cfg.layer_norm_eps,
        pad_token_id=cfg.pad_token_id,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    return transformers.MPNetModel(hf_cfg, add_pooling_layer=False).eval()


def _mpnet_parity(cfg: MPNetConfig, seq: int, atol: float):
    model = _hf_mpnet(cfg)
    g = torch.Generator().manual_seed(2)
    # ids avoid the pad token; mask out a ragged tail per row (real padding)
    ids = torch.randint(cfg.pad_token_id + 1, cfg.vocab_size, (3, seq), generator=g)
    lengths = [seq, seq - 3, seq // 2]
    mask = torch.zeros(3, seq, dtype=torch.long)
    for r, L in enumerate(lengths):
        mask[r, :L] = 1
        ids[r, L:] = cfg.pad_token_id
    with torch.no_grad():
        ref = model(input_ids=ids, attention_mask=mask).last_hidden_state.numpy()

    params = convert_mpnet_state_dict(model.state_dict(), cfg)
    ours = np.asarray(MPNetEncoder(cfg).apply(
        {"params": params}, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy())))
    # compare only non-padded positions (HF computes garbage into pads too,
    # but the consumer is the masked mean pool)
    for r, L in enumerate(lengths):
        np.testing.assert_allclose(ours[r, :L], ref[r, :L], rtol=1e-4, atol=atol,
                                   err_msg=f"row {r}")
    # and the actual consumer contract: masked mean pooling matches
    m = torch.from_numpy(np.asarray(mask.numpy(), np.float32))[..., None]
    ref_pool = ((torch.from_numpy(ref) * m).sum(1) / m.sum(1)).numpy()
    ours_pool = np.asarray(mean_pool(jnp.asarray(ours), jnp.asarray(mask.numpy())))
    np.testing.assert_allclose(ours_pool, ref_pool, rtol=1e-4, atol=atol)


def test_mpnet_tiny_matches_torch():
    _mpnet_parity(MPNetConfig.tiny(), seq=16, atol=1e-5)


def test_mpnet_base_config_matches_torch():
    """Real all-mpnet-base-v2 shapes (d=768, 12 layers), random weights."""
    _mpnet_parity(MPNetConfig.base(), seq=64, atol=5e-4)


from diffusion_pruning_tpu.models.clip_vision import (  # noqa: E402
    CLIPVisionConfig,
    CLIPVisionEncoder,
)
from diffusion_pruning_tpu.models.convert import (  # noqa: E402
    convert_clip_vision_state_dict,
)


def _hf_clip_vision(cfg: CLIPVisionConfig):
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        projection_dim=cfg.projection_dim,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_act=cfg.hidden_act,
    )
    torch.manual_seed(0)
    return transformers.CLIPVisionModelWithProjection(hf_cfg).eval()


def _clip_vision_parity(cfg: CLIPVisionConfig, atol: float):
    model = _hf_clip_vision(cfg)
    px = torch.randn(2, 3, cfg.image_size, cfg.image_size,
                     generator=torch.Generator().manual_seed(4))
    with torch.no_grad():
        ref = model(px).image_embeds.numpy()
    params = convert_clip_vision_state_dict(model.state_dict(), cfg)
    _, ours = CLIPVisionEncoder(cfg).apply(
        {"params": params}, jnp.asarray(px.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=atol)


def test_clip_vision_tiny_matches_torch():
    _clip_vision_parity(CLIPVisionConfig.tiny(), atol=1e-5)


def test_clip_vision_vit_b32_config_matches_torch():
    """Real ViT-B/32 shapes (the CLIP-score tower), random weights."""
    _clip_vision_parity(CLIPVisionConfig.vit_b32(), atol=5e-4)


def test_clip_text_pooled_projection_matches_torch():
    """CLIP-score text side: EOS pooling + text_projection vs HF
    CLIPTextModelWithProjection."""
    from diffusion_pruning_tpu.models.text_encoders import clip_pooled_text_features

    cfg = CLIPTextConfig.tiny()
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, max_position_embeddings=cfg.max_positions,
        layer_norm_eps=cfg.layer_norm_eps, hidden_act="gelu",
        projection_dim=16, eos_token_id=2, bos_token_id=1, pad_token_id=0)
    torch.manual_seed(0)
    model = transformers.CLIPTextModelWithProjection(hf_cfg).eval()

    g = torch.Generator().manual_seed(7)
    # CLIP-tokenizer convention: eos is the LARGEST token id, so HF's legacy
    # argmax(input_ids) pooling (kept for eos_token_id==2 checkpoints, i.e.
    # every OpenAI CLIP) lands on the eos position
    eos = cfg.vocab_size - 1
    ids = torch.randint(3, cfg.vocab_size - 1, (3, 12), generator=g)
    lengths = [12, 9, 5]
    for r, L in enumerate(lengths):
        ids[r, L - 1] = eos
        ids[r, L:] = 0             # pad
    with torch.no_grad():
        ref = model(ids).text_embeds.numpy()

    params = convert_clip_text_state_dict(model.state_dict(), cfg)
    hidden = CLIPTextEncoder(cfg).apply({"params": params},
                                        jnp.asarray(ids.numpy()))
    proj = jnp.asarray(model.text_projection.weight.detach().numpy().T)
    for kw in ({"eos_token_id": None}, {"eos_token_id": eos}):
        ours = clip_pooled_text_features(hidden, jnp.asarray(ids.numpy()),
                                         projection=proj, **kw)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5,
                                   err_msg=str(kw))
