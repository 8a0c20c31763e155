"""End-to-end smoke test: routed generation with tiny random models.

Mirrors the reference's only 'integration test' (running the pipeline) but
automated with a randomly-initialised model zoo (SURVEY.md §4 notes the
reference has no test suite — this is the gap-filling suite)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_pruning_tpu.core import build_structure
from diffusion_pruning_tpu.models.hypernet import HyperStructure
from diffusion_pruning_tpu.models.quantizer import StructureQuantizer
from diffusion_pruning_tpu.models.text_encoders import (
    CLIPTextConfig, CLIPTextEncoder, MPNetConfig, MPNetEncoder, mean_pool,
)
from diffusion_pruning_tpu.models.unet.config import UNetConfig
from diffusion_pruning_tpu.models.unet.unet import GatedUNet
from diffusion_pruning_tpu.models.vae import AutoencoderKL, VAEConfig
from diffusion_pruning_tpu.pipelines import PruningPipeline
from diffusion_pruning_tpu.schedulers import DiffusionSchedule


def build_tiny_pipeline():
    rng = jax.random.PRNGKey(0)
    ucfg = UNetConfig.tiny(cross_attention_dim=32)
    tcfg = CLIPTextConfig.tiny()  # hidden 32 == cross_attention_dim
    vcfg = VAEConfig.tiny()
    spec = build_structure(ucfg)

    unet = GatedUNet(ucfg)
    unet_params = unet.init_params(rng, batch=1)

    text = CLIPTextEncoder(tcfg)
    ids = jnp.zeros((1, ucfg.max_text_len), jnp.int32)
    text_params = text.init(rng, ids)["params"]

    vae = AutoencoderKL(vcfg)
    img = jnp.zeros((1, ucfg.sample_size * 8, ucfg.sample_size * 8, 3))
    vae_params = vae.init(rng, img, rng)["params"]

    hypernet = HyperStructure(spec, input_dim=tcfg.hidden_size)
    hn_params = hypernet.init(rng, jnp.zeros((1, tcfg.hidden_size)))["params"]

    quantizer = StructureQuantizer(spec, n_e=4, base=3.0)
    q_params = quantizer.init_params(rng)
    q_state = quantizer.init_state(q_params)

    return PruningPipeline(
        unet=unet, unet_params=unet_params,
        vae=vae, vae_params=vae_params,
        text_encoder=text, text_params=text_params,
        hypernet=hypernet, hypernet_params=hn_params,
        quantizer=quantizer, quantizer_params=q_params, quantizer_state=q_state,
        schedule=DiffusionSchedule(),
    )


@pytest.fixture(scope="module")
def tiny_pipeline():
    return build_tiny_pipeline()


def test_routed_generation(tiny_pipeline):
    p = tiny_pipeline
    cfg = p.unet.cfg
    ids = jnp.ones((2, cfg.max_text_len), jnp.int32)
    neg = jnp.zeros((2, cfg.max_text_len), jnp.int32)
    vs = p.vae.cfg.spatial_scale
    images, indices, ratios = p(ids, neg, jax.random.PRNGKey(0),
                                num_inference_steps=3, guidance_scale=7.5)
    assert images.shape == (2, cfg.sample_size * vs, cfg.sample_size * vs, 3)
    assert np.isfinite(np.asarray(images)).all()
    assert float(images.min()) >= 0.0 and float(images.max()) <= 1.0
    assert indices.shape == (2,)
    r = np.asarray(ratios)
    assert np.all(r > 0) and np.all(r <= 1.0 + 1e-6)


def test_generate_samples_dense(tiny_pipeline):
    p = tiny_pipeline
    cfg = p.unet.cfg
    ids = jnp.ones((1, cfg.max_text_len), jnp.int32)
    neg = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    vs = p.vae.cfg.spatial_scale
    images = p.generate_samples(ids, neg, jax.random.PRNGKey(1),
                                arch=None, num_inference_steps=2)
    assert images.shape == (1, cfg.sample_size * vs, cfg.sample_size * vs, 3)


def test_quantizer_samples(tiny_pipeline):
    p = tiny_pipeline
    cfg = p.unet.cfg
    ids = jnp.ones((2, cfg.max_text_len), jnp.int32)
    neg = jnp.zeros((2, cfg.max_text_len), jnp.int32)
    images = p.quantizer_samples(ids, neg, jax.random.PRNGKey(2),
                                 expert_ids=[0, 3], num_inference_steps=2)
    assert images.shape[0] == 2


def test_depth_analysis_arch(tiny_pipeline):
    p = tiny_pipeline
    spec = p.unet.spec
    arch = p.depth_analysis_arch([0, spec.num_depth - 1])
    assert float(arch[0, spec.num_width]) == 0.0
    assert float(arch[0, -1]) == 0.0
    assert float(arch[:, : spec.num_width].min()) == 1.0


def test_mpnet_mean_pool_routing_input():
    cfg = MPNetConfig.tiny()
    enc = MPNetEncoder(cfg)
    ids = jnp.asarray([[2, 5, 9, 1, 1], [3, 4, 1, 1, 1]], jnp.int32)
    mask = (ids != 1).astype(jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)["params"]
    out = enc.apply({"params": params}, ids, mask)
    pooled = mean_pool(out, mask)
    assert pooled.shape == (2, cfg.hidden_size)
    # pooling ignores padded positions: change a padded token, output constant
    ids2 = ids.at[0, 4].set(7)
    out2 = enc.apply({"params": params}, ids2, mask)
    pooled2 = mean_pool(out2, mask)
    np.testing.assert_allclose(np.asarray(pooled[0]), np.asarray(pooled2[0]), atol=1e-5)


def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(1), x, jax.random.PRNGKey(2))["params"]
    lat = vae.apply({"params": params}, x, jax.random.PRNGKey(3), method=AutoencoderKL.encode)
    assert lat.shape == (1, 16, 16, cfg.latent_channels)  # one downsample level
    rec = vae.apply({"params": params}, lat, method=AutoencoderKL.decode)
    assert rec.shape == x.shape


def test_expert_server_dispatch(tiny_pipeline):
    """Route a mixed batch to materialised experts; outputs align with
    prompt order and every prompt is served by its assigned expert."""
    import numpy as np
    from diffusion_pruning_tpu.pipelines.expert_server import ExpertServer

    p = tiny_pipeline
    cfg = p.unet.cfg
    spec = p.unet.spec
    server = ExpertServer.from_codebook(p, p.unet_params, spec, cfg, batch_size=2)
    assert len(server.expert_models) == p.quantizer.n_e
    assert all(0 < r <= 1.0 for r in server.expert_ratios)

    ids = jnp.asarray(jax.random.randint(jax.random.PRNGKey(0), (5, cfg.max_text_len),
                                         0, 100))
    neg = jnp.zeros((1, cfg.max_text_len), jnp.int32)
    images, indices = server.generate(ids, neg, jax.random.PRNGKey(1),
                                      num_inference_steps=2)
    vs = p.vae.cfg.spatial_scale
    assert images.shape == (5, cfg.sample_size * vs, cfg.sample_size * vs, 3)
    assert indices.shape == (5,)
    assert np.isfinite(images).all()
    # routing is deterministic: same prompts → same experts
    indices2 = server.route(ids)
    np.testing.assert_array_equal(indices, indices2)


def test_safety_checker_screens_images(tiny_pipeline):
    """Safety checker (models/safety.py): flagged images come back black and
    the pipeline returns the nsfw flags (pruning_pipelines.py:826-839)."""
    import dataclasses
    from diffusion_pruning_tpu.models.safety import SafetyChecker, clip_preprocess

    # stub CLIP vision tower: embeds to the mean pixel so we can steer flags
    def embed(px):  # (B, 224, 224, 3) preprocessed
        m = px.mean(axis=(1, 2, 3))
        return jnp.stack([m, jnp.ones_like(m)], axis=-1)

    px = clip_preprocess(jnp.zeros((2, 16, 16, 3)))
    assert px.shape == (2, 224, 224, 3)

    # threshold -inf on concept 0 → everything flags; +inf → nothing flags
    flag_all = SafetyChecker(embed, np.array([[0.0, 1.0]]), np.array([-1e9]))
    flag_none = SafetyChecker(embed, np.array([[0.0, 1.0]]), np.array([1e9]))

    p = dataclasses.replace(tiny_pipeline, safety_checker=flag_all)
    p._fn_cache = dict(getattr(tiny_pipeline, "_fn_cache", {}))
    p._denoise_cache = dict(getattr(tiny_pipeline, "_denoise_cache", {}))
    cfg = p.unet.cfg
    ids = jnp.ones((2, cfg.max_text_len), jnp.int32)
    neg = jnp.zeros((2, cfg.max_text_len), jnp.int32)
    images, indices, ratios, nsfw = p(ids, neg, jax.random.PRNGKey(5),
                                      num_inference_steps=2)
    assert np.asarray(nsfw).all()
    assert float(jnp.abs(images).max()) == 0.0  # blacked out

    p2 = dataclasses.replace(p, safety_checker=flag_none)
    p2._fn_cache, p2._denoise_cache = p._fn_cache, p._denoise_cache
    images2, _, _, nsfw2 = p2(ids, neg, jax.random.PRNGKey(5),
                              num_inference_steps=2)
    assert not np.asarray(nsfw2).any()
    assert float(jnp.abs(images2).max()) > 0.0
