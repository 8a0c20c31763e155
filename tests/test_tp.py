"""Tensor-parallel U-Net forward (parallel/tp.py): a 2-D data×model mesh
with Megatron-style param specs must reproduce the single-device forward.
Beyond-reference capability (the reference is DP-only, SURVEY §2.4)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from diffusion_pruning_tpu.models.unet.config import UNetConfig
from diffusion_pruning_tpu.models.unet.unet import GatedUNet
from diffusion_pruning_tpu.parallel.tp import (
    MODEL_AXIS,
    dp_tp_mesh,
    shard_params,
    tp_jit_forward,
    unet_param_specs,
)


def test_tp_specs_split_matmul_params():
    cfg = UNetConfig.tiny(cross_attention_dim=32)
    model = GatedUNet(cfg)
    params = model.init_params(jax.random.PRNGKey(0), batch=1)
    specs = unet_param_specs(params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    by_name = {"/".join(str(k.key) for k in path): spec for path, spec in flat}
    attn = "down_blocks_0_attentions_0/transformer_blocks_0/attn1"
    assert by_name[f"{attn}/to_q/kernel"] == P(None, MODEL_AXIS)
    assert by_name[f"{attn}/to_out_0/kernel"] == P(MODEL_AXIS, None)
    ff = "down_blocks_0_attentions_0/transformer_blocks_0/ff"
    assert by_name[f"{ff}/act/proj/kernel"] == P(None, MODEL_AXIS)
    assert by_name[f"{ff}/out/kernel"] == P(MODEL_AXIS, None)
    res = "down_blocks_0_resnets_0"
    assert by_name[f"{res}/conv1/kernel"] == P(None, None, None, MODEL_AXIS)
    assert by_name[f"{res}/conv2/kernel"] == P(None, None, MODEL_AXIS, None)
    # norms replicated
    assert by_name[f"{res}/norm1/scale"] == P()


def test_tp_forward_matches_single_device(devices):
    cfg = UNetConfig.tiny(cross_attention_dim=32)
    model = GatedUNet(cfg)
    params = model.init_params(jax.random.PRNGKey(0), batch=1)

    b = 4
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    sample = jax.random.normal(ks[0], (b, cfg.sample_size, cfg.sample_size,
                                       cfg.in_channels))
    t = jnp.asarray([0, 10, 500, 999])
    ehs = jax.random.normal(ks[1], (b, cfg.max_text_len, cfg.cross_attention_dim))
    spec = model.spec
    arch = (jax.random.uniform(ks[2], (b, spec.vq_dim)) < 0.7).astype(jnp.float32)

    ref = model.apply({"params": params}, sample, t, ehs, arch=arch)

    mesh = dp_tp_mesh(2, 4, devices)
    tp_params = shard_params(mesh, params)
    fwd = tp_jit_forward(model, mesh)
    out = fwd(tp_params, sample, t, ehs, arch)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # the big matmul params really are split over the model axis
    leaf = tp_params["mid_block_attentions_0"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    assert len(leaf.sharding.device_set) >= 4


def test_sharded_pipeline_matches_single_device(devices):
    """shard_pipeline over a 2×4 data×model mesh must reproduce the
    single-device routed pipeline and expert server bit-for-bit (up to CPU
    conv-library noise) — the 512px+ multi-chip serving path."""
    from test_pipeline import build_tiny_pipeline
    from diffusion_pruning_tpu.parallel.tp import shard_pipeline
    from diffusion_pruning_tpu.pipelines.expert_server import ExpertServer
    from diffusion_pruning_tpu.core import build_structure

    p = build_tiny_pipeline()
    cfg = p.unet.cfg
    b = 4
    ids = jnp.asarray(np.random.RandomState(0).randint(
        0, 100, (b, cfg.max_text_len)))
    neg = jnp.zeros((b, cfg.max_text_len), jnp.int32)
    key = jax.random.PRNGKey(3)

    ref_imgs, ref_idx, ref_ratios = p(ids, neg, key, num_inference_steps=3,
                                      guidance_scale=7.5)

    mesh = dp_tp_mesh(2, 4, devices)
    sp = shard_pipeline(p, mesh)
    out_imgs, out_idx, out_ratios = sp(ids, neg, key, num_inference_steps=3,
                                       guidance_scale=7.5)
    np.testing.assert_array_equal(np.asarray(out_idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(out_imgs), np.asarray(ref_imgs),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_ratios), np.asarray(ref_ratios),
                               rtol=1e-5, atol=1e-6)
    # U-Net params really live on the mesh
    leaf = sp.unet_params["mid_block_attentions_0"]["transformer_blocks_0"][
        "attn1"]["to_q"]["kernel"]
    assert len(leaf.sharding.device_set) == 8

    # expert server built FROM the sharded pipeline: experts shard too and
    # dispatch reproduces the single-device server
    spec = build_structure(cfg)
    ref_server = ExpertServer.from_codebook(p, p.unet_params, spec, cfg,
                                            batch_size=2)
    sh_server = ExpertServer.from_codebook(sp, sp.unet_params, spec, cfg,
                                           batch_size=2)
    ref_out, ref_e = ref_server.generate(ids, neg, jax.random.PRNGKey(7),
                                         num_inference_steps=2)
    sh_out, sh_e = sh_server.generate(ids, neg, jax.random.PRNGKey(7),
                                      num_inference_steps=2)
    np.testing.assert_array_equal(np.asarray(sh_e), np.asarray(ref_e))
    np.testing.assert_allclose(sh_out, ref_out, rtol=1e-4, atol=1e-4)


def test_gspmd_dp_tp_finetune_step_matches_single_device(devices):
    """2-D (data×model) GSPMD fine-tune step ≡ the single-device step with
    the same key — global-batch semantics, XLA-placed collectives."""
    from diffusion_pruning_tpu.models.text_encoders import CLIPTextConfig, CLIPTextEncoder
    from diffusion_pruning_tpu.models.vae import AutoencoderKL, VAEConfig
    from diffusion_pruning_tpu.parallel.tp import shard_params as tp_shard
    from diffusion_pruning_tpu.schedulers import DiffusionSchedule
    from diffusion_pruning_tpu.training.finetuner import (
        FineTuneConfig, FineTunerModules, make_finetune_optimizer,
        make_finetune_step, make_finetune_step_gspmd,
    )

    rng = jax.random.PRNGKey(0)
    ucfg = UNetConfig.tiny(cross_attention_dim=32)
    teacher = GatedUNet(ucfg)
    dense = teacher.init_params(rng, batch=1)
    student_params = jax.tree.map(jnp.asarray, dense)
    res = ucfg.sample_size * 8
    vae = AutoencoderKL(VAEConfig.tiny())
    text = CLIPTextEncoder(CLIPTextConfig.tiny())
    frozen = {
        "teacher": dense,
        "vae": vae.init(rng, jnp.zeros((1, res, res, 3)), rng)["params"],
        "text": text.init(rng, jnp.zeros((1, 77), jnp.int32))["params"],
    }
    mods = FineTunerModules(student=teacher, teacher=teacher, vae=vae,
                            text_encoder=text, schedule=DiffusionSchedule())
    cfg = FineTuneConfig(lr_warmup_steps=0, scale_lr=False, unet_lr=1e-4)
    b = 4
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    batch = {"pixel_values": jax.random.normal(ks[0], (b, res, res, 3)) * 0.5,
             "input_ids": jax.random.randint(ks[1], (b, 77), 0, 128)}
    key = jax.random.PRNGKey(2)

    opt = make_finetune_optimizer(cfg, global_batch=b)
    single = make_finetune_step(mods, cfg, opt, mesh=None)
    s_params, s_opt, s_metrics = single(student_params, frozen,
                                        opt.init(student_params), batch, key)

    mesh = dp_tp_mesh(2, 2, devices[:4])
    tp_student = tp_shard(mesh, student_params)
    tp_frozen = dict(frozen, teacher=tp_shard(mesh, frozen["teacher"]))
    tp_opt_state = opt.init(tp_student)
    gstep = make_finetune_step_gspmd(mods, cfg, opt, mesh)
    g_params, g_opt, g_metrics = gstep(tp_student, tp_frozen, tp_opt_state,
                                       batch, key)

    for k in s_metrics:
        np.testing.assert_allclose(float(g_metrics[k]), float(s_metrics[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    flat_s, _ = jax.tree_util.tree_flatten(jax.tree.map(np.asarray, s_params))
    flat_g, _ = jax.tree_util.tree_flatten(jax.tree.map(np.asarray, g_params))
    for i, (a, c) in enumerate(zip(flat_s, flat_g)):
        np.testing.assert_allclose(c, a, rtol=1e-4, atol=2e-5,
                                   err_msg=f"leaf {i}")
