"""GroupNorm(+gate+SiLU) fused into the consumer 3x3 conv's input read.

The round-1 profile put ~34% of the dense-forward device time in the
normalisation `convert_reduce_fusion`s, and the isolated one-pass GroupNorm
kernel (ops/group_norm.py) LOST end-to-end because it broke XLA's
producer fusion around the stats reductions (PERFORMANCE.md). This kernel
attacks the remaining traffic instead: on TPU, convolutions are standalone
HLOs — elementwise producers do NOT fuse into a conv's operand — so the
norm→SiLU→conv chain in every resnet costs 4 HBM passes over the
activation (stats read, apply read, apply write, conv read). Here:

  phase 1 (XLA)    per-(batch, group) stats → per-channel affine (a, b):
                   one read, fused with the gate multiply;
  phase 2 (Pallas) implicit-GEMM conv3x3 that applies y = silu(a*x + b)
                   on the fly while reading x: one read, zero extra writes.

Total: 2 passes instead of 4. The conv itself runs as 9 shifted
(H*W, C_in) @ (C_in, TC_out) MXU matmuls over a row-padded VMEM copy of the
normalised tile; zero-padding happens in *y*-space (after the activation),
matching conv semantics exactly.

Covers the reference chain ResnetBlock2D norm1/norm2 → conv1/conv2 with the
channel gate between conv1 and norm2
(/root/reference/pdm/models/unet/blocks.py:345-353): the gate folds into
the affine coefficient a = gate * scale * rsqrt(var + eps), with stats taken
over the gated activation — bit-identical placement to `channel_gate` +
GroupNorm.

Backward = XLA recompute via custom_vjp (same pattern as
ops/flash_attention.py and ops/group_norm.py), so the fused path is
trainable with exact gate/scale gradients.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# conservative VMEM budget for one grid step (bytes); v5e has ~16 MB/core,
# leave headroom for double-buffered input/output blocks
_VMEM_BUDGET = 10 * 2 ** 20


def _affine_coeffs(x, scale, bias, groups, eps, gate_c):
    """Per-(batch, channel) affine (a, b) with y = a*x + b == GN(gate*x).

    Stats are taken over the *gated* activation (the reference applies the
    gate before norm2 — blocks.py:345-353); the gate multiply fuses into
    this reduction, so phase 1 is a single read of x."""
    b_, h_, w_, c = x.shape
    xf = x.astype(jnp.float32)
    if gate_c is not None:
        xf = xf * gate_c.astype(jnp.float32)[:, None, None, :]
    xg = xf.reshape(b_, h_ * w_, groups, c // groups)
    mean = xg.mean(axis=(1, 3))                       # (B, G)
    var = jnp.mean(xg * xg, axis=(1, 3)) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    rep = c // groups
    mean_c = jnp.repeat(mean, rep, axis=-1)           # (B, C)
    inv_c = jnp.repeat(inv, rep, axis=-1)
    sc = scale.astype(jnp.float32)[None, :] * inv_c
    a = sc if gate_c is None else sc * gate_c.astype(jnp.float32)
    b = bias.astype(jnp.float32)[None, :] - mean_c * sc
    return a, b


def _pick_tiles(h, w, c, cout, esize):
    """(row_tile, cout_tile) fitting the VMEM budget, or None.

    Prefers whole-image row tiles (single x operand); falls back to H-tiling
    with a 3-block halo read (x passed thrice with clamped row index maps —
    the 512px level-0 maps need this). C_out tiles must divide C_out and be
    lane-aligned (multiple of 128) unless they cover the whole dim.
    Pipelined operand blocks (x, weights, out) count twice — Mosaic
    double-buffers them; the ypad scratch + its shifted copy are single."""
    for th in (h, 32, 16, 8):
        if th > h or h % th:
            continue
        n_x = 2 if th == h else 6  # halo variant reads x via 3 specs
        fixed = n_x * th * w * c * esize + 2 * (th + 2) * w * c * esize
        for n in (1, 2, 4, 5, 8, 10, 16, 20):
            if cout % n:
                continue
            t = cout // n
            if t != cout and t % 128 != 0:
                continue
            vm = fixed + 2 * 9 * c * t * esize + th * w * t * 4 \
                + 2 * th * w * t * esize
            if vm <= _VMEM_BUDGET:
                return th, t
    return None


def _nc_kernel(x_ref, a_ref, b_ref, w_ref, cb_ref, o_ref, ypad_ref, *,
               H: int, W: int, silu: bool):
    # x: (1, H, W, C); a/b: (1, 1, C) f32 (the dummy middle dim keeps the
    # block's trailing dims equal to the array dims — Mosaic rejects a
    # (1, C) block over a (B, C) array); w: (9, C, TC); cb: (1, TC);
    # o: (1, H, W, TC); ypad scratch: (H+2, W, C) in compute dtype.
    C = x_ref.shape[-1]
    TC = o_ref.shape[-1]
    cdtype = ypad_ref.dtype

    # The normalised tile only depends on the batch index — build it once
    # per image (grid iterates the C_out-tile dim fastest).
    @pl.when(pl.program_id(1) == 0)
    def _build():
        xv = x_ref[0].astype(jnp.float32)                    # (H, W, C)
        y = a_ref[0, 0][None, None, :] * xv + b_ref[0, 0][None, None, :]
        if silu:
            y = y * jax.nn.sigmoid(y)
        ypad_ref[0] = jnp.zeros((W, C), cdtype)              # zero halo rows:
        ypad_ref[H + 1] = jnp.zeros((W, C), cdtype)          # conv zero-pad is
        ypad_ref[pl.ds(1, H)] = y.astype(cdtype)             # in y-space

    yp = ypad_ref[:]                                         # (H+2, W, C)
    zcol = jnp.zeros((H + 2, 1, C), cdtype)
    acc = jnp.zeros((H * W, TC), jnp.float32)
    for dw in range(3):
        # v[:, w] = y[:, w + dw - 1] with zeros shifted in at the W edges
        if dw == 0:
            v = jnp.concatenate([zcol, yp[:, : W - 1]], axis=1)
        elif dw == 1:
            v = yp
        else:
            v = jnp.concatenate([yp[:, 1:], zcol], axis=1)
        vf = v.reshape((H + 2) * W, C)
        for dh in range(3):
            acc = acc + jax.lax.dot_general(
                vf[dh * W: dh * W + H * W], w_ref[3 * dh + dw],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (acc + cb_ref[0][None, :].astype(jnp.float32)
                ).reshape(H, W, TC).astype(o_ref.dtype)


def _nc_kernel_ht(xp_ref, xc_ref, xn_ref, a_ref, b_ref, w_ref, cb_ref, o_ref,
                  ypad_ref, *, TH: int, W: int, NR: int, silu: bool):
    """H-tiled variant: the halo rows come from neighbour row-blocks (x is
    passed three times with clamped row index maps). Image-edge halo rows
    are zeroed in y-space, matching conv zero padding."""
    C = xc_ref.shape[-1]
    TC = o_ref.shape[-1]
    cdtype = ypad_ref.dtype

    # hoisted: program_id has no lowering inside a pl.when body on the
    # CPU interpreter (hlo_interpreter cond branches)
    r = pl.program_id(1)

    @pl.when(pl.program_id(2) == 0)
    def _build():
        a = a_ref[0, 0][None, None, :]
        b = b_ref[0, 0][None, None, :]

        def norm(v):
            y = a * v.astype(jnp.float32) + b
            return y * jax.nn.sigmoid(y) if silu else y

        ypad_ref[pl.ds(1, TH)] = norm(xc_ref[0]).astype(cdtype)
        zero = jnp.zeros((1, W, C), jnp.float32)
        top = jnp.where(r > 0, norm(xp_ref[0, TH - 1: TH]), zero)
        bot = jnp.where(r < NR - 1, norm(xn_ref[0, 0:1]), zero)
        ypad_ref[0:1] = top.astype(cdtype)
        ypad_ref[TH + 1: TH + 2] = bot.astype(cdtype)

    yp = ypad_ref[:]
    zcol = jnp.zeros((TH + 2, 1, C), cdtype)
    acc = jnp.zeros((TH * W, TC), jnp.float32)
    for dw in range(3):
        if dw == 0:
            v = jnp.concatenate([zcol, yp[:, : W - 1]], axis=1)
        elif dw == 1:
            v = yp
        else:
            v = jnp.concatenate([yp[:, 1:], zcol], axis=1)
        vf = v.reshape((TH + 2) * W, C)
        for dh in range(3):
            acc = acc + jax.lax.dot_general(
                vf[dh * W: dh * W + TH * W], w_ref[3 * dh + dw],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = (acc + cb_ref[0][None, :].astype(jnp.float32)
                ).reshape(TH, W, TC).astype(o_ref.dtype)


def _forward(x, scale, bias, kernel, conv_bias, gate_c, groups, eps, silu,
             interpret):
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    tiles = _pick_tiles(h, w, c, cout, x.dtype.itemsize)
    if tiles is None:  # does not fit VMEM even H-tiled (huge C_in cases)
        return _reference(x, scale, bias, kernel, conv_bias, gate_c, groups,
                          eps, silu)
    th, tc = tiles
    a, bb = _affine_coeffs(x, scale, bias, groups, eps, gate_c)
    a, bb = a[:, None, :], bb[:, None, :]   # (B, 1, C) — legal block dims
    wk = kernel.reshape(9, c, cout).astype(x.dtype)
    cb = conv_bias.reshape(1, cout)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((th + 2, w, c), x.dtype)],
        interpret=interpret,
    )
    if th == h:
        return pl.pallas_call(
            functools.partial(_nc_kernel, H=h, W=w, silu=silu),
            grid=(b, cout // tc),
            in_specs=[
                pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9, c, tc), lambda i, j: (0, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, w, tc), lambda i, j: (i, 0, 0, j),
                                   memory_space=pltpu.VMEM),
            **common,
        )(x, a, bb, wk, cb)
    nr = h // th
    xspec = lambda rmap: pl.BlockSpec(  # noqa: E731
        (1, th, w, c), lambda i, r, j, _m=rmap: (i, _m(r), 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_nc_kernel_ht, TH=th, W=w, NR=nr, silu=silu),
        grid=(b, nr, cout // tc),
        in_specs=[
            xspec(lambda r: jnp.maximum(r - 1, 0)),
            xspec(lambda r: r),
            xspec(lambda r: jnp.minimum(r + 1, nr - 1)),
            pl.BlockSpec((1, 1, c), lambda i, r, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, r, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, tc), lambda i, r, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda i, r, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, tc), lambda i, r, j: (i, r, 0, j),
                               memory_space=pltpu.VMEM),
        **common,
    )(x, x, x, a, bb, wk, cb)


def _reference(x, scale, bias, kernel, conv_bias, gate_c, groups, eps, silu):
    """Unfused composition (gate → GroupNorm → SiLU → conv3x3), f32 stats —
    the exact semantics the kernel must match; also the VJP recompute."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    if gate_c is not None:
        xf = xf * gate_c.astype(jnp.float32)[:, None, None, :]
    xg = xf.reshape(b, h * w, groups, c // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    y = y.astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(y.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    # conv in the operand dtype (like the unfused nn.Conv chain): a
    # preferred_element_type=f32 here makes the conv TRANSPOSE see a f32
    # cotangent against a bf16 kernel — lax.conv requires matching dtypes,
    # so the bf16 VJP recompute would crash (caught by the bf16 CLI smoke)
    out = jax.lax.conv_general_dilated(
        y, kernel.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=dn)
    return (out.astype(jnp.float32)
            + conv_bias.astype(jnp.float32)).astype(x.dtype)


def _nl_kernel(x_ref, a_ref, b_ref, w_ref, lb_ref, o_ref):
    # x: (1, HW, C); a/b: (1, 1, C) f32 (dummy middle dim — see _nc_kernel);
    # w: (C, TC); lb: (1, TC); o: (1, HW, TC)
    x = x_ref[0].astype(jnp.float32)
    y = (a_ref[0, 0][None, :] * x + b_ref[0, 0][None, :]).astype(x_ref.dtype)
    acc = jax.lax.dot_general(y, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = (acc + lb_ref[0][None, :].astype(jnp.float32)).astype(o_ref.dtype)


def _linear_reference(x, scale, bias, kernel, lbias, gate_c, groups, eps):
    """GroupNorm (no SiLU) → Dense: the transformer norm→proj_in chain."""
    b, s, c = x.shape
    xf = x.astype(jnp.float32)
    if gate_c is not None:
        xf = xf * gate_c.astype(jnp.float32)[:, None, :]
    xg = xf.reshape(b, s, groups, c // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, s, c)
    y = (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)
    # operand-dtype dot for the same transpose-dtype reason as _reference
    out = jnp.einsum("bsc,cd->bsd", y, kernel.astype(x.dtype))
    return (out.astype(jnp.float32) + lbias.astype(jnp.float32)).astype(x.dtype)


def _linear_forward(x, scale, bias, kernel, lbias, gate_c, groups, eps,
                    interpret):
    b, s, c = x.shape
    cout = kernel.shape[-1]
    esize = x.dtype.itemsize
    vm = (3 * s * c * esize              # x block (×2 pipelined) + norm copy
          + c * cout * esize             # weights (index constant — 1×)
          + s * cout * (4 + 2 * esize))  # f32 accumulator + out block ×2
    if vm > _VMEM_BUDGET:
        return _linear_reference(x, scale, bias, kernel, lbias, gate_c,
                                 groups, eps)
    a, bb = _affine_coeffs(x[:, :, None, :], scale, bias, groups, eps, gate_c)
    a, bb = a[:, None, :], bb[:, None, :]   # (B, 1, C) — legal block dims
    out = pl.pallas_call(
        _nl_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, cout), x.dtype),
        interpret=interpret,
    )(x, a, bb, kernel.astype(x.dtype), lbias.reshape(1, cout))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def group_norm_linear(x, scale, bias, kernel, lbias,
                      gate_c: Optional[jax.Array], groups: int,
                      eps: float = 1e-6, interpret: bool = False):
    """proj(GroupNorm(x)) in one input pass — the spatial transformer's
    norm→proj_in chain (no SiLU). x: (B, S, C) tokens; kernel: (C, C_out)."""
    return _linear_forward(x, scale, bias, kernel, lbias, gate_c, groups,
                           eps, interpret)


def _lfwd(x, scale, bias, kernel, lbias, gate_c, groups, eps, interpret):
    out = _linear_forward(x, scale, bias, kernel, lbias, gate_c, groups, eps,
                          interpret)
    return out, (x, scale, bias, kernel, lbias, gate_c)


def _lbwd(groups, eps, interpret, res, g):
    x, scale, bias, kernel, lbias, gate_c = res
    _, vjp = jax.vjp(
        lambda *args: _linear_reference(*args, groups, eps),
        x, scale, bias, kernel, lbias, gate_c)
    return vjp(g)


group_norm_linear.defvjp(_lfwd, _lbwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def group_norm_silu_conv3x3(x, scale, bias, kernel, conv_bias,
                            gate_c: Optional[jax.Array], groups: int,
                            eps: float = 1e-5, silu: bool = True,
                            interpret: bool = False):
    """conv3x3(silu(GroupNorm(gate * x))) in one input pass.

    x: (B, H, W, C) NHWC; scale/bias: (C,) GroupNorm affine; kernel:
    (3, 3, C, C_out) HWIO; conv_bias: (C_out,); gate_c: optional (B, C)
    per-channel gate (already group-expanded and CFG-tiled). Call
    positionally — custom_vjp forbids kwargs for diff args."""
    return _forward(x, scale, bias, kernel, conv_bias, gate_c, groups, eps,
                    silu, interpret)


def _fwd(x, scale, bias, kernel, conv_bias, gate_c, groups, eps, silu,
         interpret):
    out = _forward(x, scale, bias, kernel, conv_bias, gate_c, groups, eps,
                   silu, interpret)
    return out, (x, scale, bias, kernel, conv_bias, gate_c)


def _bwd(groups, eps, silu, interpret, res, g):
    x, scale, bias, kernel, conv_bias, gate_c = res
    _, vjp = jax.vjp(
        lambda *args: _reference(*args, groups, eps, silu),
        x, scale, bias, kernel, conv_bias, gate_c)
    return vjp(g)


group_norm_silu_conv3x3.defvjp(_fwd, _bwd)
