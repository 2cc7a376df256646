"""Fused residual-add + LayerNorm + int8-quantize Pallas kernel (serving).

The int8 serving path's two per-layer activation-quantize passes cannot
fuse in XLA: the LayerNorms that produce attn_in / mlp_in also feed the
residual adds, so XLA materializes the bf16 stream and a standalone
round/clip/convert pass re-reads it (measured 4.05 ms/batch at B=96 --
BENCH.md round-4 int8 Amdahl decomposition, item 2).  This kernel emits
BOTH consumers' views of the mlp_in site in one HBM pass:

    x, res --> h = LayerNorm(x + res)          (bf16, feeds the residual)
           --> xi = round(clip(h / scale))     (int8, feeds the wi matmul)

Per-element traffic drops from 9 bytes (LN fusion 2+2 read, 2 write; then
quantize 2 read, 1 write) to 7 (2+2 read, 2+1 write) -- bound ~1.35 ms of
the serving step for this site.  The quantize reads the bf16-ROUNDED h so
xi is bit-identical to the unfused ``quantize_act(h)`` composition.

``ascale=None`` runs the dynamic per-row mode: the kernel also computes
the per-row absmax scale (the reduce rides the same VMEM pass) and
returns it as a third output.

Forward-only (the serving jit is never differentiated); the XLA
composition in models/bert.py remains the fallback everywhere the kernel
does not dispatch (CPU, TP meshes, training).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel_static(x_ref, r_ref, g_ref, b_ref, s_ref, h_ref, xi_ref, *,
                   eps: float):
    x = x_ref[...].astype(jnp.float32) + r_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    hlow = y.astype(h_ref.dtype)
    h_ref[...] = hlow
    # quantize the ROUNDED h (bit-parity with quantize_act on the bf16 h)
    y2 = hlow.astype(jnp.float32)
    s = s_ref[0, 0]
    xi_ref[...] = jnp.clip(jnp.round(y2 / s), -127, 127).astype(jnp.int8)


def _kernel_dynamic(x_ref, r_ref, g_ref, b_ref, h_ref, xi_ref, row_ref, *,
                    eps: float):
    x = x_ref[...].astype(jnp.float32) + r_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    hlow = y.astype(h_ref.dtype)
    h_ref[...] = hlow
    y2 = hlow.astype(jnp.float32)
    row = jnp.max(jnp.abs(y2), axis=-1, keepdims=True) / 127.0 + 1e-12
    xi_ref[...] = jnp.clip(jnp.round(y2 / row), -127, 127).astype(jnp.int8)
    row_ref[...] = row


def _pick_rows(n: int) -> int:
    for bn in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if n % bn == 0:
            return bn
    return 1


def ln_quant(x, res, ln_params, eps, ascale=None, interpret=False):
    """``h = layer_norm(x + res)`` plus its int8 quantization, fused.

    ``x``/``res``: [..., H]; ``ln_params``: {"scale", "bias"} ([H]);
    ``ascale``: per-layer f32 scalar (static scales, ops/quant.py) or None
    for dynamic per-row.  Returns ``(h, xi, row)`` with ``row`` = the
    dynamic per-row scale ([..., 1] f32) or None in static mode (the
    caller already holds ascale).
    """
    orig_shape = x.shape
    h_dim = orig_shape[-1]
    x2 = x.reshape(-1, h_dim)
    r2 = res.reshape(-1, h_dim)
    n = x2.shape[0]
    bn = _pick_rows(n)
    gamma = ln_params["scale"].astype(jnp.float32)[None, :]
    beta = ln_params["bias"].astype(jnp.float32)[None, :]
    row_spec = pl.BlockSpec((bn, h_dim), lambda i: (i, 0))
    vec_spec = pl.BlockSpec((1, h_dim), lambda i: (0, 0))
    if ascale is not None:
        h2, xi2 = pl.pallas_call(
            functools.partial(_kernel_static, eps=eps),
            out_shape=(jax.ShapeDtypeStruct((n, h_dim), x.dtype),
                       jax.ShapeDtypeStruct((n, h_dim), jnp.int8)),
            grid=(n // bn,),
            in_specs=[row_spec, row_spec, vec_spec, vec_spec,
                      pl.BlockSpec((1, 1), lambda i: (0, 0))],
            out_specs=(row_spec, row_spec),
            interpret=interpret,
        )(x2, r2, gamma, beta,
          jnp.asarray(ascale, jnp.float32).reshape(1, 1))
        return (h2.reshape(orig_shape), xi2.reshape(orig_shape), None)
    h2, xi2, row2 = pl.pallas_call(
        functools.partial(_kernel_dynamic, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((n, h_dim), x.dtype),
                   jax.ShapeDtypeStruct((n, h_dim), jnp.int8),
                   jax.ShapeDtypeStruct((n, 1), jnp.float32)),
        grid=(n // bn,),
        in_specs=[row_spec, row_spec, vec_spec, vec_spec],
        out_specs=(row_spec, row_spec, pl.BlockSpec((bn, 1), lambda i: (i, 0))),
        interpret=interpret,
    )(x2, r2, gamma, beta)
    return (h2.reshape(orig_shape), xi2.reshape(orig_shape),
            row2.reshape(orig_shape[:-1] + (1,)))
