"""Fused AdamW update as one Pallas pass per tensor.

The AdamW update is bandwidth-bound (reads p/g/mu/nu, writes p/mu/nu —
~24 B/param with bf16 mu).  XLA's fusion reaches ~73% of HBM bandwidth on
the big stacked kernels (BENCH.md round-2 profile); this kernel streams
1-D tiles at full rate and also supports a reduced-precision ``nu``.

Semantics match ``optax.adamw`` / torch AdamW exactly (decoupled weight
decay, bias correction, eps outside the sqrt):

    mu' = b1 mu + (1-b1) g        nu' = b2 nu + (1-b2) g^2
    p'  = p - lr [ (mu'/(1-b1^t)) / (sqrt(nu'/(1-b2^t)) + eps) + wd p ]

Exactness vs optax is pinned in tests/test_fused_adamw.py.  The jnp
fallback (CPU / interpret) is the same expression.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 1024          # flattened tile width
_ROWS_PER_STEP = 256   # 256x1024 f32 = 1 MB per operand per grid step


def _adamw_math(p, g, mu, nu, lr, wd, c1, c2, b1, b2, eps):
    """Shared update expression (f32 in, f32 out for p; moments cast by
    the caller).  c1 = 1-b1^t, c2 = 1-b2^t."""
    mu_new = b1 * mu + (1.0 - b1) * g
    nu_new = b2 * nu + (1.0 - b2) * g * g
    mu_hat = mu_new / c1
    nu_hat = nu_new / c2
    upd = mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * p
    return p - lr * upd, mu_new, nu_new


def _kernel(scalars_ref, p_ref, g_ref, mu_ref, nu_ref,
            p_out, mu_out, nu_out, *, b1: float, b2: float, eps: float):
    lr, wd, c1, c2 = (scalars_ref[0], scalars_ref[1],
                      scalars_ref[2], scalars_ref[3])
    p = p_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    mu = mu_ref[...].astype(jnp.float32)
    nu = nu_ref[...].astype(jnp.float32)
    p_new, mu_new, nu_new = _adamw_math(p, g, mu, nu, lr, wd, c1, c2,
                                        b1, b2, eps)
    p_out[...] = p_new.astype(p_out.dtype)
    mu_out[...] = mu_new.astype(mu_out.dtype)
    nu_out[...] = nu_new.astype(nu_out.dtype)


def fused_adamw_leaf(p, g, mu, nu, lr, wd, c1, c2, *,
                     b1=0.9, b2=0.999, eps=1e-6, use_pallas=True,
                     interpret=False):
    """One tensor's AdamW update.  ``lr/wd/c1/c2``: f32 scalars (traced).
    Returns (p_new, mu_new, nu_new) in the input dtypes."""
    if not use_pallas:
        p_new, mu_new, nu_new = _adamw_math(
            p.astype(jnp.float32), g.astype(jnp.float32),
            mu.astype(jnp.float32), nu.astype(jnp.float32),
            lr, wd, c1, c2, b1, b2, eps)
        return (p_new.astype(p.dtype), mu_new.astype(mu.dtype),
                nu_new.astype(nu.dtype))

    from jax.experimental.pallas import tpu as pltpu

    shape, n = p.shape, p.size
    cols = _LANES
    rows = max(1, -(-n // cols))
    pad = rows * cols - n
    # pick a row-block that divides the padded row count
    rblk = min(_ROWS_PER_STEP, rows)
    rows_padded = -(-rows // rblk) * rblk
    pad = rows_padded * cols - n

    def flat(x, dtype):
        y = x.reshape(-1).astype(dtype)
        if pad:
            y = jnp.pad(y, (0, pad))
        return y.reshape(rows_padded, cols)

    scalars = jnp.stack([lr.astype(jnp.float32), wd.astype(jnp.float32),
                         c1.astype(jnp.float32), c2.astype(jnp.float32)])
    blk = lambda: pl.BlockSpec((rblk, cols), lambda i: (i, 0))
    p_new, mu_new, nu_new = pl.pallas_call(
        functools.partial(_kernel, b1=b1, b2=b2, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((rows_padded, cols), p.dtype),
                   jax.ShapeDtypeStruct((rows_padded, cols), mu.dtype),
                   jax.ShapeDtypeStruct((rows_padded, cols), nu.dtype)),
        grid=(rows_padded // rblk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk(), blk(), blk(), blk()],
        out_specs=(blk(), blk(), blk()),
        interpret=interpret,
    )(scalars, flat(p, p.dtype), flat(g, p.dtype), flat(mu, mu.dtype),
      flat(nu, nu.dtype))

    unflat = lambda y: y.reshape(-1)[:n].reshape(shape)
    return unflat(p_new), unflat(mu_new), unflat(nu_new)
