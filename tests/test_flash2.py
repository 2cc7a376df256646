"""Natural-layout lane-packed flash kernel (ops/flash2.py) vs the XLA
reference path, in Pallas interpret mode on CPU.

Covers hpg>1 lane packing (d < 128), the hpg==1 fallback (d == 128),
non-128-multiple sequence lengths (padding), key-padding masks, and full
gradients through the custom vjp.  In-kernel dropout needs the TPU PRNG
and is validated on hardware (benchmarks/validate_flash2_dropout.py).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tpu.ops.attention import _xla_attention
from msa_tpu.ops.flash2 import flash_attention2


def make_inputs(b=2, s=40, h=128, seed=0, masked=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    mask = np.ones((b, s), np.float32)
    if masked:
        mask[0, s // 2:] = 0
        mask[1, 3:] = 0
    key_bias = jnp.asarray((1.0 - mask) * -1e9)
    return q, k, v, key_bias, mask


def ref_attention(q, k, v, key_bias, num_heads):
    b, s, h = q.shape
    d = h // num_heads
    split = lambda x: x.reshape(b, s, num_heads, d)
    ctx = _xla_attention(split(q), split(k), split(v),
                         key_bias[:, None, None, :], 0.0, None, True)
    return ctx.reshape(b, s, h)


@pytest.mark.parametrize("s,h,n", [
    (8, 128, 4),     # hpg=4 (d=32), single padded block
    (40, 128, 2),    # hpg=2 (d=64)
    (200, 128, 2),   # padding across block boundary
    (256, 256, 4),   # hpg=2 (d=64), two kv blocks at bk=128? (s tiles 128)
    (136, 128, 1),   # hpg=1 fallback (d=128)
])
def test_flash2_matches_xla(s, h, n):
    q, k, v, key_bias, mask = make_inputs(s=s, h=h)
    ref = ref_attention(q, k, v, key_bias, n)
    out = flash_attention2(q, k, v, key_bias, None, n, 0.0, True)
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(out)[m], np.asarray(ref)[m],
                               atol=1e-5, rtol=1e-5)


def test_flash2_gradients_match_xla():
    n = 2
    q, k, v, key_bias, mask = make_inputs(s=40, h=128)

    def loss_flash(q, k, v):
        out = flash_attention2(q, k, v, key_bias, None, n, 0.0, True)
        return jnp.sum(out ** 2 * mask[:, :, None])

    def loss_ref(q, k, v):
        out = ref_attention(q, k, v, key_bias, n)
        return jnp.sum(out ** 2 * mask[:, :, None])

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_flash2_no_fwd_rerun_under_save_attn():
    """Under the save_attn/save_ctx remat policies the backward must consume
    the stashed ctx+lse residuals and NEVER re-run the forward kernel.
    Counts pallas_call equations in the grad jaxpr: 1 fwd + the backward
    (1 fused kernel, or dq + dkv = 2 split).  (One more = the rematted
    forward re-run; that cost 97 ms/step at the frame-level shape when the
    residuals weren't the policy-named vars.)"""
    n = 2
    q, k, v, key_bias, mask = make_inputs(s=40, h=128)
    policy = jax.checkpoint_policies.save_only_these_names(
        "attn_io", "attn_ctx", "attn_lse")

    @functools.partial(jax.checkpoint, policy=policy)
    def block(q, k, v):
        return flash_attention2(q, k, v, key_bias, None, n, 0.0, True)

    def loss(q, k, v):
        return jnp.sum(block(q, k, v) ** 2)

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    n_calls = str(jaxpr).count("pallas_call")
    from msa_tpu.ops import flash2
    want = 2 if flash2._FUSED_BWD else 3
    assert n_calls == want, \
        f"expected {want} pallas_calls (no rematted fwd re-run), got {n_calls}"


@pytest.mark.parametrize("s,h,n,bq,bk", [
    (40, 128, 1, 256, 1024),    # hpg=1 (d=128) through the fused backward
    (300, 128, 2, 128, 128),    # multi q-block AND multi kv-block tiles
])
def test_flash2_gradients_blocked(s, h, n, bq, bk):
    """Fused-backward grads across block decompositions: the per-tile
    accumulation into dq_acc / dkb / dvb and the per-block lse/delta reads
    must agree with XLA whatever the (bq, bk) split."""
    from msa_tpu.ops import flash2
    q, k, v, key_bias, mask = make_inputs(s=s, h=h, seed=7)

    def loss_flash(q, k, v):
        out = flash_attention2(q, k, v, key_bias, None, n, 0.0, True)
        return jnp.sum(out ** 2 * mask[:, :, None])

    def loss_ref(q, k, v):
        out = ref_attention(q, k, v, key_bias, n)
        return jnp.sum(out ** 2 * mask[:, :, None])

    old = (flash2._BQ, flash2._BK, flash2._BWD_BQ, flash2._BWD_BK)
    flash2._BQ = flash2._BWD_BQ = bq
    flash2._BK = flash2._BWD_BK = bk
    try:
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    finally:
        flash2._BQ, flash2._BK, flash2._BWD_BQ, flash2._BWD_BK = old
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_flash2_split_bwd_matches_fused():
    """The split dq/dkv backward (the long-S fallback when the fused
    program's bands exceed scoped VMEM) must produce the same grads."""
    from msa_tpu.ops import flash2
    n = 2
    q, k, v, key_bias, mask = make_inputs(s=40, h=128, seed=5)

    def loss(q, k, v):
        out = flash_attention2(q, k, v, key_bias, None, n, 0.0, True)
        return jnp.sum(out ** 2 * mask[:, :, None])

    g_fused = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    old = flash2._FUSED_BWD
    flash2._FUSED_BWD = False
    try:
        g_split = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        flash2._FUSED_BWD = old
    for a, b in zip(g_fused, g_split):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_flash2_gradients_padded_length():
    # S=200 exercises padded q rows / masked kv columns in BOTH backward
    # kernels (zero-contribution rows must stay exactly zero-contribution).
    n = 4
    q, k, v, key_bias, mask = make_inputs(s=200, h=128, seed=3)

    def loss_flash(q, k, v):
        out = flash_attention2(q, k, v, key_bias, None, n, 0.0, True)
        return jnp.sum(out ** 2 * mask[:, :, None])

    def loss_ref(q, k, v):
        out = ref_attention(q, k, v, key_bias, n)
        return jnp.sum(out ** 2 * mask[:, :, None])

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)
