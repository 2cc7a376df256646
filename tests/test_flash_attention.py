"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tpu.ops.attention import (
    _flash_attention, _xla_attention, multi_head_attention,
)


def make_inputs(b=2, n=4, s=40, d=32, seed=0, masked=True):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, n, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, s, d)), jnp.float32)
    mask = np.ones((b, s), np.float32)
    if masked:
        mask[0, s // 2:] = 0
        mask[1, 3:] = 0
    key_bias = jnp.asarray((1.0 - mask) * -1e9)
    return q, k, v, key_bias, mask


def ref_attention(q, k, v, key_bias):
    bias4 = key_bias[:, None, None, :]
    # [B,N,S,D] -> [B,S,N,D] for the xla path
    ctx = _xla_attention(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                         v.transpose(0, 2, 1, 3), bias4, 0.0, None, True)
    return ctx.transpose(0, 2, 1, 3)


@pytest.mark.parametrize("s", [8, 40, 80, 128, 200])
def test_flash_matches_xla(s):
    q, k, v, key_bias, mask = make_inputs(s=s)
    ref = ref_attention(q, k, v, key_bias)
    out = _flash_attention(q, k, v, key_bias, None, 128, 128, 0.0, True)
    m = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 2, 1, 3)[m],
        np.asarray(ref).transpose(0, 2, 1, 3)[m],
        atol=1e-5, rtol=1e-5)


def test_flash_gradients_match_xla():
    q, k, v, key_bias, mask = make_inputs(s=40)

    def loss_flash(q, k, v):
        out = _flash_attention(q, k, v, key_bias, None, 128, 128, 0.0, True)
        return jnp.sum(out ** 2 * mask[:, None, :, None])

    def loss_ref(q, k, v):
        out = ref_attention(q, k, v, key_bias)
        return jnp.sum(out ** 2 * mask[:, None, :, None])

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_dispatch_flash_always_matches_never():
    rng = np.random.default_rng(1)
    b, s, h, n = 2, 24, 32, 4
    q = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    mask = np.ones((b, s), np.float32)
    mask[1, 10:] = 0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :])
    a = multi_head_attention(q, k, v, bias, num_heads=n, use_flash="never")
    bout = multi_head_attention(q, k, v, bias, num_heads=n, use_flash="always")
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(a)[m], np.asarray(bout)[m],
                               atol=1e-5, rtol=1e-5)
