"""Whole-sequence short_attention kernel vs the XLA path (interpret on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tpu.ops.attention import _xla_attention, multi_head_attention
from msa_tpu.ops.short_attention import short_attention, short_attention_v2


def make(b=3, s=40, h=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h)), jnp.float32)
    mask = np.ones((b, s), np.float32)
    mask[0, s // 2:] = 0
    mask[1, 3:] = 0
    return q, k, v, mask


def xla_ref(q, k, v, mask, n):
    b, s, h = q.shape
    d = h // n
    t = lambda x: x.reshape(b, s, n, d)
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :])
    ctx = _xla_attention(t(q), t(k), t(v), bias, 0.0, None, True)
    return ctx.reshape(b, s, h)


@pytest.mark.parametrize("impl", [short_attention, short_attention_v2])
@pytest.mark.parametrize("s,h,n", [(8, 32, 2), (40, 64, 4), (80, 128, 2),
                                   (40, 64, 8)])
def test_short_matches_xla(impl, s, h, n):
    q, k, v, mask = make(s=s, h=h)
    key_bias = jnp.asarray((1.0 - mask) * -10000.0)
    out = impl(q, k, v, key_bias, None, n, 0.0, True)
    ref = xla_ref(q, k, v, mask, n)
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(out)[m], np.asarray(ref)[m],
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("impl", [short_attention, short_attention_v2])
def test_short_gradients_match_xla(impl):
    q, k, v, mask = make(s=40, h=64)
    key_bias = jnp.asarray((1.0 - mask) * -10000.0)
    w = jnp.asarray(mask)[:, :, None]

    def loss_short(q, k, v):
        return jnp.sum(impl(q, k, v, key_bias, None, 4, 0.0, True) ** 2 * w)

    def loss_ref(q, k, v):
        return jnp.sum(xla_ref(q, k, v, mask, 4) ** 2 * w)

    gs = jax.grad(loss_short, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_dispatch_short_for_small_seq():
    """use_flash='always' at S<=512 routes to the short kernel and matches
    the XLA path ('never')."""
    q, k, v, mask = make(s=24, h=32)
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :])
    a = multi_head_attention(q, k, v, bias, num_heads=4, use_flash="never")
    b = multi_head_attention(q, k, v, bias, num_heads=4, use_flash="always")
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(a)[m], np.asarray(b)[m],
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("impl", [short_attention, short_attention_v2])
def test_fully_masked_row_is_finite(impl):
    """A row whose keys are ALL masked must not produce NaNs (softmax over
    -1e9 everywhere)."""
    q, k, v, mask = make(s=16, h=32)
    mask[2, :] = 0  # entire batch row masked
    key_bias = jnp.asarray((1.0 - mask) * -10000.0)
    out = impl(q, k, v, key_bias, None, 2, 0.0, True)
    assert np.isfinite(np.asarray(out)).all()


def test_v2_matches_v1_bf16_and_odd_batch():
    """v2 (block-diagonal packing) == v1 at a bf16 multi-group shape with a
    batch size that exercises the rows-per-block divisor logic (B=6)."""
    rng = np.random.default_rng(3)
    b, s, h, n = 6, 40, 256, 4
    q = jnp.asarray(rng.standard_normal((b, s, h)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, h)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, s, h)), jnp.bfloat16)
    mask = np.ones((b, s), np.float32)
    mask[0, 10:] = 0
    key_bias = jnp.asarray((1.0 - mask) * -10000.0)
    o1 = short_attention(q, k, v, key_bias, None, n, 0.0, True)
    o2 = short_attention_v2(q, k, v, key_bias, None, n, 0.0, True)
    m = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(o1, np.float32)[m], np.asarray(o2, np.float32)[m],
        atol=2e-2, rtol=2e-2)


def test_packed_matches_unpacked():
    """v2p (packed q|k|v operand) == v2 on outputs AND gradients; the
    packed dqkv thirds must equal v2's dq/dk/dv."""
    from msa_tpu.ops.short_attention import short_attention_v2p

    q, k, v, mask = make(s=40, h=128)
    key_bias = jnp.asarray((1.0 - mask) * -10000.0)
    w = jnp.asarray(mask)[:, :, None]
    n = 2
    qkv = jnp.concatenate([q, k, v], axis=-1)

    out_p = short_attention_v2p(qkv, key_bias, None, n, 0.0, True)
    out_u = short_attention_v2(q, k, v, key_bias, None, n, 0.0, True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_u),
                               atol=1e-6, rtol=1e-6)

    gp = jax.grad(lambda x: jnp.sum(
        short_attention_v2p(x, key_bias, None, n, 0.0, True) ** 2 * w))(qkv)
    gu = jax.grad(lambda a, b, c: jnp.sum(
        short_attention_v2(a, b, c, key_bias, None, n, 0.0, True) ** 2 * w),
        argnums=(0, 1, 2))(q, k, v)
    h = q.shape[-1]
    for i, g in enumerate(gu):
        np.testing.assert_allclose(
            np.asarray(gp[:, :, i * h:(i + 1) * h]), np.asarray(g),
            atol=1e-5, rtol=1e-5)


def test_v3_backward_matches_v2_backward():
    """The delta-from-do.o backward (default) == the explicit p*dp
    reduction backward on the same inputs."""
    from msa_tpu.ops import short_attention as sa

    q, k, v, mask = make(s=24, h=64)
    key_bias = jnp.asarray((1.0 - mask) * -10000.0)
    w = jnp.asarray(mask)[:, :, None]

    def grads():
        return jax.grad(lambda a, b, c: jnp.sum(
            short_attention_v2(a, b, c, key_bias, None, 4, 0.0, True) ** 2
            * w), argnums=(0, 1, 2))(q, k, v)

    old = sa._USE_V3_BWD
    try:
        sa._USE_V3_BWD = True
        g3 = grads()
        sa._USE_V3_BWD = False
        g2 = grads()
    finally:
        sa._USE_V3_BWD = old
    for a, b in zip(g3, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_v2s_matches_v2_outputs_and_grads():
    """v2s (probs-stashing backward) == v2 exactly in f32: the stash path
    reads the same f32 probs the recompute path re-derives."""
    from msa_tpu.ops.short_attention import short_attention_v2s

    q, k, v, mask = make(s=40, h=128)
    key_bias = jnp.asarray((1.0 - mask) * -10000.0)
    w = jnp.asarray(mask)[:, :, None]
    n = 4

    out_s = short_attention_v2s(q, k, v, key_bias, None, n, 0.0, True)
    out_v = short_attention_v2(q, k, v, key_bias, None, n, 0.0, True)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_v))

    gs = jax.grad(lambda a, b, c: jnp.sum(
        short_attention_v2s(a, b, c, key_bias, None, n, 0.0, True) ** 2 * w),
        argnums=(0, 1, 2))(q, k, v)
    gv = jax.grad(lambda a, b, c: jnp.sum(
        short_attention_v2(a, b, c, key_bias, None, n, 0.0, True) ** 2 * w),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_v2s_fully_masked_row_is_finite():
    from msa_tpu.ops.short_attention import short_attention_v2s

    q, k, v, mask = make(s=16, h=32)
    mask[2, :] = 0
    key_bias = jnp.asarray((1.0 - mask) * -10000.0)

    def loss(a, b, c):
        return jnp.sum(short_attention_v2s(a, b, c, key_bias, None, 2,
                                           0.0, True))

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for x in g:
        assert np.isfinite(np.asarray(x)).all()


def test_v2s_no_fwd_rerun_under_probs_policy():
    """Under save_attn+probs the backward must consume the stashed probs
    residual and never re-run the forward kernel: exactly 2 pallas_calls
    in the grad jaxpr (probs-emitting fwd + probs-consuming bwd)."""
    import functools

    from msa_tpu.ops.short_attention import short_attention_v2s

    q, k, v, mask = make(s=40, h=128)
    key_bias = jnp.asarray((1.0 - mask) * -10000.0)
    policy = jax.checkpoint_policies.save_only_these_names(
        "attn_io", "attn_ctx", "attn_probs")

    @functools.partial(jax.checkpoint, policy=policy)
    def block(q, k, v):
        return short_attention_v2s(q, k, v, key_bias, None, 4, 0.0, True)

    def loss(q, k, v):
        return jnp.sum(block(q, k, v) ** 2)

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    n_calls = str(jaxpr).count("pallas_call")
    assert n_calls == 2, \
        f"expected 2 pallas_calls (no rematted fwd re-run), got {n_calls}"
