"""Fused joint-embedding kernel vs the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tpu.ops.fused_joint_embed import _ref_forward, fused_joint_embed


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    b, l, h, d = 3, 16, 64, 47
    return (
        jnp.asarray(rng.standard_normal((b, l, h)), jnp.float32),
        jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32),
        jnp.asarray(rng.standard_normal((d, h)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(h) * 0.01, jnp.float32),
        jnp.asarray(1.0 + 0.1 * rng.standard_normal(h), jnp.float32),
        jnp.asarray(0.1 * rng.standard_normal(h), jnp.float32),
    )


def test_fused_matches_reference(inputs):
    out = fused_joint_embed(*inputs, 1e-12, True)  # interpret on CPU
    ref = _ref_forward(*inputs, 1e-12)
    assert out.shape == (3, 32, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_gradients_match_reference(inputs):
    def loss_fused(*a):
        return jnp.sum(fused_joint_embed(*a, 1e-12, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(_ref_forward(*a, 1e-12) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(6)))(*inputs)
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*inputs)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_joint_embed_dispatch_matches(inputs):
    """models.mmbert.joint_embed: fused='always' == fused='never' on CPU."""
    from msa_tpu.configs import MMBertConfig, tiny_bert_config
    from msa_tpu.models.mmbert import init_mmbert_params, joint_embed

    cfg = MMBertConfig(bert=tiny_bert_config(hidden_size=64), visual_dim=47,
                       speech_dim=74)
    params = init_mmbert_params(jax.random.key(0), cfg)
    text, feats = inputs[0], inputs[1]
    a = joint_embed(params, text, feats, "Wv", cfg, fused="always",
                    on_tpu=False)  # on_tpu=False -> interpret-mode kernel
    b = joint_embed(params, text, feats, "Wv", cfg, fused="never")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)
