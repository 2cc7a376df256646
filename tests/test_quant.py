"""int8 serving quantization: op accuracy + Predictor agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tpu.configs import (
    DataConfig, ExperimentConfig, MMBertConfig, TrainConfig, tiny_bert_config,
)
from msa_tpu.data.featurize import synthetic_split
from msa_tpu.inference import Predictor
from msa_tpu.models.mmbert import init_mmbert_params
from msa_tpu.ops.quant import int8_dense, quantize_bert_params, quantize_weight


def test_quantized_dense_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 96)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((96,)), jnp.float32)
    qk, qs = quantize_weight(w)
    assert qk.dtype == jnp.int8 and qs.shape == (96,)
    out = int8_dense(x, qk, qs, b)
    ref = x @ w + b
    # symmetric 8-bit weight+activation: ~1% of the output scale
    scale = float(jnp.std(ref))
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 0.05 * scale * np.sqrt(128 / 64)  # loose analytic bound
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02


def test_quantize_weight_stacked_per_layer_channel():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((3, 16, 8)), jnp.float32)
    w = w.at[1].multiply(100.0)  # one layer much larger: scales must differ
    qk, qs = quantize_weight(w)
    assert qk.shape == (3, 16, 8) and qs.shape == (3, 8)
    deq = qk.astype(jnp.float32) * qs[:, None, :]
    np.testing.assert_allclose(np.asarray(deq), np.asarray(w),
                               atol=float(jnp.max(qs)), rtol=0.02)


@pytest.fixture(scope="module")
def exp():
    bert = tiny_bert_config(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            vocab_size=120)
    return ExperimentConfig(
        model_name="tiny",
        model=MMBertConfig(bert=bert, visual_dim=5, speech_dim=7, num_labels=1),
        data=DataConfig(dataset="mosi", max_seq_length=12),
        train=TrainConfig(compute_dtype="float32", data_parallel=1,
                          use_flash_attention="never"),
    )


def test_predictor_int8_agrees(exp):
    params = init_mmbert_params(jax.random.key(0), exp.model)
    split = synthetic_split(12, 12, 5, 7, vocab_size=120, seed=0)
    full = Predictor(exp, params, batch_size=4).predict_split(split)
    q = Predictor(exp, params, batch_size=4,
                  quantize="int8").predict_split(split)
    assert q.shape == full.shape
    # tanh-range sentiment: quantization noise stays small and ranking-safe
    np.testing.assert_allclose(q, full, atol=0.08)
    assert np.corrcoef(q, full)[0, 1] > 0.99


def test_int8_dense_static_scale_accuracy():
    """Static per-tensor activation scale ~ dynamic per-row accuracy when
    calibrated at the true absmax."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 96)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((96,)), jnp.float32)
    qk, qs = quantize_weight(w)
    ascale = jnp.max(jnp.abs(x)) / 127.0 + 1e-12
    out = int8_dense(x, qk, qs, b, ascale)
    ref = x @ w + b
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.04  # per-tensor scale is coarser than per-row; still tight
    # saturation: inputs beyond the calibrated absmax clip, never blow up
    out_hot = int8_dense(x * 10.0, qk, qs, b, ascale)
    assert bool(jnp.all(jnp.isfinite(out_hot)))


def test_act_stats_collection_and_scales(exp):
    """mmbert_forward(collect_act_stats=True) emits per-layer absmax that
    quantize_bert_params turns into [L] static scales."""
    from msa_tpu.models.mmbert import mmbert_forward
    from msa_tpu.ops.quant import act_scales_from_stats

    params = init_mmbert_params(jax.random.key(0), exp.model)
    split = synthetic_split(4, 12, 5, 7, vocab_size=120, seed=1)
    ids = jnp.asarray(split.input_ids[:4])
    mask = jnp.asarray(split.attention_mask[:4])
    out = mmbert_forward(params, ids, mask, ids, ids,
                         jnp.asarray(split.visual[:4]),
                         jnp.asarray(split.speech[:4]), exp.model,
                         deterministic=True, mlm_scores=False,
                         collect_act_stats=True)
    stats = out["act_stats"]
    L = exp.model.bert.num_hidden_layers
    assert set(stats) == {"attn_in", "ctx", "mlp_in", "ffn_act"}
    for v in stats.values():
        assert v.shape == (L,) and bool(jnp.all(v > 0))
    scales = act_scales_from_stats(stats)
    assert set(scales) == {"q", "k", "v", "o", "wi", "wo"}
    qp = quantize_bert_params(params, act_stats=stats)
    for proj in ("q", "k", "v", "o", "wi", "wo"):
        assert qp["bert"]["layers"][proj]["ascale"].shape == (L,)


def test_predictor_int8_static_agrees(exp):
    params = init_mmbert_params(jax.random.key(0), exp.model)
    split = synthetic_split(12, 12, 5, 7, vocab_size=120, seed=0)
    full = Predictor(exp, params, batch_size=4).predict_split(split)
    q = Predictor(exp, params, batch_size=4, quantize="int8_static",
                  calibration=split).predict_split(split)
    assert q.shape == full.shape
    np.testing.assert_allclose(q, full, atol=0.08)
    assert np.corrcoef(q, full)[0, 1] > 0.99


def test_fused_qkv_matches_split(exp):
    """fuse_qkv=True (one [H,3H] int8 matmul) == split q/k/v numerically.

    int8 x int8 accumulates exactly in int32 and the fused entry reuses the
    same per-column scales, so outputs agree to f32 roundoff."""
    from msa_tpu.models.mmbert import mmbert_forward

    params = init_mmbert_params(jax.random.key(0), exp.model)
    stats = {k: jnp.full((exp.model.bert.num_hidden_layers,), 3.0,
                         jnp.float32)
             for k in ("attn_in", "ctx", "mlp_in", "ffn_act")}
    split_p = quantize_bert_params(params, act_stats=stats)
    fused_p = quantize_bert_params(params, act_stats=stats, fuse_qkv=True)
    layers = fused_p["bert"]["layers"]
    assert "qkv" in layers and "q" not in layers
    H = exp.model.bert.hidden_size
    assert layers["qkv"]["qkernel"].shape[-1] == 3 * H

    data = synthetic_split(4, 12, 5, 7, vocab_size=120, seed=5)
    ids = jnp.asarray(data.input_ids[:4])
    mask = jnp.asarray(data.attention_mask[:4])
    vis, spc = jnp.asarray(data.visual[:4]), jnp.asarray(data.speech[:4])
    outs = [mmbert_forward(p, ids, mask, ids, ids, vis, spc, exp.model,
                           deterministic=True, mlm_scores=False)["logits"]
            for p in (split_p, fused_p)]
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                               atol=1e-5, rtol=1e-5)

    # both dynamic (no ascale) and static entries must ride the fused path
    dyn = quantize_bert_params(params, fuse_qkv=True)
    assert "ascale" not in dyn["bert"]["layers"]["qkv"]

    # and the fused tree must remain shardable (replicated specs)
    from msa_tpu.parallel.sharding import param_specs
    from jax.sharding import PartitionSpec as P
    specs = param_specs(fused_p)["bert"]["layers"]["qkv"]
    assert specs["ascale"] == P()


def test_predictor_fused_qkv_opt_in(exp):
    """Predictor(fuse_qkv=True) rides the fused entry and agrees with the
    split path; a model-axis mesh rejects it (wrong sharding)."""
    from msa_tpu.parallel.mesh import make_mesh

    params = init_mmbert_params(jax.random.key(0), exp.model)
    split = synthetic_split(8, 12, 5, 7, vocab_size=120, seed=4)
    base = Predictor(exp, params, batch_size=4, quantize="int8_static",
                     calibration=split).predict_split(split)
    fused = Predictor(exp, params, batch_size=4, quantize="int8_static",
                      calibration=split, fuse_qkv=True).predict_split(split)
    np.testing.assert_allclose(fused, base, atol=1e-5)
    with pytest.raises(ValueError):
        Predictor(exp, params, batch_size=8, mesh=make_mesh(2, 4),
                  quantize="int8", fuse_qkv=True)


def test_ln_quant_kernel_matches_composition():
    """ops/ln_quant.py (fused residual+LN+int8 quantize) == the XLA
    composition it replaces, in interpret mode, static AND dynamic."""
    from msa_tpu.models.bert import layer_norm
    from msa_tpu.ops.ln_quant import ln_quant
    from msa_tpu.ops.quant import quantize_act

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 8, 128)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((2, 8, 128)), jnp.float32)
    p = {"scale": jnp.asarray(1.0 + 0.1 * rng.standard_normal(128),
                              jnp.float32),
         "bias": jnp.asarray(0.1 * rng.standard_normal(128), jnp.float32)}
    eps = 1e-12
    href = layer_norm(x + r, p, eps)

    asc = jnp.float32(0.05)
    xi_ref, _ = quantize_act(href, asc)
    h, xi, row = ln_quant(x, r, p, eps, ascale=asc, interpret=True)
    assert row is None
    np.testing.assert_allclose(np.asarray(h), np.asarray(href),
                               rtol=1e-6, atol=1e-6)
    # boundary ties may flip on 1-ulp LN differences; demand near-total
    # agreement and never more than one quantization level apart
    mism = float(np.mean(np.asarray(xi) != np.asarray(xi_ref)))
    assert mism < 0.005, mism
    assert int(np.max(np.abs(np.asarray(xi, np.int32)
                             - np.asarray(xi_ref, np.int32)))) <= 1

    xi_ref2, row_ref = quantize_act(href, None)
    h2, xi2, row2 = ln_quant(x, r, p, eps, ascale=None, interpret=True)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(href),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(row2), np.asarray(row_ref),
                               rtol=1e-5)
    mism2 = float(np.mean(np.asarray(xi2) != np.asarray(xi_ref2)))
    assert mism2 < 0.005, mism2


def test_ln_quant_encoder_wiring_matches_composition(exp):
    """The fused attn_in+mlp_in LN+quantize encoder path (int8_static,
    forced on CPU in interpret mode via bert._LN_QUANT_INTERPRET) agrees
    with the XLA composition it replaces.

    Exercises the scan-carry wiring the kernel test above cannot: the
    shifted [L] attn_in scale array, the int8 carry across iterations,
    the pre-scan layer-0 quantize, and the q/k/v int8_matmul_pre dequant
    against THIS layer's scale."""
    import msa_tpu.models.bert as bert_mod
    from msa_tpu.models.mmbert import mmbert_forward

    params = init_mmbert_params(jax.random.key(0), exp.model)
    split = synthetic_split(4, 12, 5, 7, vocab_size=120, seed=7)
    ids = jnp.asarray(split.input_ids[:4])
    mask = jnp.asarray(split.attention_mask[:4])
    vis, spc = jnp.asarray(split.visual[:4]), jnp.asarray(split.speech[:4])
    stats = mmbert_forward(params, ids, mask, ids, ids, vis, spc, exp.model,
                           deterministic=True, mlm_scores=False,
                           collect_act_stats=True)["act_stats"]
    qp = quantize_bert_params(params, act_stats=stats)

    def fwd():
        return np.asarray(mmbert_forward(
            qp, ids, mask, ids, ids, vis, spc, exp.model,
            deterministic=True, mlm_scores=False)["logits"])

    base = fwd()  # XLA composition (gate off on CPU)
    assert bert_mod._LN_QUANT_INTERPRET is False
    try:
        bert_mod._LN_QUANT_INTERPRET = True
        fused = fwd()
    finally:
        bert_mod._LN_QUANT_INTERPRET = False
    # both paths quantize the same rounded stream; differences are at most
    # quantization-boundary ties flipped by 1-ulp LN differences
    np.testing.assert_allclose(fused.ravel(), base.ravel(), atol=0.02)


def test_ln_quant_encoder_unroll0_matches_scan(exp, monkeypatch):
    """The unroll=0 (python-loop) variant of the fused attn_in path runs
    the SAME fused kernels as the scan branch and agrees with it
    (round-4 ADVICE item 3: the branch was previously untested)."""
    import msa_tpu.models.bert as bert_mod
    import msa_tpu.ops.ln_quant as lnq_mod
    from msa_tpu.models.bert import bert_encoder, extended_attention_mask
    from msa_tpu.models.mmbert import mmbert_forward

    params = init_mmbert_params(jax.random.key(0), exp.model)
    split = synthetic_split(4, 12, 5, 7, vocab_size=120, seed=9)
    ids = jnp.asarray(split.input_ids[:4])
    mask = jnp.asarray(split.attention_mask[:4])
    vis, spc = jnp.asarray(split.visual[:4]), jnp.asarray(split.speech[:4])
    stats = mmbert_forward(params, ids, mask, ids, ids, vis, spc, exp.model,
                           deterministic=True, mlm_scores=False,
                           collect_act_stats=True)["act_stats"]
    qp = quantize_bert_params(params, act_stats=stats)

    calls = {"n": 0}
    real_ln_quant = lnq_mod.ln_quant

    def counting_ln_quant(*a, **kw):
        calls["n"] += 1
        return real_ln_quant(*a, **kw)

    monkeypatch.setattr(lnq_mod, "ln_quant", counting_ln_quant)

    rng = np.random.default_rng(10)
    h = exp.model.bert.hidden_size
    hidden = jnp.asarray(rng.standard_normal((2, 8, h)), jnp.float32)
    bias = extended_attention_mask(jnp.ones((2, 8), jnp.int32), jnp.float32)

    monkeypatch.setattr(bert_mod, "_LN_QUANT_INTERPRET", True)
    out_scan = bert_encoder(qp["bert"], hidden, bias, exp.model.bert,
                            deterministic=True, unroll=1)
    scan_calls = calls["n"]
    assert scan_calls > 0  # the fused path actually fired
    out_loop = bert_encoder(qp["bert"], hidden, bias, exp.model.bert,
                            deterministic=True, unroll=0)
    # the python loop traces the two fused sites once PER layer (the scan
    # traces its body once regardless of depth)
    assert calls["n"] - scan_calls == 2 * exp.model.bert.num_hidden_layers
    np.testing.assert_allclose(np.asarray(out_loop), np.asarray(out_scan),
                               rtol=1e-5, atol=1e-5)


def test_predictor_int8_static_requires_calibration(exp):
    params = init_mmbert_params(jax.random.key(0), exp.model)
    with pytest.raises(ValueError):
        Predictor(exp, params, quantize="int8_static")


def test_predictor_int8_on_meshes(exp):
    """int8 serving under dp and dp x tp meshes == single-device int8."""
    from msa_tpu.parallel.mesh import make_mesh

    params = init_mmbert_params(jax.random.key(0), exp.model)
    split = synthetic_split(8, 12, 5, 7, vocab_size=120, seed=3)
    single = Predictor(exp, params, batch_size=8, mesh=make_mesh(1, 1),
                       quantize="int8").predict_split(split)
    for dp, mp in [(8, 1), (2, 4)]:
        sharded = Predictor(exp, params, batch_size=8,
                            mesh=make_mesh(dp, mp),
                            quantize="int8").predict_split(split)
        np.testing.assert_allclose(single, sharded, atol=1e-5,
                                   err_msg=f"dp={dp} mp={mp}")


def test_quantize_rejects_unknown_mode(exp):
    params = init_mmbert_params(jax.random.key(0), exp.model)
    with pytest.raises(ValueError):
        Predictor(exp, params, quantize="fp4")


def test_quantized_params_shardable(exp):
    """param_shardings must produce consistent specs for int8 leaves."""
    from msa_tpu.parallel.mesh import make_mesh
    from msa_tpu.parallel.sharding import param_specs

    params = init_mmbert_params(jax.random.key(0), exp.model)
    stats = {k: jnp.ones((exp.model.bert.num_hidden_layers,), jnp.float32)
             for k in ("attn_in", "ctx", "mlp_in", "ffn_act")}
    params = quantize_bert_params(params, act_stats=stats)
    specs = param_specs(params)
    layers = specs["bert"]["layers"]
    from jax.sharding import PartitionSpec as P
    assert layers["q"]["qkernel"] == P(None, None, "model")
    assert layers["q"]["qscale"] == P(None, "model")
    assert layers["o"]["qkernel"] == P(None, "model", None)
    assert layers["o"]["qscale"] == P()
    # static activation scales are per-layer scalars -- never sharded
    for proj in ("q", "k", "v", "o", "wi", "wo"):
        assert layers[proj]["ascale"] == P()
