"""int8 weight+activation quantization for the serving path.

v5e's MXU runs int8 x int8 -> int32 at up to 394 TOPS vs 197 TF/s bf16;
measured on this chip: 238 TOP/s on a requantizing FFN-shaped chain vs
174 TF/s bf16 (1.37x, BENCH.md).  The scheme is the standard
production-serving one:

  * weights: symmetric per-output-channel int8 (absmax / 127), quantized
    ONCE at load time;
  * activations: symmetric per-row (per-token) dynamic int8, quantized
    on the fly in front of each quantized matmul;
  * accumulation in int32, dequantized as int32 * s_row * s_col, bias
    added in f32, output cast back to the compute dtype.

Only the encoder's six big projections (q/k/v/o/wi/wo) are quantized --
embeddings, LayerNorm, attention math, pooler and heads stay in the
regular bf16/f32 policy.  Training is NOT quantized (this is an
inference-only path, Predictor(quantize='int8')).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(kernel: jnp.ndarray, eps: float = 1e-12):
    """[..., K, N] f32 kernel -> (int8 kernel, f32 per-output-channel scale).

    The scale has the kernel's shape minus the contraction axis (-2):
    [..., N]; stacked layer kernels [L, K, N] get per-(layer, channel)
    scales [L, N].
    """
    absmax = jnp.max(jnp.abs(kernel), axis=-2)
    scale = (absmax / 127.0 + eps).astype(jnp.float32)
    q = jnp.clip(jnp.round(kernel / scale[..., None, :]), -127, 127)
    return q.astype(jnp.int8), scale


def int8_dense(x: jnp.ndarray, qkernel: jnp.ndarray, qscale: jnp.ndarray,
               bias: jnp.ndarray, ascale: jnp.ndarray | None = None
               ) -> jnp.ndarray:
    """int8 MXU matmul with dynamic OR static activation quantization.

    ``x``: [..., K] (bf16/f32); ``qkernel``: [K, N] int8; ``qscale``: [N];
    ``bias``: [N].  Returns x.dtype [..., N].

    ``ascale=None`` (dynamic): symmetric per-row (per-token) scales from an
    absmax reduce over x -- robust, but the reduce is a separate VPU pass
    over the activations that XLA cannot fuse into the producer (measured:
    requant work caps the int8 chain at 238 of 394 TOP/s, BENCH.md).

    ``ascale`` a scalar (static, calibrated offline): the quantize becomes a
    purely elementwise round/clip that XLA fuses into the producing op's
    epilogue (LN / gelu), and the dequant scale ``ascale * qscale`` is a
    constant folded into the matmul's int32->f32 convert.  Activations
    beyond the calibrated absmax saturate at +-127 (use a margin or enough
    calibration data; accuracy-gated in tests / Predictor).
    """
    xi, row = quantize_act(x, ascale)
    acc = jax.lax.dot_general(
        xi, qkernel, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (row * qscale.astype(jnp.float32))
    return (out + bias.astype(jnp.float32)).astype(x.dtype)


def int8_matmul_pre(xi: jnp.ndarray, row, qkernel: jnp.ndarray,
                    qscale: jnp.ndarray, bias: jnp.ndarray, out_dtype):
    """``int8_dense`` for a PRE-quantized activation.

    ``xi``: int8 [..., K] (e.g. from ops/ln_quant.py's fused kernel);
    ``row``: the matching scale -- a scalar (static ascale) or [..., 1]
    f32 (dynamic per-row).  Same dequant epilogue as ``int8_dense``.
    """
    acc = jax.lax.dot_general(
        xi, qkernel, (((xi.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (
        jnp.asarray(row, jnp.float32) * qscale.astype(jnp.float32))
    return (out + bias.astype(jnp.float32)).astype(out_dtype)


def quantize_act(x: jnp.ndarray, ascale: jnp.ndarray | None = None):
    """[..., K] activations -> (int8 [..., K], f32 row scale).

    Factored out of ``int8_dense`` so consumers feeding SEVERAL quantized
    matmuls from one activation tensor (q/k/v read the same post-LN stream
    with the same static scale, ops/quant.py::_PROJ_STAT) quantize ONCE:
    the standalone round/clip/convert pass over the residual stream is a
    real HBM pass when the producer has other consumers (the residual add),
    so sharing it matters (BENCH.md round-4 int8 Amdahl decomposition).
    """
    x32 = x.astype(jnp.float32)
    if ascale is None:
        row = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0 + 1e-12
    else:
        row = ascale.astype(jnp.float32)  # scalar: no reduction pass
    xi = jnp.clip(jnp.round(x32 / row), -127, 127).astype(jnp.int8)
    return xi, row


# encoder projections worth the int8 path (the [*, H] x [H, *] heavies)
_QUANT_LAYER_KEYS = ("q", "k", "v", "o", "wi", "wo")

# Which calibrated activation statistic feeds each projection's static
# scale: q/k/v read the post-LN residual stream, o reads the attention
# context, wi the post-attention-LN stream, wo the gelu output.  Keys match
# the per-layer stats bert_encoder(collect_act_stats=True) emits.
_PROJ_STAT = {"q": "attn_in", "k": "attn_in", "v": "attn_in",
              "o": "ctx", "wi": "mlp_in", "wo": "ffn_act"}


def act_scales_from_stats(act_stats, margin: float = 1.0):
    """Per-layer absmax stats -> per-(layer, projection) static scales.

    ``act_stats``: {"attn_in"|"ctx"|"mlp_in"|"ffn_act": [L] f32 absmax}
    (elementwise max over calibration batches).  Returns {proj: [L] f32
    scale}; ``margin > 1`` leaves saturation headroom beyond the calibrated
    absmax.
    """
    return {
        proj: (jnp.asarray(act_stats[stat], jnp.float32) * margin / 127.0
               + 1e-12)
        for proj, stat in _PROJ_STAT.items()
    }


def quantize_bert_params(params, act_stats=None, margin: float = 1.0,
                         fuse_qkv: bool = False):
    """Return a params pytree whose encoder projection kernels are int8.

    Each quantized dense becomes {"qkernel", "qscale", "bias"}; everything
    else (embeddings, LN, pooler, heads, joint/fusion/CPC) is untouched.
    ``models.bert.dense`` dispatches on the "qkernel" key.

    ``act_stats`` (from a calibration forward with
    ``mmbert_forward(collect_act_stats=True)``) additionally attaches a
    static per-(layer, projection) activation scale "ascale" [L], switching
    ``int8_dense`` from dynamic per-token to static quantization.

    ``fuse_qkv=True`` replaces the q/k/v entries with ONE "qkv" entry whose
    kernel is the [L, H, 3H] concatenation (q|k|v on the output axis, the
    same packing the training-side save_pack policy uses): the encoder then
    runs one int8 matmul + one dequant epilogue instead of three.  Legal
    because q/k/v share both the input tensor and the static scale
    (_PROJ_STAT maps all three to "attn_in").  Single-chip serving only:
    the concatenated output axis does NOT shard head-parallel under tensor
    parallelism (contiguous model-axis chunks of 3H mix q with k), so the
    caller must keep fuse_qkv=False when the mesh has a model axis > 1
    (inference.Predictor does this).
    """
    ascales = (None if act_stats is None
               else act_scales_from_stats(act_stats, margin))
    params = dict(params)
    bert = dict(params["bert"])
    layers = dict(bert["layers"])
    for key in _QUANT_LAYER_KEYS:
        p = layers[key]
        qk, qs = quantize_weight(jnp.asarray(p["kernel"], jnp.float32))
        entry = {"qkernel": qk, "qscale": qs, "bias": p["bias"]}
        if ascales is not None:
            entry["ascale"] = ascales[key]
        layers[key] = entry
    if fuse_qkv:
        q, k, v = layers.pop("q"), layers.pop("k"), layers.pop("v")
        fused = {
            "qkernel": jnp.concatenate(
                [q["qkernel"], k["qkernel"], v["qkernel"]], axis=-1),
            "qscale": jnp.concatenate(
                [q["qscale"], k["qscale"], v["qscale"]], axis=-1),
            "bias": jnp.concatenate(
                [q["bias"], k["bias"], v["bias"]], axis=-1),
        }
        if ascales is not None:
            fused["ascale"] = q["ascale"]  # attn_in: shared by q/k/v
        layers["qkv"] = fused
    bert["layers"] = layers
    params["bert"] = bert
    return params
