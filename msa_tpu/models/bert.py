"""BERT encoder core in functional JAX (params as pytrees).

TPU-native re-implementation of the compute the reference delegates to HF
``BertEmbeddings`` / ``BertEncoder`` / ``BertPooler`` (ref
MMBertForPretraining.py:9,18-20,264-279).  Design choices:

  * layer parameters are STACKED on a leading [num_layers] axis and the
    encoder runs as one ``lax.scan`` -- constant compile time in depth;
  * LayerNorm/softmax/losses in float32, matmuls in a configurable compute
    dtype (bfloat16 on TPU -> MXU native);
  * attention dispatches to a Pallas flash kernel when profitable
    (ops/attention.py), with a plain-XLA fallback;
  * the vocab (and the tied MLM decoder matmul) can be padded to a multiple
    of 128 so the [*, H] @ [H, V] logits matmul tiles the MXU exactly.

Golden-tested against ``transformers.BertModel`` in tests/test_bert_golden.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..configs import BertConfig
from ..ops.attention import multi_head_attention

# Fused LN+quantize at the int8 serving path's mlp_in and attn_in sites
# (ops/ln_quant.py).  Module-level so bench harnesses can A/B the XLA
# composition (BENCH.md).  _LN_QUANT_ATTN additionally fuses the END-of-layer
# mlp_ln with the NEXT layer's q/k/v activation quantize (the int8 view rides
# the scan carry, the shifted static scale rides the scan xs).
# _LN_QUANT_INTERPRET forces the fused path on CPU in Pallas interpret mode
# (tests only -- the production gate requires a real TPU).
_LN_QUANT_ENABLED = True
_LN_QUANT_ATTN = True
_LN_QUANT_INTERPRET = False

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _dense_init(key, d_in: int, d_out: int, stddev: float) -> Params:
    return {
        "kernel": jax.random.normal(key, (d_in, d_out), jnp.float32) * stddev,
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _stacked_dense_init(key, n: int, d_in: int, d_out: int, stddev: float) -> Params:
    return {
        "kernel": jax.random.normal(key, (n, d_in, d_out), jnp.float32) * stddev,
        "bias": jnp.zeros((n, d_out), jnp.float32),
    }


def _ln_init(shape) -> Params:
    return {"scale": jnp.ones(shape, jnp.float32), "bias": jnp.zeros(shape, jnp.float32)}


def init_bert_params(key: jax.Array, cfg: BertConfig) -> Params:
    keys = jax.random.split(key, 12)
    n, h, i = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    std = cfg.initializer_range
    vp = cfg.padded_vocab_size
    word = jax.random.normal(keys[0], (vp, h), jnp.float32) * std
    if vp > cfg.vocab_size:
        word = word.at[cfg.vocab_size :].set(0.0)
    return {
        "embeddings": {
            "word": word,
            "position": jax.random.normal(keys[1], (cfg.max_position_embeddings, h), jnp.float32) * std,
            "type": jax.random.normal(keys[2], (cfg.type_vocab_size, h), jnp.float32) * std,
            "ln": _ln_init((h,)),
        },
        "layers": {
            "q": _stacked_dense_init(keys[3], n, h, h, std),
            "k": _stacked_dense_init(keys[4], n, h, h, std),
            "v": _stacked_dense_init(keys[5], n, h, h, std),
            "o": _stacked_dense_init(keys[6], n, h, h, std),
            "attn_ln": _ln_init((n, h)),
            "wi": _stacked_dense_init(keys[7], n, h, i, std),
            "wo": _stacked_dense_init(keys[8], n, i, h, std),
            "mlp_ln": _ln_init((n, h)),
        },
        "pooler": _dense_init(keys[9], h, h, std),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def layer_norm(x: jnp.ndarray, p: Params, eps: float) -> jnp.ndarray:
    """f32 LayerNorm; output cast back to the input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def matmul_precision(dtype) -> jax.lax.Precision:
    """Full-precision matmuls for f32 (golden parity); MXU-native for bf16.

    JAX's DEFAULT precision lets XLA downcast f32 matmul operands, which is
    a ~1e-3 error -- unacceptable for parity testing.  bf16 inputs already
    run the MXU natively, so DEFAULT is right there.
    """
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def dense(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    if "qkernel" in p:  # int8 serving path (ops/quant.py)
        from ..ops.quant import int8_dense
        return int8_dense(x, p["qkernel"], p["qscale"], p["bias"],
                          p.get("ascale"))
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=x.dtype,
                precision=matmul_precision(x.dtype))
    return y + p["bias"].astype(x.dtype)


def gelu(x: jnp.ndarray, exact: bool = False) -> jnp.ndarray:
    """BERT's gelu, precision-adaptive.

    The reference (HF transformers) uses the exact erf formulation; on the
    TPU VPU erf costs ~17x tanh (measured 1854 vs 108 us on a [10240, 4096]
    bf16 activation, benchmarks/bench_gelu.py).  The tanh approximation's
    error (<0.1% of scale, worst near |x|~2) is BELOW bf16's own ~0.4%
    rounding, so in bf16 compute it is numerically free and we take it; f32
    keeps exact erf (golden parity vs HF, tests/test_bert_golden.py --
    matching the f32-LN / HIGHEST-precision policy above).  SURVEY.md
    section 7 deviation (m); ``exact=True`` (``BertConfig.exact_gelu``)
    restores erf in bf16 for reference-parity runs.
    """
    return jax.nn.gelu(
        x, approximate=(x.dtype == jnp.bfloat16 and not exact))


# uint8-threshold dropout for the XLA-level sites (embed / joint-embed /
# attn-out / MLP-down): jax.random.bits(uint8) packs FOUR keep decisions
# per threefry u32 draw and skips the u32->f32 uniform conversion, the
# same t/256 rate snap the Pallas kernels adopted in round 4
# (ops/short_attention.quantize_dropout_rate).  The rescale uses the SAME
# snapped rate, so the expectation stays exactly unbiased.  False
# restores the f32-uniform bernoulli (bit-compatible with rounds 1-4).
#
# Gated by sequence length like the attention-kernel dispatch: the round-5
# hardware A/B measured the bits path winning 2.1% at frame level
# (S=1024: 720.1 vs 735.2 ms/step) but costing ~2 ms at the flagship
# (S<=80: 351.25 vs 349.31 mean of two order-swapped pairs) — at short S
# the sites are instruction/fusion-bound, not PRNG-volume-bound, exactly
# like the round-4 Pallas 8-bit threshold finding.  GSPMD keeps traced
# shapes global, so the gate is mesh-independent.
_BITS_DROPOUT = True
_BITS_DROPOUT_MIN_SEQ = 256


def _dropout(key: Optional[jax.Array], x: jnp.ndarray, rate: float,
             deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0 or key is None:
        return x
    from jax.ad_checkpoint import checkpoint_name
    # 'drop_mask' lets remat policies regenerate the PRNG draw in backward
    # instead of storing the mask (and the u32 bits feeding it) in HBM.
    if (_BITS_DROPOUT and x.ndim >= 3
            and x.shape[-2] >= _BITS_DROPOUT_MIN_SEQ):
        from ..ops.short_attention import _DROP_QUANT
        t = min(max(int(round(rate * _DROP_QUANT)), 1), _DROP_QUANT - 1)
        keep = checkpoint_name(
            jax.random.bits(key, x.shape, jnp.uint8) >= jnp.uint8(t),
            "drop_mask")
        return jnp.where(keep, x * (_DROP_QUANT / (_DROP_QUANT - t)),
                         0.0).astype(x.dtype)
    keep = checkpoint_name(jax.random.bernoulli(key, 1.0 - rate, x.shape),
                           "drop_mask")
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def bert_embeddings(
    params: Params,
    input_ids: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray],
    cfg: BertConfig,
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    compute_dtype: jnp.dtype = jnp.float32,
    position_offset: int = 0,
) -> jnp.ndarray:
    """Word + position + type embeddings -> LN -> dropout.  [B, S, H]."""
    p = params["embeddings"]
    seq = input_ids.shape[-1]
    word = jnp.take(p["word"], input_ids, axis=0).astype(compute_dtype)
    pos = p["position"][position_offset : position_offset + seq].astype(compute_dtype)
    if token_type_ids is None:
        tt = p["type"][0].astype(compute_dtype)
        x = word + pos[None, :, :] + tt
    else:
        tt = jnp.take(p["type"], token_type_ids, axis=0).astype(compute_dtype)
        x = word + pos[None, :, :] + tt
    x = layer_norm(x, p["ln"], cfg.layer_norm_eps)
    return _dropout(rng, x, cfg.hidden_dropout_prob, deterministic)


def bert_encoder(
    params: Params,
    hidden: jnp.ndarray,
    attn_bias: jnp.ndarray,
    cfg: BertConfig,
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    use_flash: str = "auto",
    on_tpu: bool = False,
    remat: bool = False,
    unroll: int = 1,
    remat_policy: str = "full",
    mesh=None,
    sequence_parallel: bool = False,
    collect_act_stats: bool = False,
) -> jnp.ndarray:
    """Run all transformer layers via one lax.scan.

    ``hidden``: [B, S, H]; ``attn_bias``: additive mask [B, 1, 1, S] (0 keep,
    large-negative drop), matching the reference's extended attention mask
    (ref MMBertForPretraining.py:147-154).

    ``remat=True`` wraps each layer in jax.checkpoint: backward recomputes
    layer activations instead of storing them -- the standard HBM/FLOPs
    trade on TPU (keeps big-batch bert-large training inside 16G HBM).

    ``mesh`` + ``sequence_parallel``: under tensor parallelism, pass the
    (data, model) mesh so the Pallas attention runs head-parallel via
    shard_map; ``sequence_parallel=True`` additionally constrains the
    residual stream to a sequence-sharded layout at the LayerNorm
    boundaries (Megatron-SP): GSPMD then turns the TP all-reduces at the
    o/wo projections into reduce-scatter + all-gather pairs, and LN /
    dropout / residual math runs on S/mp tokens per chip.  Numerics are
    identical (constraints are identity); pinned in tests/test_seq_parallel.py.

    ``collect_act_stats=True`` (int8 static-scale calibration,
    ops/quant.py): returns ``(hidden, stats)`` where stats maps
    {"attn_in", "ctx", "mlp_in", "ffn_act"} to [num_layers] f32 absmax of
    the inputs feeding each quantized projection class.
    """
    layers = params["layers"]
    num_layers = cfg.num_hidden_layers
    dtype = hidden.dtype

    sp_sharding = None
    if sequence_parallel and mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
        if mesh.shape.get(MODEL_AXIS, 1) > 1:
            sp_sharding = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))

    def sp(h):
        return (jax.lax.with_sharding_constraint(h, sp_sharding)
                if sp_sharding is not None else h)

    if rng is None:
        layer_keys = jnp.zeros((num_layers, 2), dtype=jnp.uint32)
        have_rng = False
    else:
        layer_keys = jax.random.split(rng, num_layers)
        have_rng = True

    from jax.ad_checkpoint import checkpoint_name

    # 'save_pack' packs q|k|v into ONE [*, 3H] named value so the scan
    # stash moves 3 per-iteration transfers as 1 (the round-2 profile's
    # biggest non-roofline item was exactly these latency-bound stash
    # copies) and the packed Pallas kernel consumes/produces that layout
    # directly.  Only the short whole-sequence kernel has a packed form;
    # anywhere it would not dispatch (long S, TP head-parallel, XLA
    # fallback, CPU dropout) the policy silently degrades to save_attn.
    # A '+drop' suffix on any named policy ALSO saves the bool dropout
    # masks ('drop_mask'): the backward then reads ~1 byte/element instead
    # of re-running the PRNG + bernoulli compare (measured: flagship B=96
    # 360.1 -> 347.4 ms, frame-level 790.5 -> 781.4 -- BENCH.md round 3).
    # A '+probs' suffix additionally saves the short-attention kernel's
    # signed post-softmax probs ('attn_probs', emitted by the v2s entry):
    # the attention backward then skips its softmax+dropout recompute
    # entirely (ops/short_attention.py v2s section).  Where the short
    # kernel does not dispatch (long S, TP head-parallel, XLA fallback)
    # the name never fires and the base policy's behavior is unchanged.
    # Parsed HERE so the save_pack dispatch check below still matches.
    save_drop = save_probs = False
    while True:
        if remat_policy.endswith("+drop"):
            save_drop, remat_policy = True, remat_policy[:-len("+drop")]
        elif remat_policy.endswith("+probs"):
            save_probs, remat_policy = True, remat_policy[:-len("+probs")]
        else:
            break
    if (save_drop or save_probs) and remat and remat_policy not in (
            "full", "save_small", "save_attn", "save_ctx", "save_pack",
            "save_wide"):
        # 'dots' (checkpoint_dots) and unknown bases cannot honor the extra
        # saved names -- silently degrading would fake the requested rung
        # (round-3 ADVICE item 3).
        raise ValueError(
            f"remat_policy suffix (+drop/+probs) does not compose with base "
            f"{remat_policy!r}; use one of the save_* named policies or "
            f"'full'")

    pack_attn = False
    if remat_policy == "save_pack":
        from ..ops.attention import _SHORT_MAX_SEQ
        from ..parallel.mesh import MODEL_AXIS
        s_len = hidden.shape[1]
        mp = mesh.shape.get(MODEL_AXIS, 1) if mesh is not None else 1
        dropout_active = (not deterministic) and rng is not None \
            and cfg.attention_probs_dropout_prob > 0.0
        pack_attn = (
            s_len <= _SHORT_MAX_SEQ and mp == 1
            and (on_tpu or use_flash == "always")
            and not (dropout_active and not on_tpu)
        )
        if not pack_attn:
            remat_policy = "save_attn"

    # Fused int8 q|k|v serving path (ops/quant.py fuse_qkv=True): when the
    # packed short-attention kernel can dispatch, feed it the [*, 3H] fused
    # matmul output DIRECTLY -- slicing q/k/v out of it materializes three
    # [*, H] copies (measured +3.5 ms/batch at the B=96 serving shape).
    # NOTE both fused variants measured LOSING vs split projections at that
    # shape (BENCH.md round-4 int8 decomposition: the [H, 3H] int8 dot runs
    # slower than 3x[H, H]); the path is kept opt-in for A/B reproduction
    # (Predictor(fuse_qkv=True)).
    int8_qkv_direct = False
    if isinstance(params.get("layers"), dict) and "qkv" in params["layers"]:
        from ..ops.attention import _SHORT_MAX_SEQ
        from ..parallel.mesh import MODEL_AXIS
        mp_ = mesh.shape.get(MODEL_AXIS, 1) if mesh is not None else 1
        int8_qkv_direct = (
            hidden.shape[1] <= _SHORT_MAX_SEQ and mp_ == 1
            and (on_tpu or use_flash == "always") and deterministic)

    # Fused LN+quantize at the mlp_in site (ops/ln_quant.py): the post-
    # attention LayerNorm's output feeds BOTH the residual add and wi's
    # activation quantize, so XLA cannot fuse the quantize into it; the
    # Pallas kernel emits the bf16 stream AND the int8 view in one HBM
    # pass.  int8 serving only (never differentiated), single-chip mesh
    # (the SP constraint and TP layouts bypass it), real TPU only (the
    # XLA composition below is the fallback and the CPU-test oracle).
    ln_quant_wi = False
    if _LN_QUANT_ENABLED and isinstance(params.get("layers"), dict) \
            and "qkernel" in params["layers"].get("wi", {}):
        from ..parallel.mesh import MODEL_AXIS
        mp_ = mesh.shape.get(MODEL_AXIS, 1) if mesh is not None else 1
        ln_quant_wi = (deterministic and mp_ == 1
                       and (on_tpu or _LN_QUANT_INTERPRET)
                       and not remat and not collect_act_stats)

    # Fused LN+quantize at the attn_in site: the end-of-layer mlp_ln's
    # output feeds BOTH the residual stream and the NEXT layer's q/k/v
    # activation quantize, so the fused kernel needs layer i+1's static
    # scale inside iteration i -- the [L] ascale array rides the scan xs
    # shifted by one (jnp.roll), and the int8 view rides the scan carry.
    # The embedding output (layer 0's attn_in) keeps one standalone
    # quantize pass before the scan (1/L of the old cost); the LAST
    # iteration's int8 output is computed against scale[0] and discarded.
    # Static scales + split q/k/v only (the fused-qkv entry measured
    # losing and stays opt-in; dynamic per-row stays on the composition).
    # Only fuse when the int8 carry is actually CONSUMED: the plain split
    # q/k/v branch is the sole reader, so pack_attn / fused-qkv layouts
    # must not pay the kernel's extra [B,S,H] int8 HBM write every layer
    # (round-4 ADVICE item 4).
    ln_quant_qkv = (
        _LN_QUANT_ATTN and ln_quant_wi
        and not pack_attn and "qkv" not in params["layers"]
        and params["layers"].get("q", {}).get("ascale") is not None
        and params["layers"]["wi"].get("ascale") is not None)

    def _absmax(x):
        return jnp.max(jnp.abs(x.astype(jnp.float32)))

    def one_layer(carry, xs):
        if ln_quant_qkv:
            h, xi_attn = carry
            lp, lkey, asc_next = xs
        else:
            h = carry
            lp, lkey = xs
        stats = {}
        if collect_act_stats:
            stats["attn_in"] = _absmax(h)
        if have_rng and not deterministic:
            k_attn, k_post, k_mlp = jax.random.split(lkey, 3)
        else:
            k_attn = k_post = k_mlp = None
        # --- self attention ---
        # Checkpoint names mark the [*, H]-wide dot outputs for the remat
        # policies below: 'attn_io' = q/k/v/ctx (saving these lets backward
        # skip BOTH the QKV projections' recompute and re-running the
        # attention kernel -- its custom-vjp residuals are exactly q/k/v);
        # 'narrow' = the remaining H-wide outputs.  save_small keeps both
        # sets; save_attn keeps only 'attn_io'.
        if pack_attn:
            from ..ops.short_attention import short_attention_v2p
            qkv = checkpoint_name(jnp.concatenate(
                [dense(h, lp["q"]), dense(h, lp["k"]), dense(h, lp["v"])],
                axis=-1), "attn_pack")
            if (not deterministic) and k_attn is not None \
                    and cfg.attention_probs_dropout_prob > 0.0:
                seed = jax.random.randint(k_attn, (1,), 0, 2**31 - 1,
                                          dtype=jnp.int32)
                from ..ops.short_attention import quantize_dropout_rate
                rate = quantize_dropout_rate(
                    float(cfg.attention_probs_dropout_prob))
            else:
                seed, rate = None, 0.0
            ctx = checkpoint_name(short_attention_v2p(
                qkv, attn_bias[:, 0, 0, :], seed,
                cfg.num_attention_heads, rate, not on_tpu), "attn_ctx")
        elif "qkv" in lp:
            # Fused int8 q|k|v projection (ops/quant.py fuse_qkv=True,
            # single-chip serving): ONE shared activation quantize, ONE
            # [H, 3H] int8 MXU matmul and ONE dequant epilogue instead of
            # three of each (BENCH.md round-4 int8 decomposition).
            qkv = dense(h, lp["qkv"])
            if int8_qkv_direct:
                # packed kernel consumes the fused layout with no slices
                from ..ops.short_attention import short_attention_v2p
                ctx = checkpoint_name(short_attention_v2p(
                    qkv, attn_bias[:, 0, 0, :], None,
                    cfg.num_attention_heads, 0.0, not on_tpu), "attn_ctx")
            else:
                hs = h.shape[-1]
                ctx = checkpoint_name(multi_head_attention(
                    qkv[..., :hs], qkv[..., hs:2 * hs], qkv[..., 2 * hs:],
                    attn_bias,
                    num_heads=cfg.num_attention_heads,
                    dropout_rate=cfg.attention_probs_dropout_prob,
                    dropout_rng=k_attn,
                    deterministic=deterministic,
                    use_flash=use_flash,
                    on_tpu=on_tpu,
                    mesh=mesh,
                    stash_probs=save_probs,
                ), "attn_ctx")
        else:
            if ln_quant_qkv:
                # the carried int8 view was quantized with THIS layer's
                # attn_in scale (lp["q"]["ascale"]) by the previous
                # iteration's fused mlp_ln (or the pre-scan quantize) --
                # so dequant ALL THREE against q's ascale: k/v share the
                # 'attn_in' calibration stat today, but a per-projection
                # calibration change must not silently corrupt them
                # (round-4 ADVICE item 1).
                from ..ops.quant import int8_matmul_pre
                q, k, v = (int8_matmul_pre(
                    xi_attn, lp["q"]["ascale"], lp[key]["qkernel"],
                    lp[key]["qscale"], lp[key]["bias"], h.dtype)
                    for key in ("q", "k", "v"))
            else:
                q = checkpoint_name(dense(h, lp["q"]), "attn_io")
                k = checkpoint_name(dense(h, lp["k"]), "attn_io")
                v = checkpoint_name(dense(h, lp["v"]), "attn_io")
            ctx = checkpoint_name(multi_head_attention(
                q, k, v, attn_bias,
                num_heads=cfg.num_attention_heads,
                dropout_rate=cfg.attention_probs_dropout_prob,
                dropout_rng=k_attn,
                deterministic=deterministic,
                use_flash=use_flash,
                on_tpu=on_tpu,
                mesh=mesh,
                stash_probs=save_probs,
            ), "attn_ctx")
        if collect_act_stats:
            stats["ctx"] = _absmax(ctx)
        attn_out = checkpoint_name(dense(ctx, lp["o"]), "narrow")
        attn_out = _dropout(k_post, attn_out, cfg.hidden_dropout_prob, deterministic)
        if ln_quant_wi:
            # one HBM pass emits the bf16 stream AND wi's int8 view
            from ..ops.ln_quant import ln_quant
            from ..ops.quant import int8_matmul_pre
            asc = lp["wi"].get("ascale")
            h, xi, rowscale = ln_quant(h, attn_out, lp["attn_ln"],
                                       cfg.layer_norm_eps, ascale=asc,
                                       interpret=_LN_QUANT_INTERPRET)
            up = int8_matmul_pre(
                xi, asc if asc is not None else rowscale,
                lp["wi"]["qkernel"], lp["wi"]["qscale"], lp["wi"]["bias"],
                h.dtype)
        else:
            h = checkpoint_name(
                sp(layer_norm(h + attn_out, lp["attn_ln"],
                              cfg.layer_norm_eps)),
                "narrow")
        if collect_act_stats:
            stats["mlp_in"] = _absmax(h)
        # --- mlp ---
        # 'ffn_wide' marks the [*, 4H] tensors: the recompute_ffn policy
        # saves everything EXCEPT these (they dominate activation memory;
        # recomputing just wi+gelu costs ~1/12 of the step's matmul FLOPs).
        if not ln_quant_wi:
            up = checkpoint_name(dense(h, lp["wi"]), "ffn_wide")
        # gelu in the compute dtype: in bf16 this halves FFN activation
        # traffic; in f32 it is exact (golden parity).
        up = checkpoint_name(gelu(up, cfg.exact_gelu), "ffn_wide")
        if collect_act_stats:
            stats["ffn_act"] = _absmax(up)
        down = dense(up, lp["wo"])
        down = _dropout(k_mlp, down, cfg.hidden_dropout_prob, deterministic)
        if ln_quant_qkv:
            # one HBM pass emits the bf16 stream AND the next layer's
            # q/k/v int8 view (quantized at the NEXT layer's attn_in scale)
            from ..ops.ln_quant import ln_quant
            h, xi_next, _ = ln_quant(h, down, lp["mlp_ln"],
                                     cfg.layer_norm_eps, ascale=asc_next,
                                     interpret=_LN_QUANT_INTERPRET)
            return (h, xi_next), None
        h = sp(layer_norm(h + down, lp["mlp_ln"], cfg.layer_norm_eps))
        return h, (stats if collect_act_stats else None)

    if remat:
        # 'full': recompute everything in backward (min HBM).
        # 'dots': keep all matmul outputs, recompute elementwise only.
        #   Measured on the v5e flagship step: cuts matmul time 116.6->101 ms
        #   but the stored [*, 4H] FFN tensors' HBM round-trips give it all
        #   back (loop fusion 25->39.5 ms) -- net parity with 'full'.
        # 'save_small': keep only the [*, H]-wide outputs (q/k/v/ctx/attn
        #   projections + post-attention LN), recompute the FFN and the
        #   attention softmax -- 2/3 of the matmul-recompute saving at 1/4
        #   of the HBM cost of 'dots'.
        # 'attn_lse' (every list below): the long-seq flash2 kernel's saved
        # softmax stats ([B, G, hpg, Sq] f32, ~2 MB/layer at S=1024) --
        # saving them together with 'attn_ctx' means the backward consumes
        # the kernel's custom-vjp residuals straight from the stash and
        # NEVER re-runs its forward (measured ~90 ms/step of the frame-level
        # step before this).  The name simply never fires for the short
        # kernel / XLA paths.  NOTE: flash2 computes softmax in the exp2
        # domain, so its stashed lse is in LOG2 units (m + log2(sum), see
        # ops/flash2.py); the value is produced and consumed only by the
        # flash2 kernel pair -- never assume natural-log units.
        extra = ()
        if save_drop:
            extra += ("drop_mask",)
        if save_probs:
            extra += ("attn_probs",)
        if remat_policy == "dots":
            policy = jax.checkpoint_policies.checkpoint_dots
        elif remat_policy == "save_small":
            policy = jax.checkpoint_policies.save_only_these_names(
                "attn_io", "attn_ctx", "attn_lse", "narrow", *extra)
        elif remat_policy == "save_attn":
            # Save only q/k/v/ctx: backward skips the attention kernel's
            # forward recompute and the QKV projections (~2/3 of
            # save_small's stash bytes), recomputes o-proj/LN/FFN.
            policy = jax.checkpoint_policies.save_only_these_names(
                "attn_io", "attn_ctx", "attn_lse", *extra)
        elif remat_policy == "save_ctx":
            # Save ONLY the attention output: the QKV projections are
            # recomputed (3 matmuls/layer) and feed the attention kernel's
            # custom-vjp backward directly, but the kernel's own forward is
            # never re-run.  1/4 of save_attn's stash -- the memory point
            # that fits B=128.
            policy = jax.checkpoint_policies.save_only_these_names(
                "attn_ctx", "attn_lse", *extra)
        elif remat_policy == "save_pack":
            # Same stash bytes as save_attn, packed as 2 buffers/layer
            # ([*, 3H] q|k|v + [*, H] ctx) instead of 4.
            policy = jax.checkpoint_policies.save_only_these_names(
                "attn_pack", "attn_ctx", "attn_lse", *extra)
        elif remat_policy == "save_wide":
            # Save the narrow set AND the [*, 4H] FFN tensors; backward
            # recomputes only elementwise leftovers (LN stats, dropout
            # masks).  NOTE: save_anything_except_these_names does NOT work
            # here -- excluding gelu's input/output just makes jax save
            # gelu's equally-wide INTERNAL intermediates instead (verified).
            policy = jax.checkpoint_policies.save_only_these_names(
                "attn_io", "attn_ctx", "attn_lse", "narrow", "ffn_wide",
                *extra)
        elif extra:
            # 'full+drop': regenerate everything EXCEPT the masks.
            policy = jax.checkpoint_policies.save_only_these_names(*extra)
        else:
            policy = None
        one_layer = jax.checkpoint(one_layer, policy=policy)
    if ln_quant_qkv:
        from ..ops.quant import quantize_act
        asc_attn = jnp.asarray(params["layers"]["q"]["ascale"], jnp.float32)
        asc_next_arr = jnp.roll(asc_attn, -1)
        # layer 0's attn_in int8 view: the one standalone quantize pass left
        xi0, _ = quantize_act(hidden, asc_attn[0])
        if unroll == 0:
            h_out, xi = hidden, xi0
            for li in range(num_layers):
                lp = jax.tree.map(lambda x: x[li], layers)
                (h_out, xi), _ = one_layer(
                    (h_out, xi), (lp, layer_keys[li], asc_next_arr[li]))
            return h_out
        (hidden, _), _ = jax.lax.scan(
            one_layer, (hidden, xi0), (layers, layer_keys, asc_next_arr),
            unroll=unroll)
        return hidden
    if unroll == 0:
        # Python loop over static layer indices (no lax.scan): every
        # jax.checkpoint residual becomes its own buffer, so the backward
        # reads them directly instead of through the scan stash's
        # per-iteration dynamic_slice+squeeze copies (the largest
        # non-roofline item in the round-2 step profile).  Costs ~L x the
        # traced/compiled code size.
        stats = []
        hidden_out = hidden
        for li in range(num_layers):
            lp = jax.tree.map(lambda x: x[li], layers)
            hidden_out, st = one_layer(hidden_out, (lp, layer_keys[li]))
            if collect_act_stats:
                stats.append(st)
        hidden = hidden_out
        ys = (jax.tree.map(lambda *xs: jnp.stack(xs), *stats)
              if collect_act_stats else None)
    else:
        hidden, ys = jax.lax.scan(one_layer, hidden, (layers, layer_keys),
                                  unroll=unroll)
    if collect_act_stats:
        return hidden, ys  # {stat: [num_layers] f32}
    return hidden


def bert_pooler(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """tanh(dense(first token)) -- ref delegated BertPooler."""
    first = hidden[:, 0]
    return jnp.tanh(dense(first, params["pooler"]).astype(jnp.float32)).astype(hidden.dtype)


def extended_attention_mask(mask: jnp.ndarray, dtype=jnp.float32,
                            neg: float = -10000.0) -> jnp.ndarray:
    """[B, S] 1/0 mask -> additive [B, 1, 1, S] bias (0 keep / ``neg`` drop).

    Matches ref MMBertForPretraining.py:147-154 (-10000.0 fill).
    """
    m = mask.astype(jnp.float32)
    return ((1.0 - m) * neg)[:, None, None, :].astype(dtype)


def bert_model(
    params: Params,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray],
    cfg: BertConfig,
    *,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    compute_dtype: jnp.dtype = jnp.float32,
    use_flash: str = "auto",
    on_tpu: bool = False,
    mesh=None,
    sequence_parallel: bool = False,
):
    """Full text-only BERT: returns (sequence_output [B,S,H], pooled [B,H])."""
    if rng is not None:
        k_emb, k_enc = jax.random.split(rng)
    else:
        k_emb = k_enc = None
    x = bert_embeddings(params, input_ids, token_type_ids, cfg,
                        deterministic=deterministic, rng=k_emb,
                        compute_dtype=compute_dtype)
    bias = extended_attention_mask(attention_mask, jnp.float32)
    seq = bert_encoder(params, x, bias, cfg, deterministic=deterministic,
                       rng=k_enc, use_flash=use_flash, on_tpu=on_tpu,
                       mesh=mesh, sequence_parallel=sequence_parallel)
    pooled = bert_pooler(params, seq)
    return seq, pooled
