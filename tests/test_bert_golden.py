"""Golden-value tests: msa_tpu BERT vs a randomly initialized torch BertModel.

The reference's entire transformer math is delegated to HF (SURVEY.md section
2.2); parity is proven by converting a torch BertModel's weights into our
pytree and comparing activations on identical inputs.  No network access is
needed -- the torch model is built from a local BertConfig.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tpu.configs import tiny_bert_config
from msa_tpu.models.bert import bert_model
from msa_tpu.models.weights import convert_bert_state_dict, convert_pretraining_heads

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


CFG = tiny_bert_config(hidden_size=48, num_hidden_layers=3, num_attention_heads=4,
                       intermediate_size=96, vocab_size=200)


def hf_config():
    return transformers.BertConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        intermediate_size=CFG.intermediate_size,
        max_position_embeddings=CFG.max_position_embeddings,
        hidden_act="gelu",
        attn_implementation="eager",
    )


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = transformers.BertModel(hf_config())
    model.eval()
    return model


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(1)
    b, s = 3, 17
    ids = rng.integers(5, CFG.vocab_size, size=(b, s)).astype(np.int32)
    mask = np.ones((b, s), np.int32)
    mask[0, 12:] = 0
    mask[2, 5:] = 0
    ids[mask == 0] = 0
    tt = np.zeros((b, s), np.int32)
    tt[1, 8:] = 1
    return ids, mask, tt


def test_bert_forward_matches_torch(torch_model, inputs):
    ids, mask, tt = inputs
    with torch.no_grad():
        out = torch_model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
        )
    ref_seq = out.last_hidden_state.numpy()
    ref_pooled = out.pooler_output.numpy()

    params = convert_bert_state_dict(torch_model.state_dict(), CFG)
    params = jax.tree.map(jnp.asarray, params)
    seq, pooled = bert_model(params, jnp.asarray(ids), jnp.asarray(mask),
                             jnp.asarray(tt), CFG)

    # Only compare non-padding positions: HF still computes padded positions
    # but they are meaningless (masked out of attention for real tokens).
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(seq)[m], ref_seq[m], atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=2e-5, rtol=2e-5)


def test_padded_positions_dont_affect_real_ones(torch_model, inputs):
    """Changing token ids under the padding mask must not change real outputs."""
    ids, mask, tt = inputs
    params = convert_bert_state_dict(torch_model.state_dict(), CFG)
    params = jax.tree.map(jnp.asarray, params)
    seq1, _ = bert_model(params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt), CFG)
    ids2 = ids.copy()
    ids2[mask == 0] = 7
    seq2, _ = bert_model(params, jnp.asarray(ids2), jnp.asarray(mask), jnp.asarray(tt), CFG)
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(seq1)[m], np.asarray(seq2)[m], atol=1e-5)


def test_gelu_bf16_approx_within_rounding():
    """bf16 compute uses tanh-approx gelu (17x faster on the TPU VPU); its
    extra error over exact erf must stay within bf16's own rounding floor
    (f32 keeps exact erf -- that's what the golden tests above pin)."""
    import jax
    import jax.numpy as jnp

    from msa_tpu.models.bert import gelu

    x32 = jnp.linspace(-6, 6, 4097, dtype=jnp.float32)
    exact = np.asarray(jax.nn.gelu(x32, approximate=False))
    # f32 path is exact erf
    np.testing.assert_array_equal(np.asarray(gelu(x32)), exact)
    approx = np.asarray(gelu(x32.astype(jnp.bfloat16)).astype(jnp.float32))
    rounding_floor = np.abs(
        np.asarray(exact.astype(np.float32)).astype(jnp.bfloat16)
        .astype(np.float32) - exact).max()
    assert np.abs(approx - exact).max() < 1.25 * rounding_floor + 1e-6


def test_mlm_head_matches_torch(inputs):
    """Tied-decoder MLM head vs HF BertForPreTraining cls.predictions."""
    from msa_tpu.configs import MMBertConfig
    from msa_tpu.models.mmbert import mlm_logits

    torch.manual_seed(2)
    model = transformers.BertForPreTraining(hf_config())
    model.eval()
    ids, mask, tt = inputs
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(tt, dtype=torch.long),
        )
    ref_scores = out.prediction_logits.numpy()

    sd = model.state_dict()
    bert_params = convert_bert_state_dict(sd, CFG, prefix="bert.")
    heads = convert_pretraining_heads(sd, CFG, prefix="cls.")
    params = {
        "bert": jax.tree.map(jnp.asarray, bert_params),
        "cls": jax.tree.map(jnp.asarray, heads),
    }
    mmcfg = MMBertConfig(bert=CFG)
    seq, _ = bert_model(params["bert"], jnp.asarray(ids), jnp.asarray(mask),
                        jnp.asarray(tt), CFG)
    scores = mlm_logits(params, seq, mmcfg)
    m = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(scores)[m], ref_scores[m], atol=3e-4, rtol=3e-4)
