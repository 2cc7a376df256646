"""Pretrained-weight import: torch BertForPreTraining -> MMBert end-to-end.

Covers the CLI --pretrained path (ref train.py:70 from_pretrained):
the BERT trunk + MLM/NSP heads come from the torch checkpoint, the
multimodal heads keep their fresh init, and the text-pass MLM logits match
torch exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tpu.configs import (
    DataConfig, ExperimentConfig, MMBertConfig, TrainConfig, tiny_bert_config,
)
from msa_tpu.models.bert import bert_model
from msa_tpu.models.mmbert import mlm_logits
from msa_tpu.training.trainer import Trainer

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = tiny_bert_config(hidden_size=48, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=96,
                       vocab_size=200)


@pytest.fixture(scope="module")
def torch_ckpt():
    torch.manual_seed(0)
    hf = transformers.BertForPreTraining(transformers.BertConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        intermediate_size=CFG.intermediate_size,
        max_position_embeddings=CFG.max_position_embeddings,
        attn_implementation="eager"))
    hf.eval()
    return hf


def test_init_state_with_pretrained(torch_ckpt):
    exp = ExperimentConfig(
        model_name="tiny",
        model=MMBertConfig(bert=CFG, visual_dim=5, speech_dim=7, num_labels=1),
        data=DataConfig(dataset="mosi", max_seq_length=12),
        train=TrainConfig(compute_dtype="float32", data_parallel=1,
                          use_flash_attention="never"),
    )
    sd = {k: v.numpy() for k, v in torch_ckpt.state_dict().items()}
    trainer = Trainer(exp, mask_token_id=4, special_ids=(0, 2, 3, 4))
    state = trainer.init_state(jax.random.key(0), 10, pretrained_state_dict=sd)

    rng = np.random.default_rng(1)
    ids = rng.integers(5, CFG.vocab_size, size=(2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    with torch.no_grad():
        ref = torch_ckpt(input_ids=torch.tensor(ids, dtype=torch.long),
                         attention_mask=torch.tensor(mask, dtype=torch.long))
    seq, pooled = bert_model(state.params["bert"], jnp.asarray(ids),
                             jnp.asarray(mask), None, CFG)
    scores = mlm_logits(state.params, seq, exp.model)
    np.testing.assert_allclose(np.asarray(scores),
                               ref.prediction_logits.numpy(),
                               atol=5e-4, rtol=5e-4)
    # multimodal heads must exist with fresh init (not from the checkpoint)
    assert state.params["fusion"]["classifier1"]["kernel"].shape == (
        3 * CFG.hidden_size, CFG.hidden_size)
    assert state.params["joint"]["Wv"]["kernel"].shape == (5, CFG.hidden_size)


def test_reference_behaviour_flags_compile():
    """eval_masking=True + eval_random_pairs=True (reference-mimicking eval)."""
    from msa_tpu.data import MultimodalDataset, synthetic_split

    exp = ExperimentConfig(
        model_name="tiny",
        model=MMBertConfig(bert=tiny_bert_config(vocab_size=120),
                           visual_dim=5, speech_dim=7, num_labels=1),
        data=DataConfig(dataset="mosi", max_seq_length=12),
        train=TrainConfig(compute_dtype="float32", data_parallel=1,
                          eval_masking=True, eval_random_pairs=True,
                          use_flash_attention="never"),
    )
    trainer = Trainer(exp, mask_token_id=4, special_ids=(0, 2, 3, 4))
    state = trainer.init_state(jax.random.key(0), 4)
    ds = MultimodalDataset(synthetic_split(8, 12, 5, 7, vocab_size=120), seed=0)
    em, preds, labels = trainer.eval_epoch(state, ds, 0, trainer.rng(1), 8)
    assert np.isfinite(em.loss)
    assert em.mlm_loss > 0  # masking actually applied at eval


def test_resolve_pretrained_path_and_name(tmp_path, torch_ckpt):
    """resolve_pretrained: a local file loads directly; an unresolvable
    name raises a FileNotFoundError pointing at the bootstrap script."""
    from msa_tpu.models.weights import resolve_pretrained

    path = tmp_path / "tiny.pt"
    torch.save(torch_ckpt.state_dict(), str(path))
    sd = resolve_pretrained(str(path))
    assert set(sd) == set(torch_ckpt.state_dict())
    assert all(isinstance(v, np.ndarray) for v in sd.values())

    with pytest.raises(FileNotFoundError, match="fetch_bert_weights"):
        resolve_pretrained("no-such-model-name-xyz")
