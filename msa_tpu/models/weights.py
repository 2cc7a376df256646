"""HF torch checkpoint -> msa_tpu param pytree conversion.

Replaces the reference's delegated ``BertForPreTraining.from_pretrained``
weight loading (ref train.py:70).  Accepts an HF-style state dict (torch
tensors or numpy arrays, keys as in ``transformers`` BertModel /
BertForPreTraining) and produces the stacked-layer pytree used by
models/bert.py, padding the vocab tables when the config requests it.

Golden-tested in tests/test_bert_golden.py by converting a randomly
initialized torch BertModel and comparing forward activations.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from ..configs import BertConfig, MMBertConfig


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor without importing torch at module scope
    return x.detach().cpu().numpy()


def _dense(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    # torch Linear weight is [out, in]; ours is [in, out].
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T.copy(),
        "bias": _np(sd[f"{prefix}.bias"]).copy(),
    }


def _ln(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]).copy(),
        "bias": _np(sd[f"{prefix}.bias"]).copy(),
    }


def _stack(dicts):
    return {
        k: np.stack([d[k] for d in dicts], axis=0) for k in dicts[0]
    }


def _pad_vocab(word: np.ndarray, padded: int) -> np.ndarray:
    v = word.shape[0]
    if padded == v:
        return word
    out = np.zeros((padded,) + word.shape[1:], dtype=word.dtype)
    out[:v] = word
    return out


def convert_bert_state_dict(
    sd: Mapping[str, Any], cfg: BertConfig, prefix: str = ""
) -> Dict[str, Any]:
    """Convert an HF BertModel state dict (optionally under ``prefix``)."""
    def key(k: str) -> str:
        return f"{prefix}{k}"

    emb = {
        "word": _pad_vocab(_np(sd[key("embeddings.word_embeddings.weight")]).copy(),
                           cfg.padded_vocab_size),
        "position": _np(sd[key("embeddings.position_embeddings.weight")]).copy(),
        "type": _np(sd[key("embeddings.token_type_embeddings.weight")]).copy(),
        "ln": _ln(sd, key("embeddings.LayerNorm")),
    }

    per_layer = {k: [] for k in ("q", "k", "v", "o", "attn_ln", "wi", "wo", "mlp_ln")}
    for i in range(cfg.num_hidden_layers):
        base = key(f"encoder.layer.{i}")
        per_layer["q"].append(_dense(sd, f"{base}.attention.self.query"))
        per_layer["k"].append(_dense(sd, f"{base}.attention.self.key"))
        per_layer["v"].append(_dense(sd, f"{base}.attention.self.value"))
        per_layer["o"].append(_dense(sd, f"{base}.attention.output.dense"))
        per_layer["attn_ln"].append(_ln(sd, f"{base}.attention.output.LayerNorm"))
        per_layer["wi"].append(_dense(sd, f"{base}.intermediate.dense"))
        per_layer["wo"].append(_dense(sd, f"{base}.output.dense"))
        per_layer["mlp_ln"].append(_ln(sd, f"{base}.output.LayerNorm"))

    layers = {k: _stack(v) for k, v in per_layer.items()}
    params: Dict[str, Any] = {"embeddings": emb, "layers": layers}
    pooler_key = key("pooler.dense.weight")
    if pooler_key in sd:
        params["pooler"] = _dense(sd, key("pooler.dense"))
    return params


def convert_pretraining_heads(sd: Mapping[str, Any], cfg: BertConfig,
                              prefix: str = "cls.") -> Dict[str, Any]:
    """Convert HF BertPreTrainingHeads (MLM transform + decoder bias + NSP)."""
    bias = _np(sd[f"{prefix}predictions.bias"]).copy()
    padded_bias = np.full((cfg.padded_vocab_size,), -1e9, dtype=bias.dtype)
    padded_bias[: bias.shape[0]] = bias
    out = {
        "transform_dense": _dense(sd, f"{prefix}predictions.transform.dense"),
        "transform_ln": _ln(sd, f"{prefix}predictions.transform.LayerNorm"),
        "decoder_bias": padded_bias,
    }
    nsp = f"{prefix}seq_relationship.weight"
    if nsp in sd:
        out["seq_relationship"] = _dense(sd, f"{prefix}seq_relationship")
    return out


def load_pretrained_bert(
    state_dict: Mapping[str, Any], cfg: MMBertConfig, init_params: Dict[str, Any]
) -> Dict[str, Any]:
    """Merge an HF BertForPreTraining checkpoint into freshly-initialized
    MMBert params (ref train.py:70: from_pretrained then custom heads keep
    their random init).
    """
    sd = dict(state_dict)
    # HF nests everything under 'bert.' for BertForPreTraining.
    bert_prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
    params = dict(init_params)
    params["bert"] = convert_bert_state_dict(sd, cfg.bert, prefix=bert_prefix)
    if "pooler" not in params["bert"]:
        params["bert"]["pooler"] = init_params["bert"]["pooler"]

    cls = dict(init_params["cls"])
    if f"cls.predictions.bias" in sd or "predictions.bias" in sd:
        head_prefix = "cls." if "cls.predictions.bias" in sd else ""
        converted = convert_pretraining_heads(sd, cfg.bert, prefix=head_prefix)
        cls.update(converted)
    params["cls"] = cls
    return params


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``state_dict`` file into numpy arrays (host-side)."""
    import torch  # local import: torch is a host-side optional dependency

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def resolve_pretrained(name_or_path: str) -> Dict[str, np.ndarray]:
    """State dict from a local torch file OR a model name.

    The reference resolves published checkpoints by name through
    ``BertForPreTraining.from_pretrained`` (ref train.py:70).  A name here
    goes through ``transformers`` too (HF cache first, network if
    available); a path loads the file directly.  Offline bootstrap:
    ``python scripts/fetch_bert_weights.py bert-large-uncased out/`` on a
    networked machine, then pass ``--pretrained out/bert-large-uncased.pt``.
    """
    import os

    if os.path.exists(name_or_path):
        return load_torch_checkpoint(name_or_path)
    try:
        from transformers import BertForPreTraining
        model = BertForPreTraining.from_pretrained(name_or_path)
    except Exception as e:
        raise FileNotFoundError(
            f"'{name_or_path}' is neither a local state-dict file nor a "
            f"resolvable model name (HF cache/network lookup failed: {e}). "
            "On a networked machine run scripts/fetch_bert_weights.py and "
            "pass the exported .pt file.") from e
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
