"""Loss primitives (all shapes static, all reductions weighted).

Replaces the reference's delegated torch losses (CrossEntropyLoss with
ignore_index -100, MSELoss -- ref MMBertForPretraining.py:381,433,438) and the
CPC/InfoNCE head (ref MMBertEmbedding.py:21-32).  Every reduction takes an
optional per-example weight so a zero-padded final batch contributes nothing
(the reference instead re-shapes the last batch, forcing recompilation on XLA).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import nn as jnn

IGNORE_INDEX = -100


def _safe_mean(total: jnp.ndarray, denom: jnp.ndarray) -> jnp.ndarray:
    return total / jnp.maximum(denom, 1e-9)


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    ignore_index: int = IGNORE_INDEX,
) -> jnp.ndarray:
    """Mean CE over positions where ``labels != ignore_index``.

    ``logits``: [..., C] (any leading shape), ``labels``: [...] int.
    Matches torch.nn.CrossEntropyLoss(reduction='mean', ignore_index=-100),
    except an all-ignored batch yields 0 instead of NaN.
    """
    logits = logits.astype(jnp.float32)
    valid = (labels != ignore_index).astype(jnp.float32)
    safe_labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    lse = jnn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, safe_labels[..., None], axis=-1)[..., 0]
    per_pos = (lse - picked) * valid
    if weights is not None:
        w = weights.reshape(weights.shape + (1,) * (per_pos.ndim - weights.ndim))
        per_pos = per_pos * w
        valid = valid * w
    return _safe_mean(jnp.sum(per_pos), jnp.sum(valid))


def mse(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Weighted mean squared error (torch MSELoss semantics over flat views)."""
    preds = preds.astype(jnp.float32).reshape(-1)
    targets = targets.astype(jnp.float32).reshape(-1)
    sq = (preds - targets) ** 2
    if weights is None:
        return jnp.mean(sq)
    w = weights.reshape(-1)
    return _safe_mean(jnp.sum(sq * w), jnp.sum(w))


def infonce(
    x: jnp.ndarray,
    x_pred: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """CPC InfoNCE term (ref MMBertEmbedding.py:21-32).

    ``x``: [B, D] pooled modality output; ``x_pred``: [B, D] prediction of x
    from the fused representation.  Both rows are L2-normalized, then
    ``nce = -mean(pos - logsumexp_j(x @ x_pred^T))``.  Zero-weight (padding)
    rows are excluded from both the mean and the negative set.
    """
    x = x.astype(jnp.float32)
    x_pred = x_pred.astype(jnp.float32)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), eps)
    x_pred = x_pred / jnp.maximum(jnp.linalg.norm(x_pred, axis=1, keepdims=True), eps)
    pos = jnp.sum(x * x_pred, axis=-1)
    scores = x @ x_pred.T  # [B, B]
    if weights is not None:
        w = weights.reshape(-1)
        scores = jnp.where(w[None, :] > 0, scores, -jnp.inf)
        neg = jnn.logsumexp(scores, axis=-1)
        per = (pos - neg) * w
        return -_safe_mean(jnp.sum(per), jnp.sum(w))
    neg = jnn.logsumexp(scores, axis=-1)
    return -jnp.mean(pos - neg)
