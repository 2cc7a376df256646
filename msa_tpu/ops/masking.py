"""On-device dynamic MLM masking.

Replaces the reference's host/torch ``mask_tokens`` (ref model_utils.py:6-39)
with a PRNG-key-driven jittable transform, applied inside the train step so
fresh masks are drawn every step with zero host round-trips.

Semantics preserved from the reference:
  * masking probability ``mlm_probability`` (ref train.py:37: 0.15);
  * special tokens ([PAD],[UNK],[CLS],[SEP],[MASK]) are never masked (the
    reference zeroes their probability via get_special_tokens_mask, ref
    model_utils.py:17-23; its separate padding fill at line 26 was a no-op
    bug, but PAD is already in the special set so behaviour is identical);
  * labels are -100 everywhere except masked positions;
  * of the masked positions, 80% are replaced by [MASK]; the 10%-random-word
    branch is commented out in the reference (model_utils.py:34-37), so the
    remaining 20% keep their original token.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .losses import IGNORE_INDEX

# bert-uncased ids: [PAD]=0, [UNK]=100, [CLS]=101, [SEP]=102, [MASK]=103
DEFAULT_SPECIAL_IDS = (0, 100, 101, 102, 103)
DEFAULT_MASK_ID = 103


def mask_tokens(
    key: jax.Array,
    input_ids: jnp.ndarray,
    mlm_probability: float = 0.15,
    mask_token_id: int = DEFAULT_MASK_ID,
    special_ids: Sequence[int] = DEFAULT_SPECIAL_IDS,
    replace_prob: float = 0.8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (masked_ids, labels); labels are -100 off the masked positions."""
    k_sel, k_rep = jax.random.split(key)
    special = jnp.zeros(input_ids.shape, dtype=bool)
    for sid in special_ids:
        special = special | (input_ids == sid)
    probs = jnp.where(special, 0.0, mlm_probability)
    masked = jax.random.bernoulli(k_sel, probs)
    labels = jnp.where(masked, input_ids, IGNORE_INDEX)
    replaced = jax.random.bernoulli(k_rep, replace_prob, input_ids.shape) & masked
    new_ids = jnp.where(replaced, mask_token_id, input_ids)
    return new_ids, labels


def apply_mlm_masks(
    input_ids: jnp.ndarray,
    masked: jnp.ndarray,
    replaced: jnp.ndarray,
    mask_token_id: int = DEFAULT_MASK_ID,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Deterministic MLM masking from PRECOMPUTED boolean masks.

    Parity hook (``Trainer.mlm_mask_injector``): the same host-generated
    numpy masks drive this path AND a torch twin, closing the masked-path
    hole in the full-fit parity proxy (jax PRNG draws are not reproducible
    in torch; ref model_utils.py:6-39 semantics).  ``masked`` selects the
    supervised positions (labels keep ``input_ids`` there, -100 elsewhere);
    ``replaced & masked`` positions additionally become ``mask_token_id``.
    The caller is responsible for excluding special tokens from ``masked``
    (the PRNG path above does this internally).
    """
    masked = masked.astype(bool)
    replaced = replaced.astype(bool) & masked
    labels = jnp.where(masked, input_ids, IGNORE_INDEX)
    new_ids = jnp.where(replaced, mask_token_id, input_ids)
    return new_ids, labels
