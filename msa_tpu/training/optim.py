"""Optimizer & LR schedule: AdamW with parameter-group weight-decay masking.

Replaces the reference's HF ``AdamW`` + ``get_linear_schedule_with_warmup``
(ref train.py:78-97).  Matches the intended semantics:

  * decoupled weight decay, EXCLUDED for biases and LayerNorm params
    (ref train.py:77: no_decay = ['bias','LayerNorm.bias','LayerNorm.weight']);
  * eps=1e-6 (HF AdamW default);
  * linear warmup then linear decay to 0.  (The reference's schedule never
    decays because it passes warmup=total_steps -- SURVEY.md section 7 bug
    (g); ``warmup_proportion`` here is the fraction of steps spent warming
    up, which is what the flag plainly means.)

Gradient accumulation uses optax.MultiSteps (the reference's accumulation
gate never fired due to the ``&``-precedence bug, trainer.py:96).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from ..configs import TrainConfig

_NO_DECAY_MARKERS = ("bias", "ln/", "attn_ln", "mlp_ln", "transform_ln")


def decay_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """True where weight decay applies (kernels/embeddings, not bias/LN)."""
    def f(path, leaf):
        p = "/".join(str(getattr(k, "key", k)) for k in path).lower()
        if p.endswith("bias") or "/ln/" in p or p.endswith("scale"):
            return False
        if "attn_ln" in p or "mlp_ln" in p or "transform_ln" in p:
            return False
        return True

    return jax.tree_util.tree_map_with_path(f, params)


def linear_warmup_decay(base_lr: float, total_steps: int, warmup_proportion: float):
    warmup = max(int(total_steps * warmup_proportion), 1)
    decay = max(total_steps - warmup, 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, base_lr, warmup),
            optax.linear_schedule(base_lr, 0.0, decay),
        ],
        [warmup],
    )


def make_optimizer(cfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    sched = linear_warmup_decay(cfg.learning_rate, total_steps, cfg.warmup_proportion)
    parts = []
    if cfg.max_grad_norm and cfg.max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    parts.append(
        optax.adamw(
            learning_rate=sched,
            b1=0.9,
            b2=0.999,
            eps=1e-6,
            weight_decay=cfg.weight_decay,
            mask=decay_mask,
            # bf16 mu halves the first moment's read+write in the
            # bandwidth-bound fused update (same exponent range as f32);
            # keep float32 (default) for bit-exact torch parity.
            mu_dtype=getattr(cfg, "adam_mu_dtype", "float32"),
        )
    )
    tx = optax.chain(*parts)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.gradient_accumulation_steps)
    return tx
