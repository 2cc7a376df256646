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


class FusedAdamW:
    """AdamW whose update runs as ONE fused Pallas pass per tensor
    (ops/fused_adamw.py) -- the update is HBM-bandwidth-bound and XLA's
    fusion leaves ~25% on the table (BENCH.md round-2 profile).

    Bit-matches ``optax.adamw`` semantics (same schedule, bias correction,
    decoupled masked weight decay); pinned in tests/test_fused_adamw.py.
    Unlike a GradientTransformation it applies the update in place
    (``apply(params, grads, state) -> (new_params, new_state)``) so the
    parameter write fuses into the same pass.

    Measured on v5e bert-large B=64 (BENCH.md round 2): 315.2 ms/step vs
    311.4 for the optax/XLA path -- XLA overlaps its update fusions with
    the tail of the backward, while per-tensor custom-calls serialize.
    Kept off-default (`TrainConfig.fused_optimizer`) as the seam for
    chips/workloads where the update cannot overlap.
    """

    def __init__(self, schedule, b1=0.9, b2=0.999, eps=1e-6,
                 weight_decay=0.01, max_grad_norm=0.0,
                 mu_dtype="float32", nu_dtype="float32",
                 use_pallas=True, interpret=False):
        self.schedule = schedule
        self.b1, self.b2, self.eps = b1, b2, eps
        self.weight_decay = weight_decay
        self.max_grad_norm = max_grad_norm
        self.mu_dtype = jax.numpy.dtype(mu_dtype)
        self.nu_dtype = jax.numpy.dtype(nu_dtype)
        self.use_pallas = use_pallas
        self.interpret = interpret

    def init(self, params):
        import jax.numpy as jnp
        mu = jax.tree.map(lambda p: jnp.zeros(p.shape, self.mu_dtype), params)
        nu = jax.tree.map(lambda p: jnp.zeros(p.shape, self.nu_dtype), params)
        return {"count": jnp.zeros((), jnp.int32), "mu": mu, "nu": nu}

    def apply(self, params, grads, state):
        import jax.numpy as jnp

        from ..ops.fused_adamw import fused_adamw_leaf

        if self.max_grad_norm and self.max_grad_norm > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, self.max_grad_norm / (gnorm + 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        count = state["count"]
        # optax convention: lr uses the pre-increment count, bias
        # correction uses t = count + 1.
        lr = jnp.asarray(self.schedule(count), jnp.float32)
        t = (count + 1).astype(jnp.float32)
        c1 = 1.0 - jnp.power(self.b1, t)
        c2 = 1.0 - jnp.power(self.b2, t)
        wd_mask = decay_mask(params)
        zero = jnp.zeros((), jnp.float32)
        wd = jnp.asarray(self.weight_decay, jnp.float32)

        flat_p, treedef = jax.tree.flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_mu = treedef.flatten_up_to(state["mu"])
        flat_nu = treedef.flatten_up_to(state["nu"])
        flat_m = jax.tree.leaves(wd_mask)
        new_p, new_mu, new_nu = [], [], []
        for p, g, mu, nu, m in zip(flat_p, flat_g, flat_mu, flat_nu, flat_m):
            pn, mn, nn = fused_adamw_leaf(
                p, g, mu, nu, lr, wd if m else zero, c1, c2,
                b1=self.b1, b2=self.b2, eps=self.eps,
                use_pallas=self.use_pallas, interpret=self.interpret)
            new_p.append(pn)
            new_mu.append(mn)
            new_nu.append(nn)
        return (jax.tree.unflatten(treedef, new_p),
                {"count": count + 1,
                 "mu": jax.tree.unflatten(treedef, new_mu),
                 "nu": jax.tree.unflatten(treedef, new_nu)})


def make_fused_optimizer(cfg: TrainConfig, total_steps: int,
                         use_pallas: bool = True,
                         interpret: bool = False) -> FusedAdamW:
    if cfg.gradient_accumulation_steps > 1:
        raise ValueError("fused_optimizer does not support gradient "
                         "accumulation; use the optax path")
    sched = linear_warmup_decay(cfg.learning_rate, total_steps,
                                cfg.warmup_proportion)
    return FusedAdamW(sched, weight_decay=cfg.weight_decay,
                      max_grad_norm=cfg.max_grad_norm,
                      mu_dtype=cfg.adam_mu_dtype,
                      nu_dtype=getattr(cfg, "adam_nu_dtype", "float32"),
                      use_pallas=use_pallas, interpret=interpret)


def scale_by_adam_casted(b1=0.9, b2=0.999, eps=1e-6, eps_root=0.0,
                         mu_dtype="float32", nu_dtype="float32"):
    """optax.scale_by_adam with BOTH moments in configurable storage dtypes.

    optax only exposes ``mu_dtype``; the second moment dominates the
    bandwidth-bound update's traffic just the same.  Moments are updated in
    float32 and stored in the given dtypes; with float32/float32 this is
    bit-identical to ``optax.scale_by_adam`` (pinned in tests/test_optim.py).
    """
    import jax.numpy as jnp

    mu_dt = jnp.dtype(mu_dtype)
    nu_dt = jnp.dtype(nu_dtype)

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(lambda p: jnp.zeros(p.shape, mu_dt), params),
            nu=jax.tree.map(lambda p: jnp.zeros(p.shape, nu_dt), params))

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        c1 = 1.0 - jnp.power(jnp.float32(b1), t)
        c2 = 1.0 - jnp.power(jnp.float32(b2), t)

        def upd(g, mu, nu):
            g32 = g.astype(jnp.float32)
            mu32 = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g32
            nu32 = b2 * nu.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            u = (mu32 / c1) / (jnp.sqrt(nu32 / c2 + eps_root) + eps)
            return u, mu32.astype(mu_dt), nu32.astype(nu_dt)

        flat_g, treedef = jax.tree.flatten(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [upd(g, mu, nu) for g, mu, nu in zip(flat_g, flat_mu, flat_nu)]
        updates = jax.tree.unflatten(treedef, [o[0] for o in out])
        new_mu = jax.tree.unflatten(treedef, [o[1] for o in out])
        new_nu = jax.tree.unflatten(treedef, [o[2] for o in out])
        return updates, optax.ScaleByAdamState(count=count, mu=new_mu,
                                               nu=new_nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    sched = linear_warmup_decay(cfg.learning_rate, total_steps, cfg.warmup_proportion)
    mu_dtype = getattr(cfg, "adam_mu_dtype", "float32")
    nu_dtype = getattr(cfg, "adam_nu_dtype", "float32")
    parts = []
    if cfg.max_grad_norm and cfg.max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    if nu_dtype == "float32":
        # the stock, battle-tested path; bf16 mu halves the first moment's
        # read+write in the bandwidth-bound update (same exponent range as
        # f32); keep float32 (default) for bit-exact torch parity.
        parts.append(
            optax.adamw(
                learning_rate=sched,
                b1=0.9,
                b2=0.999,
                eps=1e-6,
                weight_decay=cfg.weight_decay,
                mask=decay_mask,
                mu_dtype=mu_dtype,
            )
        )
    else:
        # custom kernel of the same update with nu also stored compactly
        parts.append(scale_by_adam_casted(mu_dtype=mu_dtype,
                                          nu_dtype=nu_dtype))
        parts.append(optax.add_decayed_weights(cfg.weight_decay,
                                               mask=decay_mask))
        parts.append(optax.scale_by_learning_rate(sched))
    tx = optax.chain(*parts)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.gradient_accumulation_steps)
    return tx
