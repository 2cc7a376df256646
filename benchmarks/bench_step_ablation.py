"""Decompose the flagship train step's time on the real TPU (round 2).

Times, each as its own jitted program (pipelined reps, scalar-fetch sync —
block_until_ready does not block on axon):

  * full train step at several remat settings,
  * value_and_grad only (no optimizer),
  * optimizer update only,
  * forward only.

Usage: python benchmarks/bench_step_ablation.py [--variants base,dots,...]
"""

import argparse
import dataclasses
import json
import time

import jax
import numpy as np


def timed(fn, n, *args):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])  # post-compile warmup barrier
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--variants", default="base,dots,grad_only,opt_only,fwd")
    p.add_argument("--v2_bwd", action="store_true",
                   help="use the old v2 backward instead of v3 (A/B)")
    p.add_argument("--bwd_rows", type=int, default=None,
                   help="override the short-attention backward rows/block")
    p.add_argument("--natural_softmax", action="store_true",
                   help="A/B: natural-domain exp softmax in short_attention "
                        "instead of the exp2 fold (round 5)")
    p.add_argument("--f32_dropout", action="store_true",
                   help="A/B: f32-uniform bernoulli at the XLA-level "
                        "dropout sites instead of uint8 thresholds "
                        "(round 5)")
    args = p.parse_args()
    variants = args.variants.split(",")

    from msa_tpu.ops import short_attention as sa
    if args.v2_bwd:
        sa._USE_V3_BWD = False
    if args.bwd_rows is not None:
        sa._V2_BWD_ROWS = args.bwd_rows
    if args.natural_softmax:
        sa._EXP2_SOFTMAX = False
    if args.f32_dropout:
        from msa_tpu.models import bert
        bert._BITS_DROPOUT = False

    from msa_tpu.configs import build_experiment
    from msa_tpu.data.dataset import MultimodalDataset
    from msa_tpu.data.featurize import synthetic_split
    from msa_tpu.training.trainer import Trainer

    exp = build_experiment(dataset="mosi", model_name="bert-large-uncased",
                           num_labels=1, train_batch_size=args.batch_size,
                           compute_dtype="bfloat16", warmup_proportion=0.01)
    trainer = Trainer(exp)
    vdim, sdim = exp.model.visual_dim, exp.model.speech_dim
    split = synthetic_split(args.batch_size, 40, vdim, sdim,
                            vocab_size=exp.model.bert.vocab_size, seed=0)
    ds = MultimodalDataset(split, seed=0)
    batch = trainer._shard_batch(next(ds.epoch_batches(0, args.batch_size,
                                                       drop_last=True)))
    state = trainer.init_state(jax.random.key(0), total_steps=10_000)
    rng = trainer.rng(1)
    results = {}

    copy_state = jax.jit(lambda s: jax.tree.map(lambda x: x + 0, s))

    def time_train_variant(name, **cfg_updates):
        tr = Trainer(dataclasses.replace(
            exp, train=dataclasses.replace(exp.train, **cfg_updates)))
        if "adam_mu_dtype" in cfg_updates or "adam_nu_dtype" in cfg_updates:
            from msa_tpu.training.optim import make_optimizer
            from msa_tpu.training.train_state import TrainState
            tr.tx = make_optimizer(tr.config.train, 10_000)
            run_state = TrainState(
                params=copy_state(state.params),
                opt_state=jax.jit(tr.tx.init)(state.params),
                step=state.step + 0)
        else:
            tr.tx = trainer.tx
            # the step donates its state arg: run on a fresh copy
            run_state = copy_state(state)
        step = tr._build_train_step()
        # warmup twice (donation relayout triggers a 2nd compile)
        for _ in range(2):
            run_state, m = step(run_state, batch, rng)
        float(jax.device_get(m["loss"]))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            run_state, m = step(run_state, batch, rng)
        float(jax.device_get(m["loss"]))
        t = (time.perf_counter() - t0) / args.steps
        results[name] = t
        print(f"{name:24s}: {t*1e3:8.2f} ms/step")

    if "base" in variants:
        time_train_variant("base(remat=full)")
    if "dots" in variants:
        time_train_variant("remat=dots", remat_policy="dots")
    if "noremat" in variants:
        time_train_variant("no remat", remat=False)
    if "unfused" in variants:
        time_train_variant("fuse_text_pass", fuse_text_pass=True)
    if "flash" in variants:
        time_train_variant("flash=always", use_flash_attention="always")
    if "flash_dots" in variants:
        time_train_variant("flash+dots", use_flash_attention="always",
                           remat_policy="dots")
    if "save_small" in variants:
        time_train_variant("remat=save_small", remat_policy="save_small")
    if "mu16" in variants:
        time_train_variant("save_small+mu16", remat_policy="save_small",
                           adam_mu_dtype="bfloat16")
    if "fused16" in variants or "fused16nu" in variants:
        nu = "bfloat16" if "fused16nu" in variants else "float32"
        tr = Trainer(dataclasses.replace(exp, train=dataclasses.replace(
            exp.train, remat_policy="save_small", adam_mu_dtype="bfloat16",
            adam_nu_dtype=nu, fused_optimizer=True)))
        run_state = tr.init_state(jax.random.key(0), 10_000)
        step = tr._build_train_step()
        for _ in range(2):
            run_state, m = step(run_state, batch, rng)
        float(jax.device_get(m["loss"]))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            run_state, m = step(run_state, batch, rng)
        float(jax.device_get(m["loss"]))
        t = (time.perf_counter() - t0) / args.steps
        results[f"fused_adamw(nu={nu})"] = t
        print(f"{'fused_adamw nu=' + nu:24s}: {t*1e3:8.2f} ms/step")
    if "full16" in variants:
        time_train_variant("remat_full+mu16", remat_policy="full",
                           adam_mu_dtype="bfloat16")
    if "attn16" in variants:
        time_train_variant("save_attn+mu16", remat_policy="save_attn",
                           adam_mu_dtype="bfloat16")
    if "attn16u" in variants:
        time_train_variant("save_attn+mu16+unroll24", remat_policy="save_attn",
                           adam_mu_dtype="bfloat16", scan_unroll=24)
    if "attn16u4" in variants:
        time_train_variant("save_attn+mu16+unroll4", remat_policy="save_attn",
                           adam_mu_dtype="bfloat16", scan_unroll=4)
    if "pack16" in variants:
        time_train_variant("save_pack+mu16", remat_policy="save_pack",
                           adam_mu_dtype="bfloat16")
    if "ctx16" in variants:
        time_train_variant("save_ctx+mu16", remat_policy="save_ctx",
                           adam_mu_dtype="bfloat16")
    if "attn16u2" in variants:
        time_train_variant("save_attn+mu16+unroll2", remat_policy="save_attn",
                           adam_mu_dtype="bfloat16", scan_unroll=2)
    if "attn16noscan" in variants:
        time_train_variant("save_attn+mu16+noscan", remat_policy="save_attn",
                           adam_mu_dtype="bfloat16", scan_unroll=0)
    if "attn16nu" in variants:
        time_train_variant("save_attn+mu16+nu16", remat_policy="save_attn",
                           adam_mu_dtype="bfloat16",
                           adam_nu_dtype="bfloat16")
    if "attn16nudrop" in variants:
        time_train_variant("save_attn+drop+mu16+nu16",
                           remat_policy="save_attn+drop",
                           adam_mu_dtype="bfloat16",
                           adam_nu_dtype="bfloat16")
    if "auto16nu" in variants:
        # the bench.py flagship config: whatever rung the auto ladder
        # resolves at this batch size (round-5 B re-sweep under '+drop')
        time_train_variant("auto+mu16+nu16", remat_policy="auto",
                           adam_mu_dtype="bfloat16",
                           adam_nu_dtype="bfloat16")
    if "attnprobs" in variants:
        # '+probs': stash signed post-softmax probs; the short-attention
        # backward skips its softmax+dropout recompute (round-4)
        time_train_variant("save_attn+drop+probs+mu16+nu16",
                           remat_policy="save_attn+drop+probs",
                           adam_mu_dtype="bfloat16",
                           adam_nu_dtype="bfloat16")
    if "ctxprobs" in variants:
        time_train_variant("save_ctx+drop+probs+mu16+nu16",
                           remat_policy="save_ctx+drop+probs",
                           adam_mu_dtype="bfloat16",
                           adam_nu_dtype="bfloat16")
    if "full16nu" in variants:
        time_train_variant("remat_full+mu16+nu16", remat_policy="full",
                           adam_mu_dtype="bfloat16",
                           adam_nu_dtype="bfloat16")
    if "wide16" in variants:
        time_train_variant("save_wide+mu16", remat_policy="save_wide",
                           adam_mu_dtype="bfloat16")
    if "flash_save_small" in variants:
        time_train_variant("flash+save_small", use_flash_attention="always",
                           remat_policy="save_small")

    if "grad_only" in variants or "opt_only" in variants or "fwd" in variants:
        from msa_tpu.models.mmbert import mmbert_forward, mmbert_loss
        from msa_tpu.ops import masking
        cfg = exp.model
        tc = exp.train

        def fwd_loss(params, b, r):
            k_t, k_v, k_s, k_drop = jax.random.split(r, 4)
            ids = b["text_ids"]
            t_ids, t_lab = masking.mask_tokens(k_t, ids, 0.15, trainer.mask_token_id, trainer.special_ids)
            tv_ids, tv_lab = masking.mask_tokens(k_v, ids, 0.15, trainer.mask_token_id, trainer.special_ids)
            ts_ids, ts_lab = masking.mask_tokens(k_s, ids, 0.15, trainer.mask_token_id, trainer.special_ids)
            out = mmbert_forward(params, t_ids, b["text_mask"], tv_ids, ts_ids,
                                 b["visual"], b["speech"], cfg,
                                 deterministic=False, rng=k_drop,
                                 compute_dtype=trainer.compute_dtype,
                                 remat=tc.remat, mlm_scores=False)
            losses = mmbert_loss(params, out, t_lab, tv_lab, ts_lab,
                                 b["visual_ap"], b["speech_ap"], b["target"],
                                 cfg, weights=b["weight"])
            return losses["loss"]

        if "fwd" in variants:
            f = jax.jit(fwd_loss)
            results["fwd+loss"] = timed(f, args.steps, state.params, batch, rng)
            print(f"{'fwd+loss':24s}: {results['fwd+loss']*1e3:8.2f} ms/step")

        if "grad_only" in variants:
            g = jax.jit(jax.grad(fwd_loss))
            dt = timed(lambda p: jax.tree.leaves(g(p, batch, rng))[0].sum(),
                       args.steps, state.params)
            results["grad_only"] = dt
            print(f"{'grad (no optimizer)':24s}: {dt*1e3:8.2f} ms/step")

        if "opt_only" in variants:
            tx = trainer.tx
            grads = jax.jit(jax.grad(fwd_loss))(state.params, batch, rng)

            @jax.jit
            def opt(g, o, p):
                u, no = tx.update(g, o, p)
                np_ = jax.tree.map(lambda a, b: a + b.astype(a.dtype), p, u)
                return jax.tree.leaves(np_)[0].sum()

            dt = timed(opt, args.steps, grads, state.opt_state, state.params)
            results["opt_only"] = dt
            print(f"{'optimizer update only':24s}: {dt*1e3:8.2f} ms/step")

    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
