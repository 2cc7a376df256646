"""Training CLI -- preserves the reference's flag surface (train.py:24-41)
plus TPU-native knobs.

    python -m msa_tpu.cli.train --dataset mosi --num_labels 7 \
        --alpha 0.4 --beta 0.7 --vocab vocab.txt --data_pkl cmu_mosi.pkl

Without ``--data_pkl`` a synthetic dataset of ``--synthetic N`` examples is
generated (smoke tests / benchmarking without the CMU SDK downloads).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
from typing import Optional, Tuple

import jax
import numpy as np

from ..configs import MODALITY_DIMS, build_experiment
from ..data.dataset import MultimodalDataset
from ..data.featurize import featurize, synthetic_split
from ..data.wordpiece import Tokenizer
from ..training.trainer import Trainer
from ..utils.logging import get_logger, make_date_dir


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    # reference flag surface (train.py:24-41)
    p.add_argument("--dataset", type=str, choices=["mosi", "mosei", "ur_funny"],
                   default="mosei")
    p.add_argument("--emotion", type=str, default="sentiment")
    p.add_argument("--num_labels", type=int, default=1)
    p.add_argument("--model", type=str,
                   choices=["bert-base-uncased", "bert-large-uncased", "tiny"],
                   default="bert-large-uncased")
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--warmup_proportion", type=float, default=0.1)
    p.add_argument("--n_epochs", type=int, default=200)
    p.add_argument("--train_batch_size", type=int, default=32)
    p.add_argument("--val_batch_size", type=int, default=4)
    p.add_argument("--test_batch_size", type=int, default=8)
    p.add_argument("--gradient_accumulation_step", type=int, default=1)
    # --mlm was type=bool in the reference (always truthy); make it sane.
    p.add_argument("--mlm", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--mlm_probability", type=float, default=0.15)
    p.add_argument("--max_seq_length", type=int, default=40)
    p.add_argument("--pair_seq_length", type=int, default=None,
                   help="frame-level mode: keep visual/speech at native "
                        "frame rate with this fixed length Lp (joint pass "
                        "runs over max_seq_length + Lp tokens); default: "
                        "word-aligned, Lp == max_seq_length")
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--beta", type=float, default=1.0)
    # msa_tpu additions
    p.add_argument("--data_pkl", type=str, default=None,
                   help="pickle from preprocessing (cmu_<dataset>.pkl)")
    p.add_argument("--vocab", type=str, default=None,
                   help="BERT wordpiece vocab.txt (required with --data_pkl)")
    p.add_argument("--pretrained", type=str, default=None,
                   help="torch state_dict file (.pt/.bin) OR a model name "
                        "like bert-large-uncased (resolved via the HF "
                        "cache/network; see scripts/fetch_bert_weights.py "
                        "for offline hosts)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic examples instead of real data")
    p.add_argument("--checkpoint_root", type=str, default="./model_save")
    p.add_argument("--numpy_root", type=str, default="./numpy_save")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--dp", type=int, default=-1, help="data-parallel size")
    p.add_argument("--mp", type=int, default=1, help="model-parallel size")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--use_flash_attention", type=str, default="auto",
                   choices=["auto", "always", "never"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu); default: auto")
    # multi-process (multi-host) launch: every process runs this CLI with
    # the same flags plus its own --process_id; jax.distributed.initialize
    # runs before any device use.  On TPU pods with auto-detection
    # (megascale env), pass --distributed alone.
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize (auto-detect)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="coordinator address host:port (manual multi-process)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def load_splits(args) -> Tuple[MultimodalDataset, MultimodalDataset,
                               MultimodalDataset, Optional[Tokenizer]]:
    vdim, sdim = MODALITY_DIMS[args.dataset]
    if args.data_pkl:
        if not args.vocab:
            sys.exit("--vocab is required with --data_pkl")
        from ..data.fast_wordpiece import FastTokenizer
        tokenizer = FastTokenizer(args.vocab)  # native path, python fallback
        with open(args.data_pkl, "rb") as f:
            data = pickle.load(f)
        splits = []
        for name in ("train", "val", "test"):
            fs = featurize(data[name], tokenizer, args.max_seq_length, vdim,
                           sdim, args.dataset, args.emotion, args.num_labels,
                           pair_seq_length=args.pair_seq_length)
            splits.append(MultimodalDataset(fs, seed=args.seed))
        return splits[0], splits[1], splits[2], tokenizer
    n = args.synthetic or 256
    mk = lambda n_, s: MultimodalDataset(
        synthetic_split(n_, args.max_seq_length, vdim, sdim,
                        num_labels=args.num_labels, seed=s,
                        pair_seq_length=args.pair_seq_length), seed=s)
    return mk(n, 0), mk(max(n // 8, 8), 1), mk(max(n // 8, 8), 2), None


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.distributed or args.coordinator or args.num_processes:
        from ..parallel.distributed import initialize, process_env_defaults
        env = process_env_defaults()
        initialize(
            coordinator_address=args.coordinator or env["coordinator_address"],
            num_processes=(args.num_processes
                           if args.num_processes is not None
                           else env["num_processes"]),
            process_id=(args.process_id if args.process_id is not None
                        else env["process_id"]))
    logger, _ = get_logger("./logs")
    if jax.process_count() > 1:
        logger.info("Distributed: process %d/%d, %d local of %d global devices",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
    logger.info("Alpha: %s Beta: %s", args.alpha, args.beta)

    train_ds, val_ds, test_ds, tokenizer = load_splits(args)
    logger.info("Split sizes: train %d val %d test %d",
                len(train_ds), len(val_ds), len(test_ds))

    exp = build_experiment(
        dataset=args.dataset, model_name=args.model,
        num_labels=args.num_labels, emotion=args.emotion,
        alpha=args.alpha, beta=args.beta,
        learning_rate=args.learning_rate,
        warmup_proportion=args.warmup_proportion,
        n_epochs=args.n_epochs,
        train_batch_size=args.train_batch_size,
        val_batch_size=args.val_batch_size,
        test_batch_size=args.test_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_step,
        data_parallel=args.dp, model_parallel=args.mp,
        compute_dtype=args.compute_dtype,
        use_flash_attention=args.use_flash_attention,
        seed=args.seed,
    )
    import dataclasses
    exp = dataclasses.replace(
        exp, data=dataclasses.replace(
            exp.data, dataset=args.dataset, mlm=args.mlm,
            mlm_probability=args.mlm_probability,
            max_seq_length=args.max_seq_length,
            pair_seq_length=args.pair_seq_length,
            num_labels=args.num_labels))

    mask_kwargs = {}
    if tokenizer is not None:
        mask_kwargs = dict(mask_token_id=tokenizer.mask_token_id,
                           special_ids=tuple(tokenizer.special_token_ids()))
    trainer = Trainer(exp, **mask_kwargs)
    logger.info("Mesh: %s", dict(trainer.mesh.shape))

    steps_per_epoch = train_ds.num_batches(args.train_batch_size)
    total_steps = steps_per_epoch * args.n_epochs

    pretrained = None
    if args.pretrained:
        from ..models.weights import resolve_pretrained
        logger.info("Loading pretrained weights: %s", args.pretrained)
        pretrained = resolve_pretrained(args.pretrained)

    state = trainer.init_state(jax.random.key(args.seed), total_steps, pretrained)
    start_epoch = 0
    resume_result = None
    if args.resume:
        from ..training.checkpoint import (
            load_checkpoint_auto, resolve_checkpoint,
        )
        from ..training.trainer import FitResult
        ckpt = resolve_checkpoint(args.resume)  # run dir or direct epoch dir
        state, meta = load_checkpoint_auto(ckpt, state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        if "fit" in meta:  # restore best_*/patience/history, not just weights
            resume_result = FitResult.from_meta(meta["fit"], ckpt)
        logger.info("Resumed from %s at step %s (epoch %d)", ckpt,
                    meta.get("step"), start_epoch)

    if jax.process_count() > 1:
        # every process must agree on the checkpoint dir (the orbax save is
        # collective), so the collision-probing make_date_dir is replaced
        # by a deterministic name
        import datetime
        ckpt_dir = os.path.join(
            args.checkpoint_root,
            f"dist-{datetime.datetime.now().strftime('%Y%m%d')}"
            f"-seed{args.seed}")
        os.makedirs(ckpt_dir, exist_ok=True)
    else:
        ckpt_dir = make_date_dir(args.checkpoint_root)
    logger.info("Model save path: %s", ckpt_dir)
    state, result = trainer.fit(state, train_ds, val_ds, test_ds, logger,
                                checkpoint_dir=ckpt_dir,
                                start_epoch=start_epoch,
                                resume_result=resume_result)

    if result.best_preds is not None and jax.process_index() == 0:
        np_dir = make_date_dir(args.numpy_root)
        np.save(os.path.join(np_dir, "predict.npy"), result.best_preds)
        np.save(os.path.join(np_dir, "target.npy"), result.best_labels)
        logger.info("Saved predictions to %s", np_dir)
    return result


if __name__ == "__main__":
    main()
