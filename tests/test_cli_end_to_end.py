"""CLI end-to-end: reference-format pickle -> train -> sample -> score."""

import json
import os
import pickle

import numpy as np
import pytest

from msa_tpu.data.wordpiece import make_test_vocab


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    os.makedirs(d / "out", exist_ok=True)
    return d


@pytest.fixture(scope="module")
def vocab_file(workdir):
    # 30522-line vocab so the tiny preset's real vocab size holds.
    vocab = make_test_vocab()
    path = workdir / "vocab.txt"
    with open(path, "w") as f:
        inv = {v: k for k, v in vocab.items()}
        for i in range(30522):
            f.write(inv.get(i, f"[unused{i}]") + "\n")
    return str(path)


@pytest.fixture(scope="module")
def data_pkl(workdir):
    """Reference pickle format: {'train': [((words, visual, speech), label,
    segment), ...], 'val': ..., 'test': ...} (ref pre_processing.py:134-138)."""
    rng = np.random.default_rng(0)
    words_pool = ["the", "movie", "was", "really", "great", "bad", "not",
                  "good", "plot", "act", "film"]

    def make_split(n, seed):
        r = np.random.default_rng(seed)
        out = []
        for i in range(n):
            k = int(r.integers(3, 9))
            words = np.array(r.choice(words_pool, size=k))
            visual = r.standard_normal((k, 47)).astype(np.float32)
            speech = r.standard_normal((k, 74)).astype(np.float32)
            label = np.array([[float(r.uniform(-3, 3))]])
            out.append(((words, visual, speech), label, f"vid{i}[{i}]"))
        return out

    path = workdir / "cmu_mosi.pkl"
    with open(path, "wb") as f:
        pickle.dump({"train": make_split(16, 1), "val": make_split(8, 2),
                     "test": make_split(8, 3)}, f)
    return str(path)


def test_train_sample_score_pipeline(workdir, vocab_file, data_pkl, monkeypatch):
    from msa_tpu.cli.train import main as train_main
    monkeypatch.chdir(workdir)

    result = train_main([
        "--platform", "cpu", "--dataset", "mosi", "--num_labels", "7",
        "--model", "tiny", "--data_pkl", data_pkl, "--vocab", vocab_file,
        "--n_epochs", "2", "--train_batch_size", "8", "--val_batch_size", "8",
        "--test_batch_size", "8", "--compute_dtype", "float32", "--dp", "1",
        "--checkpoint_root", str(workdir / "model_save"),
        "--numpy_root", str(workdir / "numpy_save"),
    ])
    assert result.best_preds is not None
    assert len(result.history) == 2

    # checkpoint artifacts: run dir holds one epoch_NNN subdir per
    # val-acc improvement (ref keeps model_<epoch>.pt per improvement)
    from msa_tpu.training.checkpoint import (
        list_epoch_checkpoints, resolve_checkpoint,
    )
    ckpts = sorted(os.listdir(workdir / "model_save"))
    assert ckpts
    ckpt = str(workdir / "model_save" / ckpts[-1])
    epochs = list_epoch_checkpoints(ckpt)
    assert result.best_epoch in epochs
    best = resolve_checkpoint(ckpt)
    assert os.path.exists(os.path.join(best, "state.msgpack"))
    assert os.path.exists(os.path.join(best, "predict.npy"))
    with open(os.path.join(best, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["model"]["num_labels"] == 7
    with open(os.path.join(best, "meta.json")) as f:
        meta = json.load(f)
    assert meta["fit"]["best_epoch"] == result.best_epoch

    # sample CLI reloads checkpoint and scores the pickle's test split
    from msa_tpu.cli.sample import main as sample_main
    preds, labels = sample_main([
        "--checkpoint", ckpt, "--data_pkl", data_pkl, "--vocab", vocab_file,
        "--batch_size", "8", "--platform", "cpu",
    ])
    assert preds.shape[0] == 8

    # score CLI on the dumped arrays
    runs = sorted(os.listdir(workdir / "numpy_save"))
    from msa_tpu.cli.score import main as score_main
    report = score_main(["--path", runs[-1],
                         "--numpy_root", str(workdir / "numpy_save")])
    assert "mae" in report and np.isfinite(report["mae"])


def test_train_cli_ur_funny_synthetic(workdir, monkeypatch):
    """UR_FUNNY dims (371/81) + binary classification through the CLI."""
    from msa_tpu.cli.train import main as train_main
    monkeypatch.chdir(workdir)
    result = train_main([
        "--platform", "cpu", "--dataset", "ur_funny", "--num_labels", "2",
        "--emotion", "humor", "--model", "tiny", "--synthetic", "16",
        "--n_epochs", "1", "--train_batch_size", "8", "--val_batch_size", "8",
        "--test_batch_size", "8", "--compute_dtype", "float32", "--dp", "1",
        "--max_seq_length", "16",
        "--checkpoint_root", str(workdir / "ms2"),
        "--numpy_root", str(workdir / "np2"),
    ])
    assert len(result.history) == 1
    assert set(np.unique(result.best_preds)).issubset({0, 1})


def test_preprocess_output_feeds_train_unchanged(workdir, vocab_file,
                                                 monkeypatch):
    """Round-3 VERDICT item 7 (real-data seam): a fake aligned-SDK dataset
    run through the REAL preprocessing segment loop (prepare_segments +
    save_pickle == cli/preprocess minus the mmsdk download/align) must feed
    cli/train unchanged, down to the MISA report.  The day cmu_mosi.pkl is
    reachable this is the exact runbook (ref pre_processing.py:121-138 ->
    train.py:245-250)."""
    from msa_tpu.data.preprocessing.cmu import prepare_segments, save_pickle

    fields = {"label": "lbl", "text": "txt", "visual": "vis", "speech": "spc"}
    words_pool = ["the", "movie", "was", "really", "great", "bad", "not",
                  "good", "plot", "act", "film", "sp"]  # incl. pause token

    rng = np.random.default_rng(11)
    dataset = {f: {} for f in fields.values()}
    vids = [f"train{i}" for i in range(8)] + ["valA", "valB", "testA", "testB"]
    for vid in vids:
        for seg_i in range(2):
            seg = f"{vid}[{seg_i}]"
            k = int(rng.integers(4, 9))
            words = np.array([[w.encode()] for w in
                              rng.choice(words_pool, size=k)], dtype=object)
            dataset["txt"][seg] = {"features": words}
            dataset["vis"][seg] = {"features": rng.standard_normal((k, 47))}
            dataset["spc"][seg] = {"features": rng.standard_normal((k, 74))}
            dataset["lbl"][seg] = {
                "features": np.array([[float(rng.uniform(-3, 3))]])}

    train, val, test = prepare_segments(
        dataset, fields, [f"train{i}" for i in range(8)],
        ["valA", "valB"], ["testA", "testB"])
    assert len(train) == 16 and len(val) == 4 and len(test) == 4
    pkl = str(workdir / "cmu_mosi_preprocessed.pkl")
    save_pickle(train, val, test, pkl)

    from msa_tpu.cli.train import main as train_main
    monkeypatch.chdir(workdir)
    result = train_main([
        "--platform", "cpu", "--dataset", "mosi", "--num_labels", "1",
        "--model", "tiny", "--data_pkl", pkl, "--vocab", vocab_file,
        "--n_epochs", "1", "--train_batch_size", "8", "--val_batch_size", "4",
        "--test_batch_size", "4", "--compute_dtype", "float32", "--dp", "1",
        "--checkpoint_root", str(workdir / "ms3"),
        "--numpy_root", str(workdir / "np3"),
    ])
    assert result.best_preds is not None and len(result.best_preds) == 4

    from msa_tpu.metrics.scores import misa_report
    report = misa_report(result.best_labels, result.best_preds)
    for key in ("mae", "corr", "acc7", "acc2_posneg", "f1_posneg"):
        assert key in report and np.isfinite(report[key]), key
