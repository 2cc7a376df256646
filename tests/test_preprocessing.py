"""L0 preprocessing logic driven with in-memory fakes (no mmsdk needed).

Covers the pure segment loop of cmu.prepare_segments (pause stripping,
shape/regex/missing-modality drops, fold routing, z-norm, ref
pre_processing.py:57-132) and ur_funny.parse_ur_funny (synthetic SDK
pickles, ref parse_funny.py:16-77).  Round-2 VERDICT weak #2: these were
previously verified only by eyeball.
"""

import pickle

import numpy as np

from msa_tpu.data.preprocessing.cmu import (
    avg_collapse, prepare_segments, save_pickle, znorm,
)
from msa_tpu.data.preprocessing.ur_funny import parse_ur_funny
from msa_tpu.data.preprocessing import ur_funny as ur_funny_mod


FIELDS = {"label": "lbl", "text": "txt", "visual": "vis", "speech": "spc"}


def _words(*ws):
    """mmsdk word features: [T, 1] array of bytes."""
    return np.array([[w.encode()] for w in ws], dtype=object)


def _segment(words, vdim=3, sdim=2, label=0.5, seed=0):
    rng = np.random.default_rng(seed)
    t = len(words)
    return {
        "lbl": {"features": np.array([[label]])},
        "txt": {"features": words},
        "vis": {"features": rng.standard_normal((t, vdim))},
        "spc": {"features": rng.standard_normal((t, sdim))},
    }


def _dataset(segments):
    """{field: {segment: {'features': arr}}} — the dict shape mmsdk's
    aligned dataset exposes to the segment loop."""
    out = {f: {} for f in FIELDS.values()}
    for seg_name, parts in segments.items():
        for field, payload in parts.items():
            out[field][seg_name] = payload
    return out


def test_fold_routing_and_format(capsys):
    segs = {
        "vidA[0]": _segment(_words("hello", "world"), seed=1),
        "vidA[1]": _segment(_words("more", "text"), seed=2),
        "vidB[0]": _segment(_words("val", "clip"), seed=3),
        "vidC[0]": _segment(_words("test", "clip"), seed=4),
        # vid in no fold: silently routed nowhere (ref behavior)
        "vidZ[0]": _segment(_words("lost"), seed=5),
    }
    train, val, test = prepare_segments(
        _dataset(segs), FIELDS, ["vidA"], ["vidB"], ["vidC"])
    assert [e[2] for e in train] == ["vidA[0]", "vidA[1]"]
    assert [e[2] for e in val] == ["vidB[0]"]
    assert [e[2] for e in test] == ["vidC[0]"]
    (words, visual, speech), label, seg = train[0]
    assert list(words) == ["hello", "world"]
    assert visual.shape == (2, 3) and speech.shape == (2, 2)
    assert label.shape == (1, 1) and label[0, 0] == 0.5
    assert "0 datapoints have been dropped" in capsys.readouterr().out


def test_pause_tokens_stripped_rowwise():
    """b'sp' rows vanish from words AND the matching visual/speech rows
    (ref pre_processing.py:107-111)."""
    seg = _segment(_words("sp", "keep", "sp", "also"), seed=7)
    vis_raw = seg["vis"]["features"].copy()
    train, _, _ = prepare_segments(
        _dataset({"v[0]": seg}), FIELDS, ["v"], [], [])
    (words, visual, _), _, _ = train[0]
    assert list(words) == ["keep", "also"]
    # row 1 and 3 survive, z-normed over the SURVIVING rows only
    expect = znorm(vis_raw[[1, 3]])
    np.testing.assert_allclose(visual, expect)


def test_drop_reasons_counted(capsys):
    bad_shape = _segment(_words("a", "b"), seed=8)
    bad_shape["vis"]["features"] = bad_shape["vis"]["features"][:1]  # 1 != 2
    missing = _segment(_words("a"), seed=9)
    del missing["spc"]
    all_pause = _segment(_words("sp", "sp"), seed=10)
    segs = {
        "no_brackets": _segment(_words("x"), seed=11),  # regex fails
        "v[0]": bad_shape,
        "v[1]": missing,
        "v[2]": all_pause,
        "v[3]": _segment(_words("good"), seed=12),
    }
    ds = _dataset(segs)
    # the missing modality must raise KeyError inside, not exist at all
    assert "v[1]" not in ds["spc"]
    train, val, test = prepare_segments(ds, FIELDS, ["v"], [], [])
    assert [e[2] for e in train] == ["v[3]"]
    assert "4 datapoints have been dropped" in capsys.readouterr().out


def test_nan_scrubbed_from_label_and_features():
    seg = _segment(_words("a", "b"), seed=13)
    seg["lbl"]["features"] = np.array([[np.nan]])
    seg["vis"]["features"][0, 0] = np.nan
    train, _, _ = prepare_segments(_dataset(seg and {"v[0]": seg}),
                                   FIELDS, ["v"], [], [])
    (_, visual, _), label, _ = train[0]
    assert label[0, 0] == 0.0
    assert np.isfinite(visual).all()


def test_znorm_formula_and_eps_deviation():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 4))
    np.testing.assert_allclose(
        znorm(x, 1e-6), (x - x.mean(0)) / (1e-6 + x.std(0)), atol=1e-12)
    # eps=0 reproduces the reference exactly (SURVEY section 7 (i)):
    np.testing.assert_allclose(znorm(x, 0.0), (x - x.mean(0)) / x.std(0))
    # constant column: ref's 0/0 -> nan -> nan_to_num -> 0; eps path -> 0 too
    c = np.ones((5, 2))
    with np.errstate(invalid="ignore"):
        assert (znorm(c, 0.0) == 0).all()
    assert (znorm(c, 1e-6) == 0).all()
    # near-constant column: eps=0 amplifies numeric noise to unit variance
    # (z-norm is scale-invariant), eps damps it toward 0 instead
    tiny = np.zeros((4, 1))
    tiny[0, 0] = 1e-12
    with np.errstate(invalid="ignore"):
        assert np.abs(znorm(tiny, 0.0)).max() > 1.0   # ref: full z-scores
    assert np.abs(znorm(tiny, 1e-6)).max() < 1e-3     # eps damps the noise


def test_avg_collapse():
    f = np.array([[1.0, 2.0], [3.0, 4.0]])
    np.testing.assert_allclose(avg_collapse(None, f), [2.0, 3.0])
    assert avg_collapse(None, "unaveragable") == "unaveragable"


def test_save_pickle_roundtrip(tmp_path, capsys):
    out = tmp_path / "cmu_fake.pkl"
    save_pickle([1], [2], [3, 4], str(out))
    data = pickle.load(open(out, "rb"))
    assert data == {"train": [1], "val": [2], "test": [3, 4]}
    assert "Save Complete" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# UR_FUNNY
# ---------------------------------------------------------------------------

def _write_ur_funny_sdk(root, keys, drop_mismatch_key=None):
    rng = np.random.default_rng(0)
    language, covarep, openface, humor = {}, {}, {}, {}
    for i, key in enumerate(keys):
        t = 3 + i
        language[key] = {"punchline_features": [f"w{j}" for j in range(t)]}
        covarep[key] = {"punchline_features":
                        rng.standard_normal((t, 4)).tolist()}
        tv = t + 1 if key == drop_mismatch_key else t
        openface[key] = {"punchline_features":
                         rng.standard_normal((tv, 5)).tolist()}
        humor[key] = i % 2
    folds = {"train": keys[:2], "dev": keys[2:3], "test": keys[3:]}
    for name, obj in (("language_sdk.pkl", language),
                      ("covarep_features_sdk.pkl", covarep),
                      ("openface_features_sdk.pkl", openface),
                      ("humor_label_sdk.pkl", humor),
                      ("data_folds.pkl", folds)):
        with open(root / name, "wb") as f:
            pickle.dump(obj, f)


def test_parse_ur_funny(tmp_path, capsys):
    keys = ["k0", "k1", "k2", "k3", "k4"]
    _write_ur_funny_sdk(tmp_path, keys, drop_mismatch_key="k1")
    train, dev, test = parse_ur_funny(str(tmp_path))
    # k1 dropped for the openface/covarep length mismatch
    assert [e[2] for e in train] == ["k0"]
    assert [e[2] for e in dev] == ["k2"]
    assert [e[2] for e in test] == ["k3", "k4"]
    printed = capsys.readouterr().out
    assert "1 datapoints have been dropped" in printed
    (words, visual, acoustic), label, _ = train[0]
    assert words.shape[0] == visual.shape[0] == acoustic.shape[0] == 3
    assert label.shape == (1, 1) and label.dtype == int
    # z-normed per instance: column means ~0
    np.testing.assert_allclose(visual.mean(0), 0.0, atol=1e-6)


def test_ur_funny_run_writes_pickle(tmp_path):
    keys = ["k0", "k1", "k2", "k3"]
    _write_ur_funny_sdk(tmp_path, keys)
    out = tmp_path / "cmu_ur_funny.pkl"
    ur_funny_mod.run(str(tmp_path), str(out))
    data = pickle.load(open(out, "rb"))
    assert set(data) == {"train", "val", "test"}
    assert len(data["train"]) == 2 and len(data["val"]) == 1
    assert len(data["test"]) == 1
