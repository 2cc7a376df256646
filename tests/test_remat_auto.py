"""The 'auto' remat ladder resolves to the measured-best policy per size."""

import dataclasses

from msa_tpu.configs import build_experiment
from msa_tpu.parallel.mesh import make_mesh
from msa_tpu.training.trainer import Trainer


def _trainer(batch, seq=40, pair=None, model="bert-large-uncased", dp=1):
    exp = build_experiment(dataset="mosi", model_name=model, num_labels=1,
                           train_batch_size=batch)
    exp = dataclasses.replace(
        exp, data=dataclasses.replace(exp.data, max_seq_length=seq,
                                      pair_seq_length=pair))
    return Trainer(exp, mesh=make_mesh(dp, 1))


def test_auto_ladder_word_aligned():
    # measured on 16 GB v5e (BENCH.md rounds 2-3); '+drop' also stashes
    # the bool dropout masks (one more unit) and wins wherever it fits
    assert _trainer(32)._resolve_remat_policy() == "save_attn+drop"
    assert _trainer(96)._resolve_remat_policy() == "save_attn+drop"
    # B=120: the 6th (mask) unit no longer fits the 6 GB budget
    assert _trainer(120)._resolve_remat_policy() == "save_attn"
    assert _trainer(128)._resolve_remat_policy() == "save_ctx+drop"
    assert _trainer(160)._resolve_remat_policy() == "save_ctx+drop"
    # absurdly large: only full recompute fits
    assert _trainer(4096)._resolve_remat_policy() == "full"


def test_auto_ladder_scales_with_mesh():
    # sharded over 8 devices the same global batch stashes 1/8 per chip
    assert _trainer(128, dp=8)._resolve_remat_policy() == "save_attn+drop"


class _FakeDevice:
    def __init__(self, stats):
        self._stats = stats

    def memory_stats(self):
        if isinstance(self._stats, Exception):
            raise self._stats
        return self._stats


def test_stash_budget_from_memory_stats():
    from msa_tpu.training.trainer import _remat_stash_budget
    # real stats: budget scales with bytes_limit (6/16 ratio, v5e-calibrated)
    assert _remat_stash_budget(_FakeDevice({"bytes_limit": 16e9})) == 6e9
    assert _remat_stash_budget(_FakeDevice({"bytes_limit": 32e9})) == 12e9
    assert _remat_stash_budget(_FakeDevice({"bytes_limit": 95e9})) == \
        6.0 / 16.0 * 95e9
    # no stats / raising backend (CPU) -> v5e fallback
    assert _remat_stash_budget(_FakeDevice(None)) == 6e9
    assert _remat_stash_budget(_FakeDevice({})) == 6e9
    assert _remat_stash_budget(_FakeDevice(NotImplementedError())) == 6e9
    # frame-level flash-path calibration: 10/16 (round-5 measured fits)
    assert _remat_stash_budget(
        _FakeDevice({"bytes_limit": 16e9}), frame_level=True) == 10e9
    assert _remat_stash_budget(_FakeDevice(None), frame_level=True) == 10e9


def test_auto_ladder_sweeps_with_hbm(monkeypatch):
    import msa_tpu.training.trainer as trainer_mod
    # On a 32 GB chip B=160 (save_ctx on v5e) fits save_attn...
    monkeypatch.setattr(trainer_mod, "_remat_stash_budget",
                        lambda d, frame_level=False: 12e9)
    assert _trainer(160)._resolve_remat_policy() == "save_attn+drop"
    # ...and on a small chip even B=32 falls off the ladder to full.
    monkeypatch.setattr(trainer_mod, "_remat_stash_budget",
                        lambda d, frame_level=False: 0.5e9)
    assert _trainer(32)._resolve_remat_policy() == "full"


def test_auto_ladder_frame_level():
    # B=16 / Lp=984 (S=1024): the round-5 frame-level calibration admits
    # the 9.85 GB save_attn+drop stash -- the rung the hardware table
    # measured fitting AND winning (721.4 ms; BENCH.md round 5).
    t = _trainer(16, seq=40, pair=984)
    assert t._resolve_remat_policy() == "save_attn+drop"
    # explicit override always wins
    t2 = _trainer(16, seq=40, pair=984)
    t2.config = dataclasses.replace(
        t2.config, train=dataclasses.replace(t2.config.train,
                                             remat_policy="save_attn"))
    assert t2._resolve_remat_policy() == "save_attn"


def test_auto_ladder_frame_level_flash_off_stays_conservative():
    """use_flash='never' (XLA fallback attention) keeps the flagship
    6/16 budget: the 10/16 calibration was measured on the flash2 path."""
    t = _trainer(16, seq=40, pair=984)
    t.config = dataclasses.replace(
        t.config, train=dataclasses.replace(t.config.train,
                                            use_flash_attention="never"))
    assert t._resolve_remat_policy() == "save_ctx+drop"


def test_scan_unroll_auto():
    """scan_unroll None (the default) resolves 0 at frame level on the
    flash path (noscan won every benched length) and 1 elsewhere."""
    assert _trainer(96)._resolve_scan_unroll() == 1
    assert _trainer(16, seq=40, pair=984)._resolve_scan_unroll() == 0
    # explicit value always wins
    t = _trainer(16, seq=40, pair=984)
    t.config = dataclasses.replace(
        t.config, train=dataclasses.replace(t.config.train, scan_unroll=1))
    assert t._resolve_scan_unroll() == 1
    # XLA-fallback attention: calibration doesn't apply, stay on the scan
    t2 = _trainer(16, seq=40, pair=984)
    t2.config = dataclasses.replace(
        t2.config, train=dataclasses.replace(t2.config.train,
                                             use_flash_attention="never"))
    assert t2._resolve_scan_unroll() == 1


def test_auto_ladder_long_frame_level():
    """Lp=2048/4096: the hardware-benched configs resolve to the winning
    save_attn+drop rung (BENCH.md round-5 frame-level table), and the
    ladder still descends once the estimated stash passes the measured
    envelope."""
    assert _trainer(4, seq=40, pair=2048)._resolve_remat_policy() == \
        "save_attn+drop"
    assert _trainer(8, seq=40, pair=2048)._resolve_remat_policy() == \
        "save_attn+drop"
    assert _trainer(4, seq=40, pair=4096)._resolve_remat_policy() == \
        "save_attn+drop"
    assert _trainer(8, seq=40, pair=4096)._resolve_remat_policy() == \
        "save_ctx+drop"
