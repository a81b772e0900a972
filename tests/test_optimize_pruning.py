"""Median-rule pruning in the 'optimize' mode (reference train.py:230-235,
385-390: trial.report/should_prune with optuna's default MedianPruner)."""
import json
import types

import pytest

from diffusion_model_project_tpu.training import train_diffusion as td


def test_median_pruner_prunes_bad_trial():
    pruner = td.MedianPruner(n_startup_trials=1)
    # trial 0 completes with good losses
    r0 = pruner.make_report_fn()
    for e, v in enumerate([1.0, 0.5, 0.2]):
        r0(e, v)
    pruner.complete_trial(r0)
    # trial 1 is much worse than the epoch-0 median -> pruned immediately
    r1 = pruner.make_report_fn()
    with pytest.raises(td.TrialPruned):
        r1(0, 2.0)


def test_median_pruner_keeps_good_trial_and_respects_startup():
    pruner = td.MedianPruner(n_startup_trials=2)
    # with fewer than n_startup_trials completed, nothing prunes
    r0 = pruner.make_report_fn()
    for e in range(3):
        r0(e, 100.0)
    pruner.complete_trial(r0)
    r1 = pruner.make_report_fn()
    for e in range(3):
        r1(e, 99.0)  # only 1 completed < 2 startup: no pruning
    pruner.complete_trial(r1)
    # now pruning is armed; a better-than-median trial survives
    r2 = pruner.make_report_fn()
    for e in range(3):
        r2(e, 1.0)
    pruner.complete_trial(r2)
    # best-so-far semantics: an early good epoch protects later bad ones
    r3 = pruner.make_report_fn()
    r3(0, 0.5)
    r3(1, 500.0)  # best so far 0.5 < median -> no prune


def test_optimize_wires_pruning_and_records_state(tmp_path, monkeypatch):
    """A bad trial raises TrialPruned through report_fn and study.json
    records it as PRUNED (reference study statistics, train.py:392-407)."""
    curves = {0: [1.0, 0.9, 0.8], 1: [5.0, 5.0, 5.0], 2: [0.5, 0.4, 0.3]}
    calls = {"n": 0}

    def fake_train(args, tr, va, te, report_fn=None, **kw):
        idx = calls["n"]
        calls["n"] += 1
        last = None
        for e, v in enumerate(curves[idx]):
            if report_fn is not None:
                report_fn(e, v)
            last = v
        return last, last

    monkeypatch.setattr(td, "train", fake_train)
    args = types.SimpleNamespace(
        save_dir=str(tmp_path), n_trials=3,
        range_batch_size=(1, 2), range_kernel_size=(3, 5), range_level=(2, 3),
        range_learning_rate=(1e-4, 1e-2), top_bottom=True,
        top_feature_channels=8, bottom_feature_channels=32,
    )
    results = td.optimize(args, lambda a: [(None, None, None)],
                          n_startup_trials=1)
    states = [r["state"] for r in results]
    assert states == ["COMPLETE", "PRUNED", "COMPLETE"]
    with open(tmp_path / "study.json") as f:
        saved = json.load(f)
    assert [r["state"] for r in saved] == states
    import math
    assert math.isnan(saved[1]["value"])
