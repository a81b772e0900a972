"""Median-rule pruning in the 'optimize' mode (reference train.py:230-235,
385-390: trial.report/should_prune with optuna's default MedianPruner)."""
import json

import pytest

from diffusion_model_project_tpu.training import train_diffusion as td


def _optimize_args(tmp_path, n_trials):
    """Real-parser args (optimize() runs process_args on them to build the
    run-dir match key; a SimpleNamespace lacks the full flag surface)."""
    from diffusion_model_project_tpu.utils.config import parser

    return parser.parse_args([
        "--root-dir", "unused", "--save-dir", str(tmp_path),
        "--in-channels", "17", "--out-channels", "8",
        "--n-trials", str(n_trials),
        "--range-batch-size", "1", "2",
        "--range-kernel-size", "3", "5",
        "--range-level", "2", "3",
        "--range-learning-rate", "1e-4", "1e-2",
        "--top-feature-channels", "8",
    ])


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
    args = _optimize_args(tmp_path, 3)
    results = td.optimize(args, lambda a: [(None, None, None)],
                          n_startup_trials=1)
    states = [r["state"] for r in results]
    assert states == ["COMPLETE", "PRUNED", "COMPLETE"]
    with open(tmp_path / "study.json") as f:
        saved = json.load(f)
    assert [r["state"] for r in saved] == states
    import math
    assert math.isnan(saved[1]["value"])


def test_optimize_study_resumes_crash_safe(tmp_path, monkeypatch):
    """A restarted study skips recorded trials (identical params via RNG
    replay), re-feeds the pruner from persisted intermediates, and resumes an
    interrupted trial in place from its run dir (mirrors the reference's
    Optuna-SQLite trial-granularity resume, train.py:376-390)."""
    import os

    seen = []

    def fake_train(args, tr, va, te, report_fn=None, **kw):
        seen.append({"lr": args.learning_rate, "batch": args.batch_size,
                     "resume": getattr(args, "resume", None),
                     "preloaded": dict(report_fn.intermediates)})
        for e, v in enumerate([1.0, 0.9, 0.8]):
            report_fn(e, v)
        return 0.8, 0.8

    monkeypatch.setattr(td, "train", fake_train)
    args = _optimize_args(tmp_path, 2)
    loaders = lambda a: [(None, None, None)]
    first = td.optimize(args, loaders, n_startup_trials=1)
    assert len(seen) == 2 and len(first) == 2

    # restart with a longer budget: trials 0-1 skip with identical params,
    # and a terrible trial 2 gets PRUNED — which can only happen if the
    # pruner's medians were rebuilt from the persisted intermediates
    def bad_train(args, tr, va, te, report_fn=None, **kw):
        seen.append({"lr": args.learning_rate})
        report_fn(0, 50.0)  # way above the recorded epoch-0 median of 1.0
        return 50.0, 50.0

    monkeypatch.setattr(td, "train", bad_train)
    args.n_trials = 3
    second = td.optimize(args, loaders, n_startup_trials=1)
    assert len(seen) == 3  # only one new train() call
    assert [r["state"] for r in second] == ["COMPLETE", "COMPLETE", "PRUNED"]
    for old, new in zip(first, second):
        assert old["params"] == new["params"]

    # interrupted-trial resume: drop trial 2's record, leave a matching run
    # dir with a train_state.msgpack -> the retry resumes it in place with
    # the prior epochs replayed into the report stream
    with open(tmp_path / "study.json") as f:
        saved = json.load(f)
    p = saved[2]["params"]
    del saved[2]
    with open(tmp_path / "study.json", "w") as f:
        json.dump(saved, f)
    # the dir name a real crashed run would have left: the same run_descr
    # encoding make_log_folder writes, with trial 2's drawn params
    from diffusion_model_project_tpu.utils.config import process_args, run_descr
    args.batch_size = p["batch_size"]
    args.kernel_size = p["kernel_size"]
    args.features = [8 * 2 ** v for v in range(p["levels"])]
    args.learning_rate = p["learning_rate"]
    descr = run_descr(process_args(args), with_epochs=False)
    run = tmp_path / f"20260818_x_latent-diffusion_{descr}-ep-3"
    os.makedirs(run)
    (run / "train_state.msgpack").write_bytes(b"")
    with open(run / "log.json", "w") as f:
        json.dump({"epoch": [0, 1], "val_loss": [3.0, 2.5]}, f)

    monkeypatch.setattr(td, "train", fake_train)
    third = td.optimize(args, loaders, n_startup_trials=1)
    assert seen[-1]["resume"] == str(run)
    assert seen[-1]["preloaded"] == {0: 3.0, 1: 2.5}
    assert [r["state"] for r in third] == ["COMPLETE", "COMPLETE", "COMPLETE"]


def test_find_resumable_run_requires_consistent_pair(tmp_path):
    """Only dirs holding BOTH train_state.msgpack and log.json qualify (a
    state-only dir is a corrupt artifact that must not wedge the crash-safe
    searchers in a retry loop); newest match wins."""
    import os

    a = tmp_path / "20260101_run_a"
    b = tmp_path / "20260102_run_b"
    c = tmp_path / "20260103_run_c"
    for d in (a, b, c):
        os.makedirs(d)
    # a: complete pair, 2 epochs; b: state only (rejected); c: log only
    (a / "train_state.msgpack").write_bytes(b"")
    with open(a / "log.json", "w") as f:
        json.dump({"epoch": [0, 1]}, f)
    (b / "train_state.msgpack").write_bytes(b"")
    with open(c / "log.json", "w") as f:
        json.dump({"epoch": [0]}, f)

    run, done = td.find_resumable_run(str(tmp_path / "*run*"))
    assert run == str(a) and done == 2

    # corrupt log in the newest pair falls through to the next candidate
    (c / "train_state.msgpack").write_bytes(b"")
    with open(c / "log.json", "w") as f:
        f.write("{not json")
    run, done = td.find_resumable_run(str(tmp_path / "*run*"))
    assert run == str(a) and done == 2

    assert td.find_resumable_run(str(tmp_path / "*nomatch*")) == (None, 0)
