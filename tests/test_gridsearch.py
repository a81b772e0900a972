"""Grid-search driver (gridsearch_diffusion.py): the crash-safe results.csv
ledger, resume-by-run-name skip, and top10/summary reports, driven end to end
on a monkeypatched 2-combo tiny grid (the real 16-combo GRID's shapes are
covered by the dry-run smoke + published-scale parity suites)."""
import csv
import os
import os.path as osp
import sys

import numpy as np

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, REPO)

TINY_GRID = [
    {"features": [8, 16], "learning_rate": 1e-3, "kernel_size": 3,
     "attention": "", "dropout": 0.0, "time_embedding_dim": 16},
    {"features": [8, 16], "learning_rate": 1e-4, "kernel_size": 3,
     "attention": "", "dropout": 0.0, "time_embedding_dim": 16},
]


def test_gridsearch_ledger_resume_and_reports(
        shared_data_dir, shared_stage1_dir, shared_stage2_dir, tmp_path,
        monkeypatch, capsys):
    import gridsearch_diffusion as gs

    monkeypatch.setattr(gs, "GRID", TINY_GRID)
    save_dir = str(tmp_path / "grid")
    argv = [
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        "--in-channels", "9", "--out-channels", "4",
        "--batch-size", "2", "--epochs", "1",
        "--num-slices", "3", "--num-timesteps", "20",
        "--vae-encoder-path", shared_stage2_dir,
        "--vae-decoder-path", shared_stage1_dir,
    ]
    gs.main(argv)

    results_csv = osp.join(save_dir, "results.csv")
    with open(results_csv) as f:
        rows = list(csv.DictReader(f))
    assert [r["run_name"] for r in rows] == [gs.run_name(c) for c in TINY_GRID]
    for r in rows:
        assert np.isfinite(float(r["val_loss"]))
    assert osp.exists(osp.join(save_dir, "top10.csv"))
    assert osp.exists(osp.join(save_dir, "summary.txt"))

    # resume: a second invocation must skip every completed combo (ledger
    # unchanged, no new run dirs) and still regenerate the reports
    mtime = os.path.getmtime(results_csv)
    gs.main(argv)
    with open(results_csv) as f:
        assert len(list(csv.DictReader(f))) == len(TINY_GRID)
    assert os.path.getmtime(results_csv) == mtime

    # --grid-index shards a single combo (already-complete -> pure skip)
    gs.main(argv + ["--grid-index", "1"])
    with open(results_csv) as f:
        assert len(list(csv.DictReader(f))) == len(TINY_GRID)

    # an INTERRUPTED combo (run dir with train_state.msgpack but no ledger
    # row) resumes full-state in place instead of retraining: drop combo 1's
    # row, re-run, and the recorded losses must match the original training
    capsys.readouterr()
    with open(results_csv) as f:
        all_rows = list(csv.DictReader(f))
    with open(results_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=all_rows[0].keys())
        w.writeheader()
        w.writerow(all_rows[0])
    gs.main(argv + ["--grid-index", "1"])
    out = capsys.readouterr().out
    assert "[resume]" in out
    with open(results_csv) as f:
        rows2 = list(csv.DictReader(f))
    assert len(rows2) == len(TINY_GRID)
    np.testing.assert_allclose(float(rows2[1]["val_loss"]),
                               float(all_rows[1]["val_loss"]))


TINY_STACKS = ([8, 16],)


def _stub_cfgize(monkeypatch, gs):
    """Tiny TPE space + instant stub trainer: deterministic value per name."""
    monkeypatch.setattr(gs, "FEATURE_STACKS", TINY_STACKS)

    def stub(cfg, args, name=None):
        name = name or gs.run_name(cfg)
        return {"run_name": name, "features": "[8, 16]",
                "learning_rate": cfg["learning_rate"],
                "train_loss": cfg["learning_rate"] * 2,
                "val_loss": cfg["learning_rate"],  # lower lr "wins"
                "wall_time_s": 0.0}

    monkeypatch.setattr(gs, "train_single_config", stub)


def test_tpe_search_resume_redraws_identically(tmp_path, monkeypatch):
    """--algo tpe, VERDICT r3 item 7: suggest() is pure in (seed, trial,
    history), so a crashed search resumed against the same results.csv must
    REPLAY trials 0..k-1 to identical params/names and continue from k."""
    import gridsearch_diffusion as gs

    _stub_cfgize(monkeypatch, gs)
    save_dir = str(tmp_path / "tpe")
    base = ["--root-dir", "/nonexistent-not-read-by-stub",
            "--save-dir", save_dir, "--algo", "tpe", "--tpe-seed", "7"]

    # crash after 3 trials: count down inside the stub
    calls = {"n": 0}
    real_stub = gs.train_single_config

    def crashing(cfg, args, name=None):
        if calls["n"] == 3:
            raise KeyboardInterrupt("simulated crash")
        calls["n"] += 1
        return real_stub(cfg, args, name)

    monkeypatch.setattr(gs, "train_single_config", crashing)
    with np.testing.assert_raises(KeyboardInterrupt):
        gs.main(base + ["--n-trials", "6"])

    results_csv = osp.join(save_dir, "results.csv")
    with open(results_csv) as f:
        rows1 = [r["run_name"] for r in csv.DictReader(f)]
    # the tpe seed is part of the name (round-4 advisor: two seeds' searches
    # in one save dir must not collide through the 1-sig-digit lr rendering)
    assert len(rows1) == 3 and all(r.startswith("tpe-s7-0") for r in rows1)

    # resume: trials 0-2 must redraw to the SAME names (pure skip), 3-5 run
    monkeypatch.setattr(gs, "train_single_config", real_stub)
    gs.main(base + ["--n-trials", "6"])
    with open(results_csv) as f:
        rows2 = [r["run_name"] for r in csv.DictReader(f)]
    assert rows2[:3] == rows1
    assert len(rows2) == 6
    assert [int(r.split("-")[2]) for r in rows2] == list(range(6))
    assert osp.exists(osp.join(save_dir, "top10.csv"))

    # a third invocation is a complete no-op on the ledger
    mtime = os.path.getmtime(results_csv)
    gs.main(base + ["--n-trials", "6"])
    assert os.path.getmtime(results_csv) == mtime


def test_tpe_search_smoke_cli(shared_data_dir, shared_stage1_dir,
                              shared_stage2_dir, tmp_path, monkeypatch):
    """Real 2-trial TPE run through the actual trainer (tiny config)."""
    import gridsearch_diffusion as gs

    monkeypatch.setattr(gs, "FEATURE_STACKS", TINY_STACKS)
    monkeypatch.setattr(
        gs, "_fixed_cfg",
        lambda features, lr: {"features": list(features),
                              "learning_rate": float(lr), "kernel_size": 3,
                              "attention": "", "dropout": 0.0,
                              "time_embedding_dim": 16})
    save_dir = str(tmp_path / "tpe_real")
    gs.main([
        "--root-dir", shared_data_dir, "--save-dir", save_dir,
        "--in-channels", "9", "--out-channels", "4",
        "--batch-size", "2", "--epochs", "1",
        "--num-slices", "3", "--num-timesteps", "20",
        "--vae-encoder-path", shared_stage2_dir,
        "--vae-decoder-path", shared_stage1_dir,
        "--algo", "tpe", "--n-trials", "2",
    ])
    with open(osp.join(save_dir, "results.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    for r in rows:
        assert np.isfinite(float(r["val_loss"]))
