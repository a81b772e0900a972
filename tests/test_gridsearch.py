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
