"""TPE sampler for 'optimize' (training/tpe.py) — the reference's actual
searcher is optuna.create_study's DEFAULT TPESampler (reference
train.py:376-407); rounds 1-2 shipped log-uniform random search instead.

The headline test here is the VERDICT r3-#7 done-criterion: on a seeded
synthetic objective over the real 4-dim search space, TPE's best-of-N beats
random search's best-of-N at equal trial budgets.
"""
import math

import pytest

from diffusion_model_project_tpu.training.tpe import (
    Dim, RandomSampler, TPESampler)


def _space():
    """The real diffusion search space shape (utils/config.py defaults are
    wider; these are the study ranges the reference README sweeps)."""
    return [
        Dim("batch_size", 1, 8, integer=True),
        Dim("kernel_size", 3, 7, integer=True, step=2),
        Dim("levels", 2, 5, integer=True),
        Dim("learning_rate", 1e-5, 1e-1, log=True),
    ]


def _objective(p):
    """Smooth synthetic loss with a clear optimum (lr 3e-3, levels 4,
    kernel 3, batch 4) and a log-scale lr bowl — the landscape family the
    real study walks."""
    return (
        (math.log10(p["learning_rate"]) - math.log10(3e-3)) ** 2
        + 0.15 * (p["levels"] - 4) ** 2
        + 0.05 * ((p["kernel_size"] - 3) / 2) ** 2
        + 0.02 * (p["batch_size"] - 4) ** 2
    )


def _run_study(sampler, n_trials):
    history, best = [], math.inf
    for t in range(n_trials):
        params = sampler.suggest(t, history)
        value = _objective(params)
        history.append((params, value))
        best = min(best, value)
    return best, history


def test_dims_respect_bounds_grids_and_log():
    space = _space()
    tpe = TPESampler(space, seed=7, n_startup_trials=5)
    history = []
    for t in range(40):
        p = tpe.suggest(t, history)
        assert 1 <= p["batch_size"] <= 8
        assert float(p["batch_size"]).is_integer()
        assert p["kernel_size"] in (3.0, 5.0, 7.0)  # odd grid, step 2
        assert 2 <= p["levels"] <= 5 and float(p["levels"]).is_integer()
        assert 1e-5 <= p["learning_rate"] <= 1e-1
        history.append((p, _objective(p)))


def test_suggest_is_pure_function_of_seed_trial_history():
    """The crash-safety contract: a resumed study that replays the recorded
    history re-draws identical params — no shared RNG stream position."""
    space = _space()
    a = TPESampler(space, seed=2024, n_startup_trials=3)
    _, history = _run_study(a, 20)
    # fresh sampler object, same (seed, trial_idx, history) -> same draw,
    # both in the startup phase and deep in the TPE phase
    b = TPESampler(space, seed=2024, n_startup_trials=3)
    for t in (0, 2, 5, 19):
        assert b.suggest(t, history[:t]) == history[t][0]
    # different seed -> different draws (the seed actually feeds the RNG)
    c = TPESampler(space, seed=1, n_startup_trials=3)
    assert any(c.suggest(t, history[:t]) != history[t][0] for t in range(20))


def test_pruned_nan_trials_are_ignored_by_the_fit():
    space = _space()
    tpe = TPESampler(space, seed=0, n_startup_trials=2)
    history = [({"batch_size": 4, "kernel_size": 3, "levels": 4,
                 "learning_rate": 3e-3}, float("nan"))] * 10
    # all-NaN history: must fall back to random draws, not crash
    p = tpe.suggest(15, history)
    assert 1e-5 <= p["learning_rate"] <= 1e-1


def test_tpe_beats_random_at_equal_budget():
    """VERDICT r3 #7 done-criterion. Averaged over several seeds so the win
    is the estimator's, not one lucky draw; per-seed regressions are allowed
    (random search gets lucky sometimes) but the mean must favor TPE."""
    space = _space()
    n_trials = 40
    tpe_bests, rnd_bests = [], []
    for seed in range(5):
        tpe_best, _ = _run_study(
            TPESampler(space, seed=seed, n_startup_trials=10), n_trials)
        rnd_best, _ = _run_study(RandomSampler(space, seed=seed), n_trials)
        tpe_bests.append(tpe_best)
        rnd_bests.append(rnd_best)
    mean_tpe = sum(tpe_bests) / len(tpe_bests)
    mean_rnd = sum(rnd_bests) / len(rnd_bests)
    assert mean_tpe < mean_rnd, (tpe_bests, rnd_bests)


def test_tpe_concentrates_near_the_optimum():
    """After the startup phase the sampler should spend most of its draws in
    the good lr region — the qualitative TPE behavior (exploitation of l/g)."""
    space = _space()
    tpe = TPESampler(space, seed=3, n_startup_trials=10)
    _, history = _run_study(tpe, 60)
    late = [p["learning_rate"] for p, _ in history[30:]]
    close = [lr for lr in late if 3e-4 <= lr <= 3e-2]  # one decade around opt
    # log-uniform random would land ~25% of draws in this decade (4 decades)
    assert len(close) / len(late) > 0.5, sorted(late)


def test_random_sampler_matches_reference_space_semantics():
    space = _space()
    rnd = RandomSampler(space, seed=11)
    draws = [rnd.suggest(t, []) for t in range(300)]
    lrs = [d["learning_rate"] for d in draws]
    # log-uniform: roughly equal mass per decade across [1e-5, 1e-1]
    for lo_exp in (-5, -4, -3, -2):
        frac = sum(1 for lr in lrs if 10 ** lo_exp <= lr < 10 ** (lo_exp + 1)
                   ) / len(lrs)
        assert 0.15 < frac < 0.35, (lo_exp, frac)
    # integer dims cover their grids
    assert {d["kernel_size"] for d in draws} == {3, 5, 7}
    assert {d["levels"] for d in draws} == {2, 3, 4, 5}


def test_misaligned_integer_range_stays_on_grid():
    """A [3, 6] step-2 kernel range must yield only {3, 5} — the reference's
    suggest_int(step=2)/randrange semantics — never 6 (off-grid) or 7
    (out of range). Regression for the round-3 review finding."""
    d = Dim("kernel_size", 3, 6, integer=True, step=2)
    import random as pyrandom
    rng = pyrandom.Random(0)
    assert {d.random(rng) for _ in range(200)} == {3, 5}
    # TPE-phase draws go through _from_internal: probe the whole range
    assert {d._from_internal(z) for z in
            [2.0, 3.0, 3.9, 4.1, 5.0, 5.9, 6.0, 7.5]} == {3, 5}
    tpe = TPESampler([d, Dim("lr", 1e-4, 1e-2, log=True)], seed=0,
                     n_startup_trials=2)
    history = []
    for t in range(30):
        p = tpe.suggest(t, history)
        assert p["kernel_size"] in (3, 5), p
        history.append((p, (p["kernel_size"] - 3) ** 2))


def test_duplicate_dim_names_rejected():
    with pytest.raises(ValueError, match="duplicate"):
        TPESampler([Dim("x", 0, 1), Dim("x", 0, 1)])
    with pytest.raises(ValueError, match="log dim"):
        Dim("lr", 0.0, 1.0, log=True)
