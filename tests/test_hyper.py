"""TPE hyperparameter search tests (reference hyper.py surface + the TPE
engine itself on a synthetic objective)."""

import json
import os

import numpy as np
import pytest

from dca_tpu.hyper import (
    TPE,
    Choice,
    LogUniform,
    QuantizedUniform,
    Uniform,
    hyper_search,
    reference_space,
    tpu_space,
)

from conftest import make_adata


def test_reference_space_matches_reference():
    space = reference_space(hyperepoch=77)
    assert set(space) == {
        "norm_input_log", "norm_input_zeromean", "norm_input_sf",
        "lr", "ridge", "l1_enc_coef", "hidden_size", "activation",
        "aetype", "batchnorm", "dropout", "input_dropout", "epochs",
    }
    assert space["aetype"].options == ("zinb", "zinb-conddisp")
    assert len(space["hidden_size"].options) == 9
    assert space["epochs"].options == (77,)


def test_tpu_space_is_compile_stable():
    """The TPU space differs from the reference space only in quantizing the
    dropout dims (bounds the number of distinct jit programs per search)."""
    ref, tpu = reference_space(50), tpu_space(50)
    assert set(ref) == set(tpu)
    for k in ref:
        if k in ("dropout", "input_dropout"):
            assert isinstance(tpu[k], QuantizedUniform)
            assert (tpu[k].low, tpu[k].high) == (ref[k].low, ref[k].high)
        else:
            assert tpu[k] == ref[k]
    rs = np.random.RandomState(0)
    draws = [tpu["dropout"].sample(rs) for _ in range(200)]
    assert all(abs(d / 0.05 - round(d / 0.05)) < 1e-9 for d in draws)
    assert all(0.0 <= d <= 0.7 for d in draws)
    assert len(set(draws)) <= 15  # the whole point: a finite grid

    # TPE proposals stay on the grid after the startup phase too
    tpe = TPE({"dropout": tpu["dropout"]}, seed=0, n_startup=5)
    for _ in range(10):
        cfg = tpe.suggest()
        d = cfg["dropout"]
        assert abs(d / 0.05 - round(d / 0.05)) < 1e-9
        tpe.observe(cfg, (d - 0.3) ** 2)


def test_tpe_converges_on_quadratic():
    """TPE must beat random search on a smooth 2-D objective."""
    space = {
        "x": Uniform(-5.0, 5.0),
        "y": LogUniform(1e-3, 1e3),
        "c": Choice(("good", "bad")),
    }

    def objective(cfg):
        penalty = 0.0 if cfg["c"] == "good" else 5.0
        return (cfg["x"] - 2.0) ** 2 + (np.log10(cfg["y"]) - 1.0) ** 2 + penalty

    tpe = TPE(space, seed=0, n_startup=15)
    best = np.inf
    for _ in range(80):
        cfg = tpe.suggest()
        loss = objective(cfg)
        tpe.observe(cfg, loss)
        best = min(best, loss)
    assert best < 0.3, best
    # exploitation: late proposals should focus on the good region
    late = [t["config"] for t in tpe.trials[-20:]]
    assert np.mean([c["c"] == "good" for c in late]) > 0.6


def test_tpe_handles_failures():
    """inf-loss (failed) trials must not poison the model: with loss = x for
    successful trials and failures above 0.6, late proposals still steer
    toward small x."""
    space = {"x": Uniform(0, 1)}
    tpe = TPE(space, seed=1, n_startup=8)
    for _ in range(60):
        cfg = tpe.suggest()
        loss = float("inf") if cfg["x"] > 0.6 else cfg["x"]
        tpe.observe(cfg, loss)
    late = [t["config"]["x"] for t in tpe.trials[-20:]]
    assert all(0 <= x <= 1 for x in late)
    assert np.mean(late) < 0.45, np.mean(late)


def test_hyper_search_end_to_end(tmp_path):
    """Tiny real search over the reference space (2 trials, 1 epoch)."""
    adata = make_adata(60, 15, seed=12)
    best_cfg, best_loss, trials = hyper_search(
        adata,
        n_trials=2,
        hyperepoch=1,
        output_dir=str(tmp_path),
        seed=0,
        verbose=False,
    )
    assert len(trials) == 3  # preflight + the 2 budget trials (ADVICE r4)
    assert best_cfg is not None
    assert np.isfinite(best_loss)
    out = os.path.join(str(tmp_path), "hyperopt_results")
    assert os.path.exists(os.path.join(out, "trials.pickle"))
    with open(os.path.join(out, "best.json")) as f:
        best = json.load(f)
    assert "config" in best and "loss" in best
    assert best["config"]["aetype"] in ("zinb", "zinb-conddisp")


def test_preflight_fails_fast_on_broken_objective(tmp_path):
    """The FIRST objective evaluation is a pre-flight (reference hyper.py:93
    test_fn): a broken space/objective must abort the search with the real
    exception instead of burning trials on swallowed failures."""
    adata = make_adata(30, 10, seed=3)

    def broken(cfg):
        raise RuntimeError("objective misconfigured")

    with pytest.raises(RuntimeError, match="objective misconfigured"):
        hyper_search(adata, n_trials=5, output_dir=str(tmp_path),
                     objective=broken, verbose=False)


def test_post_preflight_failures_still_caught(tmp_path):
    """After the pre-flight, per-trial failures keep being recorded as inf
    (reference catch_eval_exceptions=True) and the search completes."""
    adata = make_adata(30, 10, seed=3)
    calls = []

    def flaky(cfg):
        calls.append(1)
        if len(calls) > 1:
            raise RuntimeError("later trial fails")
        return 1.0

    best_cfg, best_loss, trials = hyper_search(
        adata, n_trials=3, output_dir=str(tmp_path),
        objective=flaky, verbose=False)
    # preflight (outside the budget, reference test_fn contract) + 3 trials
    assert len(trials) == 4
    assert best_loss == 1.0
    assert [t["loss"] for t in trials[1:]] == [float("inf")] * 3


def test_single_chip_two_thread_pipeline(tmp_path):
    """n_parallel=2 engages even when threads outnumber devices (the
    single-chip pipelining mode, VERDICT r4 item 6): trial k+1's host half
    overlaps trial k's execution, results stay deterministic vs the
    sequential search."""
    import time

    adata = make_adata(30, 10, seed=3)

    def slow_objective(cfg):
        time.sleep(0.15)  # stands in for host prep + device wait
        return float(cfg["dropout"])

    def run(n_parallel, sub):
        t0 = time.perf_counter()
        out = hyper_search(adata, n_trials=8, output_dir=str(tmp_path / sub),
                           seed=0, verbose=False, objective=slow_objective,
                           n_parallel=n_parallel)
        return out, time.perf_counter() - t0

    (cfg_s, loss_s, trials_s), t_seq = run(1, "seq")
    (cfg_p, loss_p, trials_p), t_par = run(2, "par")
    assert cfg_p == cfg_s and loss_p == loss_s
    assert [t["config"] for t in trials_p] == [t["config"] for t in trials_s]
    assert t_par < t_seq * 0.85, (t_seq, t_par)


def test_parallel_search_matches_sequential(tmp_path):
    """n_parallel>1 batches suggestions but observes in order: within the
    TPE startup phase (random suggestions independent of observations) a
    seeded parallel search must reproduce the sequential search's trials
    and best config exactly (VERDICT r3 item 9)."""
    adata = make_adata(50, 12, seed=5)
    import time

    def run(n_parallel, sub):
        t0 = time.perf_counter()
        best_cfg, best_loss, trials = hyper_search(
            adata, n_trials=6, hyperepoch=1,
            output_dir=str(tmp_path / sub), seed=0, verbose=False,
            n_parallel=n_parallel)
        return best_cfg, best_loss, trials, time.perf_counter() - t0

    cfg_s, loss_s, trials_s, t_seq = run(1, "seq")
    cfg_p, loss_p, trials_p, t_par = run(4, "par")
    assert cfg_p == cfg_s
    assert loss_p == pytest.approx(loss_s, rel=1e-6)
    assert [t["config"] for t in trials_p] == [t["config"] for t in trials_s]
    losses_p = [t["loss"] for t in trials_p]
    losses_s = [t["loss"] for t in trials_s]
    np.testing.assert_allclose(losses_p, losses_s, rtol=1e-5)
    print(f"hyper parallel: seq {t_seq:.1f}s vs 4-way {t_par:.1f}s "
          f"({t_seq / max(t_par, 1e-9):.2f}x)")
