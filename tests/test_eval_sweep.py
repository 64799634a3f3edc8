"""Ablation-sweep harness tests (reference: the eval_*.py figure
scripts share one train-and-score loop; eval_ActivationFunctions.py,
eval_world_DensityVsColor.py)."""
import os

import numpy as np
import pytest

from fvsrn_tpu.eval.sweep import default_options, run_sweep


def test_sweep_trains_and_scores(tmp_path):
    rows = run_sweep(
        [("relu", {"activation": "ReLU", "outputmode": "density"}),
         ("snake", {"activation": "SnakeAlt:2", "outputmode": "density"})],
        base={"epochs": 3, "samples": 1024, "batch_size": 512,
              "lr": 0.01},
        scene="IMPLICIT:SPHERE",
        out_dir=str(tmp_path),
        out_csv=str(tmp_path / "sweep.csv"),
        eval_samples=1024)
    assert len(rows) == 2
    for r in rows:
        assert np.isfinite(r["final_loss"])
        assert np.isfinite(r["world_l2"])
        assert os.path.exists(tmp_path / f"{r['name']}.hdf5")
    assert os.path.exists(tmp_path / "sweep.csv")


def test_world_rgbo_training(tmp_path):
    """rgbo world mode: targets are TF-mapped colors, loss is rgbo
    (reference: eval_world_DensityVsColor.py)."""
    from fvsrn_tpu.train.main import run
    opt = default_options("IMPLICIT:SPHERE", str(tmp_path / "rgbo.hdf5"))
    opt.update(epochs=5, samples=1024, batch_size=512, lr=0.01,
               outputmode="rgbo")
    res = run(opt)
    assert res["network"].output_mode == "rgbo"
    h = res["history"]
    assert np.isfinite(h[-1]) and h[-1] < h[0]


def test_figure_scripts_define_configs():
    """Every thin eval script yields a non-empty, named config list."""
    import argparse
    from fvsrn_tpu.eval import (eval_activation_functions, eval_fourier,
                                eval_importance, eval_network_configs,
                                eval_density_vs_color,
                                eval_screen_vs_world)
    args = argparse.Namespace(grid=False)
    for mod in (eval_activation_functions, eval_fourier,
                eval_importance, eval_network_configs,
                eval_density_vs_color, eval_screen_vs_world):
        cfgs = mod.configs(args)
        assert len(cfgs) >= 2
        names = [n for n, _ in cfgs]
        assert len(set(names)) == len(names)
        for _, o in cfgs:
            assert isinstance(o, dict)


def test_sweep_render_arm(tmp_path):
    """--render times a fused (megakernel) screen render of each trained
    net, including the rgbo arm (eval_density_vs_color's engine=mega
    coverage)."""
    rows = run_sweep(
        [("density", {"outputmode": "density:direct",
                      "volumetric_features_channels": 4,
                      "volumetric_features_resolution": 8}),
         ("rgbo", {"outputmode": "rgbo",
                   "volumetric_features_channels": 4,
                   "volumetric_features_resolution": 8})],
        base={"epochs": 2, "samples": 1024, "batch_size": 512,
              "lr": 0.01},
        scene="IMPLICIT:SPHERE",
        out_dir=str(tmp_path),
        eval_samples=512,
        render=True)
    for r in rows:
        assert np.isfinite(r["render_ms"]) and r["render_ms"] > 0


def test_figures_generate(tmp_path):
    """Figure generation (the reference emits plots for its paper
    figures, README.md:137-163): all three artifact charts render from
    the committed JSONs."""
    from fvsrn_tpu.eval.figures import main
    assert main(["--out", str(tmp_path)]) == 0
    import os
    made = sorted(os.listdir(tmp_path))
    assert "compression_rd.png" in made
    assert "bench_history.png" in made
    assert "scaling.png" in made
