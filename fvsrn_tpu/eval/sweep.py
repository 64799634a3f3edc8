"""Generic ablation-sweep driver behind the eval_* figure scripts.

The reference drives every paper figure with a dedicated script that
enumerates training configs, trains each with the volnet trainer, and
collects quality stats into tables/plots — all variations of one loop
(reference: applications/volnet/eval_ActivationFunctions.py,
eval_Fourier.py, eval_network_configs.py, eval_ScreenVsWorld.py,
eval_world_DensityVsColor.py, eval_Importance.py,
eval_VolumetricFeatures_GridEncoding.py; index in README.md:137-163).
Here that loop is a single harness: a sweep is a list of
``(name, option-overrides)``; each entry trains through
:func:`fvsrn_tpu.train.main.run` and is scored on held-out world
samples (L1/L2 against the scene volume).

Results print as a table and optionally persist to CSV — the TPU-pod
analogue of the reference's LaTeX/TSV collectors.
"""
from __future__ import annotations

import csv
import os
import sys
import tempfile
import time
from typing import Optional, Sequence


def default_options(scene: str, output: str) -> dict:
    """The training CLI's defaults (single source of truth: the parser,
    reference: train_volnet.py argument groups)."""
    from ..train.main import init_parser
    return vars(init_parser().parse_args([scene, output]))


def _score_world(network, scene: str, *, samples: int, seed: int) -> dict:
    """Held-out world-space L1/L2 of the trained SRN vs the scene volume
    (reference: evaluation.py EvaluateWorld used by the eval scripts)."""
    import jax
    import numpy as np

    from ..train.losses import LossNetWorld
    from ..train.main import _resolve_scene
    from ..train.world import build_world_dataset, evaluate_world

    volume, tf, cfg = _resolve_scene(scene)
    is_rgbo = network.output_mode.startswith("rgbo")
    ds = build_world_dataset(
        volume, samples, sampler="random",
        tf=(tf if is_rgbo else None),
        stepsize=float(np.asarray(cfg.stepsize)) if is_rgbo else 1.0,
        key=jax.random.PRNGKey(seed + 999))
    mode = "rgbo" if is_rgbo else "density"
    l1 = LossNetWorld(mode=mode, l1=1.0, l2=0.0)
    l2 = LossNetWorld(mode=mode, l1=0.0, l2=1.0)
    return {
        "world_l1": float(np.asarray(evaluate_world(network, ds, l1)[0])),
        "world_l2": float(np.asarray(evaluate_world(network, ds, l2)[0])),
    }


def _render_ms(network, scene: str, *, width: int = 128) -> float:
    """One warm screen render of the trained net through the product
    inference fast path (megakernel engine for both density and rgbo
    nets; reference: the eval scripts' screenshot renders)."""
    import numpy as np

    from ..inference import LoadedModel
    from ..train.main import _resolve_scene

    import jax
    _, tf, cfg = _resolve_scene(scene)
    model = LoadedModel(network, tf, config=cfg)
    cam = model.rotation_cameras(1)[0]
    render = model.prepare_network_render(
        cam, width, width, "FUSED",
        jax.devices()[0].platform != "tpu")
    np.asarray(render())                      # compile + warm
    t0 = time.time()
    np.asarray(render())
    return (time.time() - t0) * 1e3


def run_sweep(configs: Sequence[tuple], *, base: Optional[dict] = None,
              scene: str = "IMPLICIT:MARSCHNER_LOBB",
              out_dir: Optional[str] = None,
              out_csv: Optional[str] = None,
              eval_samples: int = 16384,
              render: bool = False) -> list:
    """Train and score every (name, overrides) entry. Returns the rows
    (list of dicts), prints a table, optionally writes CSV.
    ``render=True`` additionally times one fused screen render of each
    trained net (the megakernel product path)."""
    from ..train.main import run

    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="fvsrn_sweep_")
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for name, overrides in configs:
        opt = default_options(scene, os.path.join(out_dir,
                                                  f"{name}.hdf5"))
        opt.update(base or {})
        opt.update(overrides)
        t0 = time.time()
        res = run(opt)
        row = {"name": name,
               "final_loss": res["history"][-1],
               "train_seconds": round(time.time() - t0, 1)}
        row.update(_score_world(res["network"], opt["scene"],
                                samples=eval_samples,
                                seed=opt["seed"]))
        if render:
            row["render_ms"] = round(_render_ms(res["network"],
                                                opt["scene"]), 1)
        rows.append(row)
        print(f"[sweep] {name}: loss {row['final_loss']:.5f} "
              f"world_l2 {row['world_l2']:.5f} "
              f"({row['train_seconds']}s)", flush=True)

    keys = list(rows[0].keys()) if rows else []
    widths = {k: max(len(k), *(len(f"{r[k]:.5g}")
                               if isinstance(r[k], float)
                               else len(str(r[k])) for r in rows))
              for k in keys}
    print("  ".join(k.ljust(widths[k]) for k in keys))
    for r in rows:
        print("  ".join(
            (f"{r[k]:.5g}" if isinstance(r[k], float)
             else str(r[k])).ljust(widths[k]) for k in keys))
    if out_csv:
        with open(out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {out_csv}")
    return rows


def sweep_main(configs_fn, description: str, argv=None):
    """Shared CLI for the thin eval_* scripts: --epochs/--samples control
    the quick-vs-paper scale, --csv persists the table."""
    import argparse
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--scene", default="IMPLICIT:MARSCHNER_LOBB")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--samples", type=int, default=64 * 64 * 4)
    p.add_argument("--csv", default=None)
    p.add_argument("--out-dir", default=None)
    p.add_argument("--render", action="store_true",
                   help="also time a fused (megakernel) screen render "
                        "of each trained net")
    args = p.parse_args(argv)
    base = {"epochs": args.epochs, "samples": args.samples}
    run_sweep(configs_fn(args), base=base, scene=args.scene,
              out_dir=args.out_dir, out_csv=args.csv,
              render=args.render)
    return 0
