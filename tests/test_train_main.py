"""End-to-end training entry tests
(reference: train_volnet.py main loop)."""
import numpy as np

from fvsrn_tpu.train.checkpoints import RunCheckpoint
from fvsrn_tpu.train.main import init_parser, run


def _opts(tmp_path, **overrides):
    opt = vars(init_parser().parse_args(
        ["IMPLICIT:SPHERE", str(tmp_path / "run.hdf5")]))
    opt.update(samples=4096, epochs=6, batch_size=1024, lr=5e-3,
               layers="16:16", activation="SnakeAlt:1",
               fouriercount=4, save_frequency=2, scan_epoch=True)
    opt.update(overrides)
    return opt


def test_world_training_entry(tmp_path):
    result = run(_opts(tmp_path))
    h = result["history"]
    assert len(h) == 6
    assert h[-1] < h[0]
    with RunCheckpoint(str(tmp_path / "run.hdf5"), "r") as ck:
        assert ck.get_options()["layers"] == "16:16"
        assert len(ck.get_losses("total")) == 6
        assert ck.epochs_with_weights()  # checkpoints written
        net = ck.load_weights()
    assert net is not None


def test_world_training_with_rebuild_and_latent(tmp_path):
    result = run(_opts(
        tmp_path, rebuild_dataset=3, epochs=6, importance=0.25,
        volumetric_features_channels=4,
        volumetric_features_resolution=8))
    h = result["history"]
    assert len(h) == 6
    assert h[-1] < h[0]
    assert result["network"].latent.static_grid is not None


def test_screen_training_entry(tmp_path):
    result = run(_opts(tmp_path, mode="screen", epochs=4,
                       screen_cameras=4, screen_size=16,
                       outputmode="density", stepsize=1 / 24))
    assert len(result["history"]) == 4
    assert result["history"][-1] <= result["history"][0]
