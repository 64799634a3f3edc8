"""Train the flagship fV-SRN config on the MARSCHNER_LOBB implicit
volume and save the checkpoint into the repo (assets/flagship_mlobb.hdf5).

The trained-scene bench arm (bench.py) renders THIS checkpoint: the
reference's headline rates are measured on trained networks
(reference: applications/volnet/eval_VolumetricFeatures.py:147-200),
where alpha saturation makes early-out pay; a random-weight network is
structurally adversarial to it.

Recipe = the round-2 FUSED_300epoch arm (EVAL_VF_r02.json): world fit,
300 epochs, 262144 halton samples, lr 5e-3 StepLR(1200, 0.5), L1.

Usage: tools/tpurun.sh tools/train_flagship.py /tmp/train_flagship.log
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "flagship_mlobb.hdf5")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import fvsrn_tpu as fv
    from fvsrn_tpu.models.srn import SceneRepresentationNetwork
    from fvsrn_tpu.train.checkpoints import RunCheckpoint
    from fvsrn_tpu.train.losses import LossNetWorld
    from fvsrn_tpu.train.optimizer import make_optimizer
    from fvsrn_tpu.train.world import build_world_dataset, \
        train_world_epochs

    volume = fv.VolumeInterpolationImplicit.make("MARSCHNER_LOBB")
    rng = np.random.default_rng(0)
    latent = fv.LatentSpace(static_grid=(
        rng.standard_normal((16, 32, 32, 32)) * 0.01).astype(np.float32))
    net = SceneRepresentationNetwork.make(
        layers="32:32:32", activation="SnakeAlt:2", num_fourier=14,
        output_mode="density:direct", latent=latent, seed=1)
    ds = build_world_dataset(volume, 262144, sampler="halton")
    loss = LossNetWorld(mode="density", l1=1.0)
    opt = make_optimizer("Adam", lr=5e-3, lr_step=1200, lr_gamma=0.5)
    t0 = time.time()

    def cb(e, network, mean_loss):
        if e % 10 == 0 or e == 299:
            print(f"epoch {e}: L1 {mean_loss:.5f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    net, hist = train_world_epochs(
        net, ds, loss, opt, batch_size=8192, epochs=300,
        scan_epoch=False, callback=cb)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with RunCheckpoint(OUT, "w") as ck:
        ck.set_options({"recipe": "world fit 300ep 262144 halton L1 "
                                  "lr5e-3 step1200",
                        "scene": "MARSCHNER_LOBB implicit",
                        "final_l1": hist[-1]})
        ck.save_weights(net, 300)
    print(f"saved {OUT}: L1 {hist[0]:.5f} -> {hist[-1]:.5f}")


if __name__ == "__main__":
    main()
