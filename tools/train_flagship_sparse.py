"""Round-5 sparse-TF flagship: train the MULTI_SHELL scene
(fvsrn_tpu/scenes.py sparse_scene) for the second contracted bench arm.

The reference's headline numbers live on sparse scenes whose TFs carry
zero-opacity bands (its Ejecta recipe, reference README.md:92-127, with
config-files/*.json TFs) -- the scene class where per-step early-outs
pay (renderer_ray_evaluation_stepping_dvr.cuh:84-154). This trains the
same fV-SRN architecture (32:32:32 SnakeAlt:2, 14 fourier, 32^3 x 16ch
latent grid) on the multi-shell synthetic so that bench.py's sparse arm
exercises saturation clip + entry clip + occupancy culling + in-kernel
vote on a TRAINED network.

Recipe = tools/train_flagship_r4.py (the round-4 quality recipe):
world phase 400 epochs on 1M half-halton half-TF-importance samples,
then a screen fine-tune through the megakernel backward; SSIM measured
at the EVAL_VF config (512^2, stepsize 1/512) after each phase; best
phase saved to assets/flagship_shell.hdf5.

Usage: tools/tpurun.sh tools/train_flagship_sparse.py /tmp/train_sparse.log
"""
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "assets", "flagship_shell.hdf5")


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import fvsrn_tpu as fv
    from fvsrn_tpu.camera import CameraOnASphere, generate_rays
    from fvsrn_tpu.models.network_volume import VolumeInterpolationNetwork
    from fvsrn_tpu.models.srn import SceneRepresentationNetwork
    from fvsrn_tpu.raytracer.dvr import (RayEvaluationSteppingDvr,
                                         max_steps_bound, trace_dvr)
    from fvsrn_tpu.scenes import sparse_scene
    from fvsrn_tpu.train.checkpoints import RunCheckpoint
    from fvsrn_tpu.train.importance import importance_sampling
    from fvsrn_tpu.train.losses import LossNetScreen, LossNetWorld, ssim
    from fvsrn_tpu.train.optimizer import make_optimizer
    from fvsrn_tpu.train.sampling import get_sampled_positions
    from fvsrn_tpu.train.screen import (build_screen_dataset,
                                        screen_mega_kwargs, train_screen)
    from fvsrn_tpu.train.world import build_world_dataset, \
        train_world_epochs

    volume, tf, _ = sparse_scene()
    t0 = time.time()

    # ---- SSIM gate at the EVAL_VF config ----
    cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
    W = H = 512
    step_r = 1.0 / 512
    steps_r = max_steps_bound((1.0, 1.0, 1.0), step_r)
    cfg_r = RayEvaluationSteppingDvr.make(stepsize=step_r,
                                          enable_early_out=False)
    rs_e, rd_e = generate_rays(cam, W, H)
    rs_e = jnp.reshape(rs_e, (-1, 3))
    rd_e = jnp.reshape(rd_e, (-1, 3))

    @jax.jit
    def render_ref(rs, rd):
        return trace_dvr(rs, rd, volume, tf, cfg_r, steps_r).color

    chunks = [np.asarray(render_ref(rs_e[i:i + 65536],
                                    rd_e[i:i + 65536]))
              for i in range(0, W * H, 65536)]
    ref_img = np.concatenate(chunks).reshape(H, W, 4)
    print(f"reference render done ({time.time()-t0:.0f}s)", flush=True)

    def measure(net, tag):
        nvol = VolumeInterpolationNetwork.make(net)

        @jax.jit
        def render_net(rs, rd):
            return trace_dvr(rs, rd, nvol, tf, cfg_r, steps_r,
                             checkpoint_chunk=1).color

        cs = [np.asarray(render_net(rs_e[i:i + 65536],
                                    rd_e[i:i + 65536]))
              for i in range(0, W * H, 65536)]
        img = np.concatenate(cs).reshape(H, W, 4)
        s = float(ssim(jnp.moveaxis(jnp.asarray(img)[None], -1, 1),
                       jnp.moveaxis(jnp.asarray(ref_img)[None], -1, 1)))
        print(f"SSIM[{tag}] = {s:.4f} ({time.time()-t0:.0f}s)",
              flush=True)
        return s

    # ---- phase A: importance-mixed world fit ----
    rng = np.random.default_rng(0)
    latent = fv.LatentSpace(static_grid=(
        rng.standard_normal((16, 32, 32, 32)) * 0.01).astype(np.float32))
    net = SceneRepresentationNetwork.make(
        layers="32:32:32", activation="SnakeAlt:2", num_fourier=14,
        output_mode="density:direct", latent=latent, seed=1)

    n_uni, n_imp = 524288, 524288
    pos_u = get_sampled_positions("halton", n_uni, 3, 0)
    pos_i, _, _ = importance_sampling(
        jax.random.PRNGKey(11), volume, n_imp, tf=tf)
    positions = np.concatenate([np.asarray(pos_u), np.asarray(pos_i)])
    ds = build_world_dataset(volume, positions.shape[0],
                             positions=positions)
    print(f"world dataset built ({time.time()-t0:.0f}s)", flush=True)
    loss_w = LossNetWorld(mode="density", l1=1.0)
    opt = make_optimizer("Adam", lr=5e-3, lr_step=2400, lr_gamma=0.5)

    def cb(e, network, mean_loss):
        if e % 25 == 0 or e == 399:
            print(f"world epoch {e}: L1 {mean_loss:.5f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    net, _ = train_world_epochs(net, ds, loss_w, opt, batch_size=16384,
                                epochs=400, scan_epoch=False, callback=cb)
    s_world = measure(net, "world-sparse")

    def save_ck(path, network, phase, s):
        with RunCheckpoint(path, "w") as ck:
            ck.set_options({
                "recipe": "r5 sparse: world 400ep 1M halton+importance "
                          "L1 lr5e-3 step2400; screen mega 24cam 256^2 "
                          "L1+0.5DSSIM lr1e-3 120ep",
                "scene": "MULTI_SHELL implicit (scenes.sparse_scene)",
                "phase": phase, "ssim": s})
            ck.save_weights(network, 400)

    save_ck(OUT, net, "world-sparse", s_world)

    # ---- phase B: screen fine-tune through the megakernel ----
    step_s = 1.0 / 256
    cfg_s = RayEvaluationSteppingDvr.make(stepsize=step_s,
                                          enable_early_out=False)
    sdset = build_screen_dataset(
        volume, tf, cfg_s, num_cameras=24, width=256, height=256,
        distance=1.6,
        cache_path=os.path.join(ROOT, "assets", "screen_gt_shell_256.h5"))
    print(f"screen GT dataset built ({time.time()-t0:.0f}s)", flush=True)
    steps_s = max_steps_bound((1.0, 1.0, 1.0), step_s)
    fused_kwargs = screen_mega_kwargs(sdset, net, stepsize=step_s,
                                      max_steps=steps_s)
    loss_s = LossNetScreen(l1=1.0, dssim=0.5)
    opt_s = make_optimizer("Adam", lr=1e-3, lr_step=1200, lr_gamma=0.5)

    def cb_s(e, network, mean_loss):
        if e % 10 == 0 or e == 119:
            print(f"screen epoch {e}: loss {mean_loss:.5f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    net_s, _ = train_screen(net, sdset, tf, cfg_s, loss_s, opt_s,
                            epochs=120, use_fused=True,
                            fused_kwargs=fused_kwargs, callback=cb_s)
    s_screen = measure(net_s, "screen-sparse")

    best_net, best_s, phase = ((net_s, s_screen, "screen-sparse")
                               if s_screen >= s_world
                               else (net, s_world, "world-sparse"))
    save_ck(OUT, best_net, phase, best_s)
    print(f"best: {phase} SSIM {best_s:.4f} -> {OUT}", flush=True)


if __name__ == "__main__":
    main()
