"""On-device calibration of choose_fused_config's VMEM model.

For each network shape, compile the DIFFERENTIABLE fused kernel at the
chooser's (seg, tile) on the real TPU with the same
vmem_limit_bytes=112MB the engines ship with -- Mosaic fails the
compile when the working set does not fit, so compile success IS the
VMEM-fit assertion (VERDICT r2 item 9; the reference's analog check is
computeMaxWarps > 0, volume_interpolation_network.cpp:987-1040). Also
probes one tile step up to report how much headroom the model leaves.

Usage: python tools/calibrate_chooser.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from fvsrn_tpu.camera import CameraOnASphere, generate_rays
    from fvsrn_tpu.models.latent import LatentSpace
    from fvsrn_tpu.models.srn import SceneRepresentationNetwork
    from fvsrn_tpu.ops.fused_dvr import (choose_fused_config,
                                         fused_trace_dvr)
    from fvsrn_tpu.transfer import TransferFunctionPiecewiseLinear

    rng = np.random.default_rng(0)
    tf = TransferFunctionPiecewiseLinear.make(
        rgb=[[0.9, 0.2, 0.1], [0.2, 0.9, 0.5]], opacity=[0.0, 20.0],
        positions=[0.0, 1.0])

    def try_compile(hidden, n_layers, tile, seg):
        latent = LatentSpace(static_grid=(
            rng.standard_normal((16, 32, 32, 32)) * 0.1)
            .astype(np.float32))
        net = SceneRepresentationNetwork.make(
            layers=":".join([str(hidden)] * n_layers),
            activation="SnakeAlt:2", num_fourier=14,
            output_mode="density:direct", latent=latent, seed=1)
        cam = CameraOnASphere.make(pitch=0.3, yaw=0.5, distance=1.6)
        side = int(np.sqrt(tile))
        s, d = generate_rays(cam, max(side, 16), max(side, 16))
        rs = np.asarray(s).reshape(-1, 3)[:tile]
        rd = np.asarray(d).reshape(-1, 3)[:tile]

        @jax.jit
        def fb(n, t):
            def loss(n_, t_):
                c = fused_trace_dvr(
                    jnp.asarray(rs), jnp.asarray(rd), n_,
                    (-0.5, -0.5, -0.5), (1.0, 1.0, 1.0), t_,
                    stepsize=1 / 256, max_steps=seg, seg=seg, tile=tile,
                    enable_early_out=False, differentiable=True,
                    latent_mode="table")
                return jnp.mean(c ** 2)
            l, g = jax.value_and_grad(loss, argnums=(0, 1))(n, t)
            return l + sum(jnp.sum(x) for x in jax.tree.leaves(g))

        t0 = time.perf_counter()
        try:
            v = float(fb(net, tf.tensor))
            assert np.isfinite(v)
            return True, time.perf_counter() - t0
        except Exception as e:  # Mosaic VMEM errors surface here
            return False, str(e).splitlines()[0][:120]

    for hidden, n_layers in ((32, 4), (64, 4), (128, 4)):
        seg, tile = choose_fused_config(
            hidden=hidden, n_layers=n_layers, num_fourier=14,
            latent_channels=16, latent_mode="table",
            differentiable=True)
        ok, info = try_compile(hidden, n_layers, tile, seg)
        print(f"{hidden}x{n_layers}: chooser -> seg={seg} tile={tile}: "
              f"{'FITS (compiled+ran, %.0fs)' % info if ok else 'FAIL'}"
              f"{'' if ok else ' ' + str(info)}", flush=True)
        # headroom probe: one tile step up
        if tile < 512:
            ok2, info2 = try_compile(hidden, n_layers, tile + 128, seg)
            print(f"   +128 tile probe: "
                  f"{'also fits' if ok2 else 'does NOT fit'}", flush=True)


if __name__ == "__main__":
    main()
