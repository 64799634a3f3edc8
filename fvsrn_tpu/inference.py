"""Inference: load trained runs, render references and networks, time them.

Rebuild of ``LoadedModel`` (reference: applications/volnet/inference.py:
26-692): reconstructs the SRN from a run checkpoint, offers the evaluation
modes of the reference (tensor-core fused vs pytorch plain, fp16 vs fp32)
mapped to their TPU equivalents, renders the reference volume or the
network through the same image evaluator, and provides the GPUTimer-style
benchmark helper used by all eval scripts
(reference: eval_VolumetricFeatures.py:147-200).

Eval modes (reference: inference.py EvalMode):
- FUSED        -> Pallas fused kernel, bf16 latent table + f32 math
                  (TENSORCORES_MIXED; the reference's TC modes are fp16
                  storage either way, renderer_volume_tensorcores.cuh)
- FUSED_BF16   -> same contract (TENSORCORES_SHARED analog; kept as a
                  distinct name for mode tables)
- PLAIN32      -> plain-JAX scan path, f32 (PYTORCH32)
- PLAIN16      -> plain-JAX scan path, bf16 params (PYTORCH16)

The FUSED product path runs the SAME camera-static planning as
bench.py: saturation-clamped march (probe_saturation_tmax ->
plan_ray_buckets(tmax_clip=...)) + the in-kernel early-out vote + the
bf16 latent table -- the bench number IS the product number (round-4
fix; the round-3 product path skipped the clip and ran 2.9x slower
than the bench on the same scene).
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .camera import CameraOnASphere, camera_matrix, generate_rays
from .models.network_volume import VolumeInterpolationNetwork
from .models.srn import SceneRepresentationNetwork
from .raytracer.dvr import (RayEvaluationSteppingDvr, max_steps_bound,
                            trace_dvr)
from .train.checkpoints import RunCheckpoint
from .transfer import TransferFunctionPiecewiseLinear
from .utils.timer import GPUTimer

EVAL_MODES = ("FUSED", "FUSED_BF16", "PLAIN32", "PLAIN16")

_warned_interpret = False


def _auto_interpret(interpret: Optional[bool]) -> bool:
    """Resolve ``interpret=None`` to the platform default: compiled
    Pallas kernels exist only on TPU, so FUSED modes auto-fall back to
    interpret mode elsewhere (tests/CI run this way). Interpret mode is
    orders of magnitude slower -- warn once so off-TPU users understand
    the performance cliff (ADVICE round 4)."""
    global _warned_interpret
    if interpret is not None:
        return interpret
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu and not _warned_interpret:
        import warnings
        warnings.warn(
            "fvsrn_tpu: no TPU detected -- FUSED render paths fall back "
            "to Pallas interpret mode (orders of magnitude slower; "
            "pass interpret=False to force compiled kernels)",
            stacklevel=3)
        _warned_interpret = True
    return not on_tpu


class LoadedModel:
    """A trained SRN + rendering configuration loaded from a run file
    (reference: inference.py:26-200)."""

    def __init__(self, network: SceneRepresentationNetwork, tf,
                 config: Optional[RayEvaluationSteppingDvr] = None,
                 reference_volume=None,
                 box_min=(-0.5, -0.5, -0.5), box_size=(1.0, 1.0, 1.0)):
        self.network = network
        self.tf = tf
        self.config = config or RayEvaluationSteppingDvr.make(
            stepsize=1 / 256)
        self.reference_volume = reference_volume
        self.box_min = np.asarray(box_min, np.float32)
        self.box_size = np.asarray(box_size, np.float32)

    @classmethod
    def from_checkpoint(cls, path: str, epoch: Optional[int] = None,
                        tf=None, reference_volume=None) -> "LoadedModel":
        """Rebuild from an hdf5 run file
        (reference: inference.py:112-189)."""
        with RunCheckpoint(path, "r") as ck:
            network = ck.load_weights(epoch)
        if tf is None:
            tf = TransferFunctionPiecewiseLinear.make(
                rgb=[[1.0, 1.0, 1.0]] * 2, opacity=[0.0, 50.0],
                positions=[0.0, 1.0])
        return cls(network, tf, reference_volume=reference_volume)

    @classmethod
    def from_volnet(cls, path: str, tf=None) -> "LoadedModel":
        from .models.export import load_volnet
        net, box_min, box_size = load_volnet(path)
        if tf is None:
            tf = TransferFunctionPiecewiseLinear.make(
                rgb=[[1.0, 1.0, 1.0]] * 2, opacity=[0.0, 50.0],
                positions=[0.0, 1.0])
        return cls(net, tf, box_min=box_min, box_size=box_size)

    def save_volnet(self, path: str, grid_encoding: int = 0):
        from .models.export import save_volnet
        save_volnet(self.network, path, box_min=tuple(self.box_min),
                    box_size=tuple(self.box_size),
                    grid_encoding=grid_encoding)

    # -- cameras (reference: inference.py camera helpers) ---------------
    @staticmethod
    def rotation_cameras(num: int, distance: float = 1.6,
                         pitch: float = 0.3) -> list[CameraOnASphere]:
        return [CameraOnASphere.make(pitch=pitch,
                                     yaw=2 * np.pi * i / num,
                                     distance=distance)
                for i in range(num)]

    # -- rendering -------------------------------------------------------
    def render_reference(self, camera, width: int, height: int):
        """Render the ground-truth volume (reference: inference.py
        ``render_reference``)."""
        if self.reference_volume is None:
            raise ValueError("no reference volume attached")
        return self._render_volume(self.reference_volume, camera, width,
                                   height)

    def render_network(self, camera, width: int, height: int,
                       mode: str = "FUSED",
                       interpret: Optional[bool] = None,
                       **plan_kwargs):
        """(reference: inference.py:529-660 ``render_network``).
        ``interpret``: run the fused kernel in Pallas interpret mode;
        default (None) auto-enables it off-TPU, where compiled Pallas
        is unsupported -- so the documented FUSED quick-start works on
        any backend. ``plan_kwargs`` forward to
        :meth:`prepare_network_render` (``saturation_clip``,
        ``table_dtype``)."""
        return self.prepare_network_render(camera, width, height, mode,
                                           interpret, **plan_kwargs)()

    def _occupancy_grid(self, stepsize: float,
                        alpha_skip: float = 1e-5):
        """Cached TF-occupancy macrocell grid for empty-space culling
        (ops/occupancy.py). Returns None when the TF has no meaningful
        zero band (measured round 4: ramp-from-zero TFs leave ZERO
        skippable cells -- the probe below avoids the bounding pass)."""
        key = (round(stepsize, 9), alpha_skip,
               hash(np.asarray(self.tf.tensor).tobytes()))
        cache = getattr(self, "_occ_cache", None)
        if cache is None:
            cache = self._occ_cache = {}
        if key in cache:
            return cache[key]
        import jax.numpy as _jnp
        ds = _jnp.linspace(0.0, 1.0, 1025)
        op = np.asarray(self.tf.eval_normalized(
            ds, _jnp.zeros((1025, 3)), _jnp.full((1025,), -1.0),
            1.0))[:, 3]
        frac_zero = float((op * stepsize < alpha_skip).mean())
        occ = None
        if frac_zero > 0.02:     # a real zero band exists
            from .ops.occupancy import build_occupancy
            nvol = VolumeInterpolationNetwork.make(
                self.network, box_min=self.box_min,
                box_size=self.box_size)
            # resolution 128: thin-feature scenes (the sparse class)
            # fragment badly at 32^3 macrocells -- measured round 5 on
            # the MULTI_SHELL flagship: 71% occupied at 32^3 vs 32% at
            # 128^3, i.e. 63% of (tile, segment) programs culled
            occ = build_occupancy(
                nvol, self.tf, resolution=128, fine=2,
                stepsize=stepsize, alpha_skip=alpha_skip,
                density_min=float(np.asarray(self.config.density_min)),
                density_max=float(np.asarray(self.config.density_max)))
        cache[key] = occ
        return occ

    def prepare_network_render(self, camera, width: int, height: int,
                               mode: str = "FUSED",
                               interpret: Optional[bool] = None,
                               saturation_clip: bool = True,
                               occupancy_culling: bool = True,
                               table_dtype=None):
        """Build a zero-arg render callable with all host-side planning
        (ray gen, block permutation, saturation probe, bucket
        certification) done up front and the device program under one
        ``jax.jit`` -- so timing loops measure steady-state device
        work, not per-frame host prep (reference: the NVRTC kernel is
        likewise compiled before the GPUTimer loop,
        eval_VolumetricFeatures.py:147-188).

        ``saturation_clip``: run :func:`probe_saturation_tmax` (a
        camera-static coarse alpha march) and clamp each ray's march at
        its estimated saturation depth -- the planner-level equivalent
        of the reference's in-kernel alpha>=0.999 early-out
        (renderer_ray_evaluation_stepping_dvr.cuh:93-99); on trained
        scenes this is the dominant frame-time lever. Applied for
        density-output networks on the bucketed FUSED path.
        ``occupancy_culling``: TF-aware empty-space skipping
        (ops/occupancy.py) -- when the TF carries a zero-opacity band
        (the reference's sparse-scene regime), a cached macrocell
        bounding pass culls transparent (tile, segment) programs before
        the MLP runs (measured 1.34x at 512^2 on a zero-band TF, image
        bitwise equal; a no-op on ramp TFs -- see PERF.md round 4).
        ``table_dtype``: override the latent-table dtype (default
        bf16, the reference's fp16-storage contract).

        Snapshot semantics: the returned callable captures
        ``self.network`` / ``self.tf`` (via ``jax.device_put``) at
        prepare time -- mutating the model afterwards does NOT affect
        an already-prepared renderer; call this again to rebuild."""
        if mode not in EVAL_MODES:
            raise ValueError(f"mode must be one of {EVAL_MODES}")
        interpret = _auto_interpret(interpret)
        stepsize = float(np.asarray(self.config.stepsize))
        steps = max_steps_bound(self.box_size, stepsize)
        matrix = np.asarray(camera_matrix(camera))
        rs, rd = generate_rays(matrix, width, height,
                               camera.fov_y_radians)
        rs = rs.reshape(-1, 3)
        rd = rd.reshape(-1, 3)
        if mode.startswith("FUSED"):
            from .models.latent import resolve_grid
            from .ops.fused_dvr import (block_ray_permutation,
                                        fused_trace_dvr,
                                        fused_trace_dvr_bucketed,
                                        plan_ray_buckets,
                                        probe_saturation_tmax)
            kw = dict(
                stepsize=stepsize,
                density_min=float(np.asarray(self.config.density_min)),
                density_max=float(np.asarray(self.config.density_max)),
                # bf16 latent TABLE, f32 elementwise math: XLA:TPU
                # already rounds every matmul operand to bf16 (one-pass
                # MXU, PERF.md), so compute_dtype=bf16 buys no FLOPs --
                # but bf16 ACTIVATION math through a ~700-step march
                # measurably hurts (SSIM 0.75 vs 0.91 at 512^2,
                # eval_volumetric_features) -- the table is where the
                # memory saving lives
                compute_dtype=jnp.float32,
                table_dtype=(table_dtype if table_dtype is not None
                             else jnp.bfloat16),
                interpret=interpret)
            # texture / 1D- / 2D-preintegrated TFs run fused too
            from .transfer import TransferFunctionTexture
            if isinstance(self.tf, TransferFunctionTexture):
                if self.tf.preintegration_mode == 1:
                    kw["tf_mode"] = "preint1d"
                    kw["tf_pre"] = self.tf.preintegrated
                elif self.tf.preintegration_mode == 2:
                    kw["tf_mode"] = "preint2d"
                    kw["tf_pre"] = self.tf.preintegrated
                else:
                    kw["tf_mode"] = "texture"
            from .ops.fused_mega import mega_supported
            grid = resolve_grid(self.network.latent)
            # megakernel engine: whole march in one pallas_call; needs a
            # VMEM-resident latent slab (all TF modes run in-kernel via
            # the shared _march_epilogue)
            engine = ("mega" if grid is not None
                      and mega_supported(grid.shape, kw["table_dtype"])
                      else "scan")
            # fast path: boxfeat latent sampling + march-length tile
            # bucketing; needs 16x16-coherent pixel blocks and a latent
            # grid with <= 16 channels
            if (grid is not None and grid.shape[0] <= 16
                    and width % 16 == 0 and height % 16 == 0):
                rs_np = np.asarray(rs)
                rd_np = np.asarray(rd)
                perm, inv = block_ray_permutation(width, height, 16, 16)
                rs_np, rd_np = rs_np[perm], rd_np[perm]
                c, gd, gh, gw = grid.shape
                clip = None
                if (saturation_clip
                        and self.network.output_mode.startswith("density")
                        and hasattr(self.tf, "eval_normalized")):
                    # camera-static saturation probe (bench.py's exact
                    # planning pre-pass): coarse alpha-only march of
                    # the SAME network+TF, once per camera
                    nvol = VolumeInterpolationNetwork.make(
                        self.network, box_min=self.box_min,
                        box_size=self.box_size)
                    clip = probe_saturation_tmax(
                        rs_np, rd_np, nvol, self.tf, stepsize=stepsize,
                        max_steps=steps, coarse=8, margin_steps=16)
                # quantize=128: plans from different camera poses hash
                # to the same static structure -> jit reuse across the
                # timing loop (reference warm-up semantics)
                plan = plan_ray_buckets(
                    rs_np, rd_np, np.asarray(self.box_min),
                    np.asarray(self.box_size), stepsize=stepsize,
                    seg=32, tile=256, n_buckets=6,
                    grid_sizes=(gw, gh, gd), quantize=128,
                    tmax_clip=clip)
                rs_d = jnp.asarray(rs_np)
                rd_d = jnp.asarray(rd_np)
                inv_d = jnp.asarray(inv)

                sa_dev = None
                if (occupancy_culling and engine == "mega"
                        and self.network.output_mode.startswith(
                            "density")
                        and hasattr(self.tf, "eval_normalized")):
                    occ = self._occupancy_grid(stepsize)
                    if occ is not None:
                        from .ops.occupancy import plan_segment_occupancy
                        sa_dev = tuple(
                            jnp.asarray(m) for m in
                            plan_segment_occupancy(
                                plan, rs_np, rd_np, occ,
                                np.asarray(self.box_min),
                                np.asarray(self.box_size),
                                stepsize=stepsize, seg=32, tile=256))

                # the per-camera clip (and occupancy masks) ride in as
                # TRACED arguments (not baked constants) so quantize-
                # stabilized plans from different cameras share one
                # compiled program
                clip_dev = (jnp.asarray(plan.tmax_clip)
                            if plan.tmax_clip is not None else None)

                @jax.jit
                def render(net, tft, clip_, sa_):
                    p = plan._replace(tmax_clip=clip_)
                    color = fused_trace_dvr_bucketed(
                        rs_d, rd_d, net, self.box_min, self.box_size,
                        tft, plan=p, seg=32, tile=256,
                        latent_mode="boxfeat", engine=engine,
                        segment_active_groups=sa_, **kw)
                    color = jnp.take(color, inv_d, axis=0)
                    return color.reshape(height, width, 4)

                # device-resident params: without this, every frame
                # re-uploads ~2 MB of numpy checkpoint leaves through
                # the host link (measured as most of the forward-frame
                # jitter on the axon tunnel)
                net_dev = jax.device_put(self.network)
                tft_dev = jax.device_put(self.tf.tensor)
                return lambda: render(net_dev, tft_dev,
                                      clip_dev, sa_dev)
            else:
                tile = 128
                pad = (-rs.shape[0]) % tile
                if pad:
                    rs = jnp.concatenate([rs, jnp.zeros((pad, 3))],
                                         axis=0)
                    rd = jnp.concatenate([rd, jnp.ones((pad, 3))],
                                         axis=0)

                @jax.jit
                def render(net, tft):
                    color = fused_trace_dvr(
                        rs, rd, net, self.box_min, self.box_size,
                        tft, max_steps=steps, tile=tile, **kw)
                    if pad:
                        color = color[:-pad]
                    return color.reshape(height, width, 4)
        else:
            net0 = self.network
            if mode == "PLAIN16":
                net0 = jax.tree.map(
                    lambda a: jnp.asarray(a, jnp.bfloat16).astype(
                        jnp.float32), net0)
            vol = VolumeInterpolationNetwork.make(
                net0, box_min=self.box_min, box_size=self.box_size)

            @jax.jit
            def render_plain(v, tfo):
                color = trace_dvr(rs, rd, v, tfo, self.config,
                                  steps).color
                return color.reshape(height, width, 4)

            vol_dev = jax.device_put(vol)
            tf_dev = jax.device_put(self.tf)
            return lambda: render_plain(vol_dev, tf_dev)
        net_dev = jax.device_put(self.network)
        tft_dev = jax.device_put(self.tf.tensor)
        return lambda: render(net_dev, tft_dev)

    def render_network_iso(self, camera, width: int, height: int,
                           iso_config, mode: str = "FUSED",
                           interpret: Optional[bool] = None):
        """Isosurface render of the SRN (reference: the iso ray
        evaluator over the tensor-core volume). FUSED = fused
        first-crossing march + per-ray bisection/shading
        (ops.fused_dvr.fused_trace_iso); PLAIN32 = trace_iso over the
        plain network volume. ``interpret=None`` auto-enables Pallas
        interpret mode off-TPU (as in :meth:`prepare_network_render`).
        Returns (H, W, 4) rgba."""
        from .raytracer.iso import trace_iso
        interpret = _auto_interpret(interpret)
        stepsize = float(np.asarray(iso_config.stepsize))
        steps = max_steps_bound(self.box_size, stepsize)
        matrix = np.asarray(camera_matrix(camera))
        rs, rd = generate_rays(matrix, width, height,
                               camera.fov_y_radians)
        rs = rs.reshape(-1, 3)
        rd = rd.reshape(-1, 3)
        if mode.startswith("FUSED"):
            from .ops.fused_dvr import fused_trace_iso
            tile = 128
            pad = (-rs.shape[0]) % tile
            if pad:
                rs = jnp.concatenate([rs, jnp.zeros((pad, 3))], axis=0)
                rd = jnp.concatenate([rd, jnp.ones((pad, 3))], axis=0)
            out = fused_trace_iso(
                rs, rd, self.network, self.box_min, self.box_size,
                iso_config, max_steps=steps, tile=tile,
                table_dtype=jnp.bfloat16 if mode == "FUSED_BF16"
                else jnp.float32, interpret=interpret)
            color = out.color[:-pad] if pad else out.color
        else:
            vol = VolumeInterpolationNetwork.make(
                self.network, box_min=self.box_min,
                box_size=self.box_size)
            color = trace_iso(rs, rd, vol, iso_config, steps).color
        return color.reshape(height, width, 4)

    def _render_volume(self, volume, camera, width, height):
        stepsize = float(np.asarray(self.config.stepsize))
        steps = max_steps_bound(np.asarray(volume.box_size), stepsize)
        matrix = np.asarray(camera_matrix(camera))
        rs, rd = generate_rays(matrix, width, height,
                               camera.fov_y_radians)
        out = trace_dvr(rs.reshape(-1, 3), rd.reshape(-1, 3), volume,
                        self.tf, self.config, steps)
        return out.color.reshape(height, width, 4)

    # -- benchmarking (reference: eval_VolumetricFeatures.py:147-200) ----
    def time_rendering(self, cameras, width: int = 512, height: int = 512,
                       mode: str = "FUSED", repeats: int = 4):
        """Frame times over cameras, first camera discarded as warm-up;
        renderers are prepared + compiled before the loop (the
        reference's kernel is likewise compiled outside its GPUTimer
        loop). Returns (mean_ms, std_ms, per_frame_ms).

        Protocol: per camera, ``repeats`` frames dispatch back-to-back
        and one on-device scalar reduction of the last frame is
        fetched; frame time = wall / repeats. This measures DEVICE
        rendering work -- the role of the reference's CUDA-event
        GPUTimer (eval_VolumetricFeatures.py:151-188), which brackets
        the kernel and excludes readback. A per-frame full-image fetch
        here would time the axon host tunnel (~4 MB/frame, measured
        3-4x the render itself), which no production deployment pays
        per frame (the image stays device-side for display/compositing
        or is streamed asynchronously)."""
        import jax as _jax
        import jax.numpy as _jnp
        fns = [self.prepare_network_render(c, width, height, mode)
               for c in cameras]
        reduce_ = _jax.jit(lambda x: _jnp.mean(x))
        for fn in fns:  # compile every plan structure before timing
            float(reduce_(fn()))
        timer = GPUTimer()
        times = []
        for i, fn in enumerate(fns):
            timer.start()
            out = None
            for _ in range(repeats):
                out = fn()
            # scalar fetch: block_until_ready does not block through
            # the axon tunnel -- reduce on device and fetch 4 bytes
            float(reduce_(out))
            ms = timer.stop() / max(1, repeats)
            if i > 0:  # warm-up discard (reference: :188)
                times.append(ms)
        arr = np.asarray(times) if times else np.asarray([0.0])
        return float(arr.mean()), float(arr.std()), arr


def compare_modes(model: LoadedModel, camera, width=64, height=64,
                  modes=("FUSED", "PLAIN32")):
    """Cross-implementation MSE table
    (reference: inference.py:660-672)."""
    images = {m: np.asarray(model.render_network(camera, width, height, m))
              for m in modes}
    base = modes[0]
    return {m: float(np.mean((images[m] - images[base]) ** 2))
            for m in modes}
