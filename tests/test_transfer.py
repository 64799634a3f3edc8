"""Transfer function tests vs straightforward numpy reimplementations
(reference: renderer/renderer_tf_piecewise.cuh:27-64, renderer_tf_texture.cuh,
renderer_tf_gaussian.cuh, renderer_tf_kernels.cuh)."""
import numpy as np
import jax.numpy as jnp

from fvsrn_tpu import transfer


def _np_piecewise(tf, d):
    """Direct port of the reference control-point search loop."""
    r = tf.shape[0]
    d = np.clip(d, 0.0, 1.0)
    out = np.zeros(d.shape + (4,), np.float32)
    for idx in np.ndindex(d.shape):
        dv = d[idx]
        i = r - 2
        for k in range(r - 1):
            if tf[k + 1, 4] > dv:
                i = k
                break
        p0, p1 = tf[i, 4], tf[i + 1, 4]
        dc = np.clip(dv, p0, p1)
        frac = (dc - p0) / (p1 - p0)
        out[idx] = tf[i, :4] + frac * (tf[i + 1, :4] - tf[i, :4])
    return out


def test_piecewise_matches_reference_loop(rng):
    pts = np.sort(rng.random(6)).astype(np.float32)
    pts[0], pts[-1] = 0.0, 1.0
    rgb = rng.random((6, 3)).astype(np.float32)
    op = rng.random(6).astype(np.float32) * 10
    tf = transfer.TransferFunctionPiecewiseLinear.make(rgb, op, pts)
    d = rng.random(100).astype(np.float32) * 1.4 - 0.2
    got = np.asarray(tf.eval_normalized(jnp.asarray(d), stepsize=0.5))
    ref = _np_piecewise(np.asarray(tf.tensor), d)
    ref[..., 3] *= 0.5
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_identity():
    tf = transfer.TransferFunctionIdentity.make(absorption=2.0, emission=3.0)
    out = np.asarray(tf.eval_normalized(jnp.asarray([0.5, 2.0]), stepsize=2.0))
    np.testing.assert_allclose(out[0], [1.5, 1.5, 1.5, 2.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [3, 3, 3, 4.0], atol=1e-6)  # clamped


def test_texture_lut(rng):
    table = rng.random((16, 4)).astype(np.float32)
    tf = transfer.TransferFunctionTexture(tensor=jnp.asarray(table))
    # exact texel center: d*R-0.5 = i  =>  d = (i+0.5)/R
    d = (np.arange(16) + 0.5) / 16
    got = np.asarray(tf.eval_normalized(jnp.asarray(d, jnp.float32)))
    np.testing.assert_allclose(got, table, atol=1e-5)
    # midpoint between texels 3 and 4
    d = np.asarray([(4.0) / 16], np.float32)
    got = np.asarray(tf.eval_normalized(jnp.asarray(d)))
    np.testing.assert_allclose(got[0], 0.5 * (table[3] + table[4]), atol=1e-5)


def test_gaussian(rng):
    t = rng.random((3, 6)).astype(np.float32)
    t[:, 5] = 0.1 + t[:, 5] * 0.2  # sigma
    tf = transfer.TransferFunctionGaussian(tensor=jnp.asarray(t))
    d = rng.random(50).astype(np.float32)
    got = np.asarray(tf.eval_normalized(jnp.asarray(d), stepsize=2.0))
    ref = np.zeros((50, 4), np.float32)
    for i in range(3):
        ni = np.exp(-((d - t[i, 4]) ** 2) / t[i, 5] ** 2)
        ref += t[i, :4] * ni[:, None]
    ref[:, 3] *= 2.0
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_tensor_api_density_min():
    """Densities below density_min yield zeros
    (reference: renderer_tf_kernels.cuh EvaluateTF)."""
    tf = transfer.TransferFunctionIdentity.make()
    d = jnp.asarray([[0.1], [0.4], [0.9]])
    out = np.asarray(transfer.evaluate(tf, d, 0.25, 0.75))
    np.testing.assert_allclose(out[0], 0.0)
    # 0.4 -> normalized (0.4-0.25)/0.5 = 0.3
    np.testing.assert_allclose(out[1], [0.3, 0.3, 0.3, 0.3], atol=1e-6)
    # 0.9 -> normalized 1.3 clamped to 1
    np.testing.assert_allclose(out[2], [1, 1, 1, 1], atol=1e-6)


def test_preintegration_consistency():
    """Preintegrated segment over a constant TF equals the plain evaluation."""
    table = np.ones((8, 4), np.float32) * np.asarray([0.2, 0.4, 0.6, 0.8])
    tf = transfer.TransferFunctionTexture(
        tensor=jnp.asarray(table)).with_preintegration(256)
    d = jnp.asarray([0.3], jnp.float32)
    prev = jnp.asarray([0.7], jnp.float32)
    got = np.asarray(tf.eval_normalized(d, previous_density=prev,
                                        stepsize=0.01))[0]
    # constant TF: integral mean = the constant; alpha = 1-exp(-tau*step)
    # tolerance bounded by the cumulative table's 1/256 discretization
    np.testing.assert_allclose(got[:3], [0.2, 0.4, 0.6], rtol=1e-2)
    np.testing.assert_allclose(got[3], 1 - np.exp(-0.8 * 0.01), rtol=1e-2)


def test_preintegration_2d():
    """The 2D table's segment integral matches brute-force fine marching
    through the same TF (reference: Compute2DPreintegrationTable +
    renderer_tf_texture.cuh mode 2)."""
    rng = np.random.default_rng(5)
    table = rng.random((16, 4)).astype(np.float32)
    table[:, 3] *= 20
    stepsize = 1 / 64
    tf0 = transfer.TransferFunctionTexture(tensor=jnp.asarray(table))
    tf2 = tf0.with_preintegration_2d(resolution=256, stepsize=stepsize,
                                     quadrature_steps=64)
    prev, cur = 0.23, 0.71
    got = np.asarray(tf2.eval_normalized(
        jnp.asarray([cur]), previous_density=jnp.asarray([prev]),
        stepsize=stepsize))[0]
    # brute force: march the segment in 512 sub-steps with plain blending
    k = (np.arange(512) + 0.5) / 512
    dens = prev + (cur - prev) * k
    rgba = np.asarray(tf0.eval_normalized(jnp.asarray(dens, jnp.float32)))
    tau = rgba[:, 3] * stepsize / 512
    a_k = 1 - np.exp(-tau)
    T = 1.0
    C = np.zeros(3)
    for c, a in zip(rgba[:, :3], a_k):
        C += T * c * a
        T *= 1 - a
    A = 1 - T
    np.testing.assert_allclose(got[3], A, atol=2e-3)
    np.testing.assert_allclose(got[:3] * got[3], C, atol=2e-3)
