"""Meta-network tests (reference: network.py:423-566 InnerNetworkMeta,
pretraining protocol :640-652, :962-996)."""
import numpy as np
import jax
import jax.numpy as jnp

from fvsrn_tpu.models.latent import LatentSpace
from fvsrn_tpu.models.meta import (MetaSceneNetwork,
                                   fit_meta_to_parameters)
from fvsrn_tpu.volume.implicit import VolumeInterpolationImplicit


def _latent(rng, ensembles=3):
    return LatentSpace(ensemble_vector=jnp.asarray(
        rng.random((1, 4, ensembles)), jnp.float32))


def test_meta_forward_shapes(rng):
    net = MetaSceneNetwork.make(layers="16:16", num_fourier=4,
                                latent=_latent(rng), seed=1)
    x = jnp.asarray(rng.random((10, 3)), jnp.float32)
    y = net(x, ensemble=jnp.zeros(10))
    assert y.shape == (10, 1)
    # different ensembles -> different predicted weights -> outputs differ
    y2 = net(x, ensemble=jnp.full((10,), 2.0))
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_meta_param_count(rng):
    net = MetaSceneNetwork.make(layers="8:8", num_fourier=2,
                                latent=_latent(rng))
    z = jnp.zeros((4,))
    p = net.predict_parameters(z)
    pairs = net._unpack(p)
    assert len(pairs) == 3  # 2 hidden + output
    total = sum(w.size + b.size for w, b in pairs)
    assert total == p.shape[0]


def test_meta_pretraining_fit(rng):
    """Phase 2: the meta net learns to emit a fixed parameter vector for
    all training latents."""
    net = MetaSceneNetwork.make(layers="8:8", num_fourier=2,
                                latent=_latent(rng), seed=2)
    n_params = net.predict_parameters(jnp.zeros(4)).shape[0]
    target = jnp.asarray(rng.standard_normal(n_params) * 0.1, jnp.float32)
    zs = jnp.asarray(rng.random((5, 4)), jnp.float32)
    net2 = fit_meta_to_parameters(net, zs, target, steps=300, lr=3e-3)
    preds = jax.vmap(net2.predict_parameters)(zs)
    err = float(jnp.abs(preds - target[None]).mean())
    assert err < 0.02, err


def test_meta_end_to_end_training(rng):
    """The meta SRN fits two different volumes keyed by the ensemble."""
    import optax
    vols = [VolumeInterpolationImplicit.make("SPHERE"),
            VolumeInterpolationImplicit.make("CUBE")]
    net = MetaSceneNetwork.make(layers="16:16", num_fourier=4,
                                latent=_latent(rng, ensembles=2),
                                output_mode="density:direct", seed=3)
    opt = optax.adam(3e-3)

    def loss_fn(net, pos, target, e):
        pred = net(pos, ensemble=jnp.full((pos.shape[0],), e),
                   mode="world")
        return jnp.mean(jnp.abs(pred - target))

    @jax.jit
    def step(net, opt_state, pos, target, e):
        val, grads = jax.value_and_grad(loss_fn)(net, pos, target, e)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(net, updates), opt_state, val

    opt_state = opt.init(net)
    pos = jnp.asarray(rng.random((2048, 3)), jnp.float32)
    targets = []
    for v in vols:
        world = v.box_min + pos * v.box_size
        targets.append(v.eval_density(world)[0][:, None])
    first = last = None
    for i in range(50):
        tot = 0.0
        for e, tgt in enumerate(targets):
            net, opt_state, val = step(net, opt_state, pos, tgt,
                                       float(e))
            tot += float(val)
        if i == 0:
            first = tot
        last = tot
    assert last < 0.6 * first, (first, last)


def test_residual_sine_network(rng):
    from fvsrn_tpu.models.variants import ResidualSineNetwork
    net = ResidualSineNetwork.make(hidden=16, num_blocks=2,
                                   output_mode="density:direct", seed=4)
    x = jnp.asarray(rng.random((32, 3)), jnp.float32)
    y = net(x, mode="world")
    assert y.shape == (32, 1)
    assert np.isfinite(np.asarray(y)).all()
    # trains on the sphere
    import optax
    vol = VolumeInterpolationImplicit.make("SPHERE")
    world = vol.box_min + x * vol.box_size
    tgt = vol.eval_density(world)[0][:, None]
    opt = optax.adam(2e-4)  # SIREN-style nets want small lr

    @jax.jit
    def step(net, s):
        val, g = jax.value_and_grad(
            lambda n: jnp.mean((n(x, mode="world") - tgt) ** 2))(net)
        upd, s = opt.update(g, s)
        return optax.apply_updates(net, upd), s, val

    s = opt.init(net)
    first = last = None
    for i in range(100):
        net, s, v = step(net, s)
        first = float(v) if first is None else first
        last = float(v)
    assert last < 0.7 * first


def test_modulated_sine_network(rng):
    from fvsrn_tpu.models.latent import LatentSpace
    from fvsrn_tpu.models.variants import ModulatedSineNetwork
    latent = LatentSpace(ensemble_vector=jnp.asarray(
        rng.random((1, 4, 3)), jnp.float32))
    net = ModulatedSineNetwork.make(hidden=16, num_layers=2,
                                    latent=latent, seed=5)
    x = jnp.asarray(rng.random((16, 3)), jnp.float32)
    y0 = net(x, ensemble=jnp.zeros(16))
    y2 = net(x, ensemble=jnp.full((16,), 2.0))
    assert y0.shape == (16, 1)
    assert np.isfinite(np.asarray(y0)).all()
    assert not np.allclose(np.asarray(y0), np.asarray(y2))
