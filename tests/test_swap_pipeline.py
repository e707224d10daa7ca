"""End-to-end tiny swap pipeline + sharded execution on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from reface_tpu.parallel import create_mesh, shard_batch, shard_params
from reface_tpu.pipelines import FaceSwapper, tiny_swap_config


def _batch(b, size):
    k = jax.random.split(jax.random.key(7), 5)
    return dict(
        target_image=jax.random.uniform(k[0], (b, size, size, 3), minval=-1, maxval=1),
        inpaint_image=jax.random.uniform(k[1], (b, size, size, 3), minval=-1, maxval=1),
        inpaint_mask=(jax.random.uniform(k[2], (b, size, size, 1)) > 0.5).astype(
            jnp.float32
        ),
        ref_clip224=jax.random.normal(k[3], (b, 224, 224, 3)),
        landmarks=jax.random.uniform(k[4], (b, 136)) * size,
    )


def test_swap_end_to_end_tiny():
    cfg = tiny_swap_config(image_size=64, ddim_steps=3)
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    swapper = FaceSwapper(cfg, params)
    b = _batch(2, 64)
    out = swapper.swap(**b, key=jax.random.key(1))
    assert out.shape == (2, 64, 64, 3)
    assert bool(jnp.isfinite(out).all())
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0


def test_swap_deterministic_given_key_and_xT():
    cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    swapper = FaceSwapper(cfg, params)
    b = _batch(1, 64)
    x_T = jax.random.normal(jax.random.key(9), (1, 8, 8, 4))
    o1 = swapper.swap(**b, key=jax.random.key(1), x_T=x_T)
    o2 = swapper.swap(**b, key=jax.random.key(1), x_T=x_T)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_swap_plms_sampler():
    cfg = tiny_swap_config(image_size=64, ddim_steps=3)
    cfg = cfg.__class__(**{**cfg.__dict__, "sampler": "plms"})
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    swapper = FaceSwapper(cfg, params)
    out = swapper.swap(**_batch(1, 64), key=jax.random.key(1))
    assert out.shape == (1, 64, 64, 3)
    assert bool(jnp.isfinite(out).all())


def test_swap_batch_sharded_on_mesh():
    """The swap must compile+run with a batch sharded over 8 CPU devices."""
    mesh = create_mesh()  # all 8 virtual devices on the data axis
    assert mesh.devices.size == 8
    cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    swapper = FaceSwapper(cfg, params)
    b = shard_batch(_batch(8, 64), mesh)
    p = shard_params(params, mesh)
    swapper.params = p
    out = swapper.swap(**b, key=jax.random.key(1))
    assert out.shape == (8, 64, 64, 3)
    # result stays batch-sharded over the data axis
    assert len(out.sharding.device_set) == 8
