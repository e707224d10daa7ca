"""Mesh/sharding tests on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from reface_tpu.parallel import create_mesh, shard_batch, shard_params
from reface_tpu.parallel.tp import shard_params_tp, unet_tp_spec
from reface_tpu.pipelines.swap import FaceSwapper, tiny_swap_config


def test_create_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = create_mesh(n_data=4, n_model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_unet_tp_spec_rules():
    assert unet_tp_spec(("a", "attn1", "to_q", "kernel"), (320, 320)) == P(None, "model")
    assert unet_tp_spec(("a", "attn1", "to_out", "kernel"), (320, 320)) == P("model", None)
    assert unet_tp_spec(("x", "in_conv", "kernel"), (3, 3, 320, 320)) == P(
        None, None, None, "model"
    )
    assert unet_tp_spec(("x", "norm", "scale"), (320,)) == P()
    # small convs replicated
    assert unet_tp_spec(("x", "conv", "kernel"), (3, 3, 9, 32)) == P()


def test_unet_tp_spec_divides_real_size_params():
    """Apply the TP rules to the REAL 860M-param UNet shapes (eval_shape —
    no memory) and assert every model-sharded dim divides the axis size for
    2-, 4-, and 8-way TP (VERDICT weak #9)."""
    from reface_tpu.nn.unet import UNetConfig, UNetModel

    cfg = UNetConfig()  # full size
    model = UNetModel(cfg)
    shapes = jax.eval_shape(
        model.init, jax.random.key(0), jnp.zeros((1, 64, 64, 9)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 1, 768)),
    )
    flat = jax.tree_util.tree_flatten_with_path(shapes)[0]
    n_params = sum(int(np.prod(s.shape)) for _, s in flat)
    assert n_params == 859_535_364  # SD UNet + 9-ch conv_in delta

    n_sharded = 0
    sharded_params = 0
    for path, s in flat:
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        spec = unet_tp_spec(keys, s.shape)
        for dim, name in enumerate(spec):
            if name == "model":
                n_sharded += 1
                sharded_params += int(np.prod(s.shape))
                for ways in (2, 4, 8):
                    assert s.shape[dim] % ways == 0, (keys, s.shape, dim, ways)
    assert n_sharded > 100  # the bulk of the net actually shards
    assert sharded_params / n_params > 0.8


def test_tp_placement_and_train_step():
    mesh = create_mesh(n_data=4, n_model=2)
    cfg = tiny_swap_config(image_size=64, ddim_steps=2)
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    placed = shard_params_tp(params, mesh)
    # at least one UNet kernel actually sharded over the model axis
    shardings = [
        x.sharding.spec for x in jax.tree.leaves(placed["unet"])
        if hasattr(x, "sharding") and x.sharding.spec != P()
    ]
    assert len(shardings) > 0

    from reface_tpu.pipelines.train import TrainConfig, make_train_step

    step, _, init_state = make_train_step(cfg, TrainConfig(warmup_steps=2))
    state = init_state(placed)
    ks = jax.random.split(jax.random.key(1), 5)
    batch = shard_batch(
        dict(
            target_image=jax.random.uniform(ks[0], (4, 64, 64, 3), minval=-1, maxval=1),
            inpaint_image=jax.random.uniform(ks[1], (4, 64, 64, 3), minval=-1, maxval=1),
            inpaint_mask=jnp.ones((4, 64, 64, 1)),
            ref_clip224=jax.random.normal(ks[2], (4, 224, 224, 3)),
            landmarks=jax.random.uniform(ks[3], (4, 136)) * 64,
        ),
        mesh,
    )
    with mesh:
        state, metrics = jax.jit(step)(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
