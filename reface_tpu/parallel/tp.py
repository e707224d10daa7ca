"""Tensor-parallel sharding rules for the UNet (model axis).

The reference has no TP (SURVEY.md §2.7); this is the TPU-native extension
for large-batch 512px serving and training headroom: attention/FF kernels
shard over the `model` mesh axis (column-parallel to_q/to_k/to_v/FF-in,
row-parallel to_out/FF-out — the Megatron pattern), conv kernels shard over
output channels. With params placed under these NamedShardings and the batch
sharded over `data`, GSPMD propagates the layout and inserts the ICI
collectives; no manual psum calls.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from reface_tpu.parallel.mesh import MODEL_AXIS

__all__ = ["unet_tp_spec", "shard_params_tp"]

# column-parallel (shard output features): last dim of the kernel
_COL_SUFFIXES = ("to_q", "to_k", "to_v", "proj_in")
# row-parallel (shard input features): first dim of the kernel
_ROW_SUFFIXES = ("to_out", "proj_out")


def unet_tp_spec(path_keys: tuple[str, ...], shape: tuple[int, ...]) -> P:
    """PartitionSpec for one UNet param, by flax path + shape."""
    keys = [str(k) for k in path_keys]
    leaf = keys[-1]
    parent = keys[-2] if len(keys) > 1 else ""
    gparent = keys[-3] if len(keys) > 2 else ""

    if leaf != "kernel":
        return P()  # biases/norm scales replicated (tiny)

    # attention / FF dense layers inside transformer blocks
    if parent in _COL_SUFFIXES and len(shape) == 2:
        return P(None, MODEL_AXIS)
    if parent in _ROW_SUFFIXES and len(shape) == 2:
        return P(MODEL_AXIS, None)
    if gparent == "ff":
        # GEGLU: proj_in column-parallel, proj_out row-parallel (handled above)
        return P()

    # convs: shard output channels when they tile evenly over the axis
    if len(shape) == 4 and shape[-1] % 2 == 0 and shape[-1] >= 128:
        return P(None, None, None, MODEL_AXIS)
    if len(shape) == 2 and shape[-1] % 2 == 0 and shape[-1] >= 512:
        return P(None, MODEL_AXIS)
    return P()


def shard_params_tp(params, mesh: Mesh):
    """Place the {'unet','vae','conditioner',...} params with TP layout on
    the UNet and replication elsewhere."""

    axis_size = mesh.shape[MODEL_AXIS]

    def place(tree, rule):
        flat = jax.tree_util.tree_flatten_with_path(tree)
        _, treedef = jax.tree_util.tree_flatten(tree)
        out = []
        for (path, leaf) in flat[0]:
            keys = tuple(getattr(k, "key", str(k)) for k in path)
            spec = rule(keys, leaf.shape)
            # replicate anything the model axis doesn't divide evenly
            for dim, name in enumerate(spec):
                if name == MODEL_AXIS and leaf.shape[dim] % axis_size != 0:
                    spec = P()
                    break
            out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
        return jax.tree_util.tree_unflatten(treedef, out)

    placed = {}
    for name, tree in params.items():
        if name == "unet":
            placed[name] = place(tree, unet_tp_spec)
        else:
            placed[name] = place(tree, lambda k, s: P())
    return placed
