"""Multi-process smoke worker: one DP step on a 2-process global CPU mesh.

Launched (2x) by tests/test_multihost.py and usable standalone:

  python tools/mh_smoke.py <process_id> <num_processes> <port> <outdir>

Each process: jax.distributed init (gloo CPU collectives), global
(data, model) mesh over all processes' devices, PrefetchLoader slicing of
the GLOBAL batch, shard_params/shard_batch global-array assembly, one
jitted SGD step whose gradient all-reduce XLA inserts over the mesh —
the multi-node DDP role (/root/reference/main.py:23,511,521) the jax way.
Writes {loss, grad_norm, indices, param_after} JSON for the parent to
cross-check process agreement.
"""

import json
import os
import sys


def main():
    proc_id, nproc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from reface_tpu.data.loader import PrefetchLoader
    from reface_tpu.parallel.mesh import (
        create_mesh,
        init_distributed,
        shard_batch,
        shard_params,
    )

    pid, pcount = init_distributed(f"localhost:{port}", nproc, proc_id)
    assert (pid, pcount) == (proc_id, nproc), (pid, pcount)

    class ToyDataset:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            x = rng.normal(size=(4,)).astype(np.float32)
            return {"x": x, "y": np.sum(x, keepdims=True).astype(np.float32),
                    "idx": np.asarray([i], np.int64)}

    mesh = create_mesh()
    assert mesh.devices.size == 2 * nproc  # 2 local CPU devices per process

    seen = []

    def to_batch(raw):
        seen.extend(int(v) for v in raw.pop("idx")[:, 0])
        return shard_batch(raw, mesh)

    loader = PrefetchLoader(
        ToyDataset(), batch_size=8, shuffle=True, seed=0,
        device_put=to_batch, process_index=pid, process_count=pcount,
    )

    params = {"w": np.zeros((4, 1), np.float32), "b": np.zeros((1,), np.float32)}
    params = shard_params(params, mesh)

    @jax.jit
    def step(p, batch):
        def loss_fn(p):
            pred = batch["x"] @ p["w"] + p["b"]
            return jnp.mean((pred - batch["y"]) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(p)
        gnorm = jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree.leaves(g)))
        p = jax.tree.map(lambda a, b: a - 0.1 * b, p, g)
        return p, loss, gnorm

    with mesh:
        batch = next(iter(loader))
        params, loss, gnorm = step(params, batch)

    out = {
        "process": pid,
        "loss": float(loss),
        "grad_norm": float(gnorm),
        "indices": seen,
        "w_after": np.asarray(jax.device_get(params["w"]))[:, 0].tolist(),
        "global_devices": int(jax.device_count()),
    }
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump(out, f)
    print("[mh_smoke]", out)


if __name__ == "__main__":
    main()
