"""End-to-end golden regression: the tiny fused swap with fixed PRNG keys
must keep producing the same image across refactors (SURVEY.md §4d).

Regenerate tests/golden/tiny_swap_v1.npz ONLY for intentional numerics
changes, and say so in the commit message.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.pipelines import FaceSwapper, tiny_swap_config

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_swap_v1.npz")


def test_tiny_swap_matches_golden():
    cfg = tiny_swap_config(image_size=64, ddim_steps=3)
    params = FaceSwapper.init_params(cfg, jax.random.key(0))
    sw = FaceSwapper(cfg, params)
    ks = jax.random.split(jax.random.key(42), 5)
    batch = dict(
        target_image=jax.random.uniform(ks[0], (1, 64, 64, 3), minval=-1, maxval=1),
        inpaint_image=jax.random.uniform(ks[1], (1, 64, 64, 3), minval=-1, maxval=1),
        inpaint_mask=(jax.random.uniform(ks[2], (1, 64, 64, 1)) > 0.5).astype(
            jnp.float32
        ),
        ref_clip224=jax.random.normal(ks[3], (1, 224, 224, 3)),
        landmarks=jax.random.uniform(ks[4], (1, 136)) * 64,
    )
    out = np.asarray(sw.swap(**batch, key=jax.random.key(7)))
    golden = np.load(GOLDEN)["out"]
    np.testing.assert_allclose(out, golden, atol=2e-4)
