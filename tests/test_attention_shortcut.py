"""Single-token cross-attention shortcut must equal full attention exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from reface_tpu.nn.layers import CrossAttention
from reface_tpu.ops.attention import multi_head_attention


def _full_attention_reference(params, x, ctx, heads, dim_head):
    """The unshortcut path, computed manually from the same params."""
    wq = params["params"]["to_q"]["kernel"]
    wk = params["params"]["to_k"]["kernel"]
    wv = params["params"]["to_v"]["kernel"]
    wo = params["params"]["to_out"]["kernel"]
    bo = params["params"]["to_out"]["bias"]
    q = x @ wq
    k = ctx @ wk
    v = ctx @ wv
    out = multi_head_attention(q, k, v, heads, use_flash=False)
    return out @ wo + bo


def test_single_token_context_exact():
    m = CrossAttention(query_dim=32, context_dim=16, heads=4, dim_head=8)
    x = jax.random.normal(jax.random.key(0), (2, 10, 32))
    ctx = jax.random.normal(jax.random.key(1), (2, 1, 16))
    p = m.init(jax.random.key(2), x, ctx)
    out = m.apply(p, x, ctx)
    ref = _full_attention_reference(p, x, ctx, 4, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_multi_token_context_unchanged():
    m = CrossAttention(query_dim=32, context_dim=16, heads=4, dim_head=8)
    x = jax.random.normal(jax.random.key(0), (2, 10, 32))
    ctx = jax.random.normal(jax.random.key(1), (2, 3, 16))
    p = m.init(jax.random.key(2), x, ctx)
    out = m.apply(p, x, ctx)
    ref = _full_attention_reference(p, x, ctx, 4, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_split_context_single_token_exact():
    """1536-wide single-token context through the head-split path."""
    m = CrossAttention(query_dim=64, context_dim=768, heads=8, dim_head=8,
                       head_splits=(6, 2))
    x = jax.random.normal(jax.random.key(0), (1, 5, 64))
    ctx = jax.random.normal(jax.random.key(1), (1, 1, 1536))
    p = m.init(jax.random.key(2), x, ctx)
    out = m.apply(p, x, ctx)

    # manual: v = concat(to_v(c1)[:48], to_v(c2)[-16:]); softmax(1 key)=1
    wv = p["params"]["to_v"]["kernel"]
    wo = p["params"]["to_out"]["kernel"]
    bo = p["params"]["to_out"]["bias"]
    c1, c2 = np.split(np.asarray(ctx), 2, axis=-1)
    v1 = c1 @ np.asarray(wv)
    v2 = c2 @ np.asarray(wv)
    v = np.concatenate([v1[..., :48], v2[..., -16:]], -1)
    ref = np.broadcast_to(v, (1, 5, 64)) @ np.asarray(wo) + np.asarray(bo)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_int8_quant_block_close_and_tree_stable():
    """Serving-mode int8 (UNetConfig.quant) must keep the param tree
    identical and stay within ~2% of the fp32 block output (non-vacuous:
    asserts the path actually changes the numbers)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reface_tpu.nn.unet import TransformerBlock

    x = jax.random.normal(jax.random.key(0), (2, 64, 96))
    ctx = jax.random.normal(jax.random.key(1), (2, 1, 768))
    b0 = TransformerBlock(96, 4, 768, dtype=jnp.float32, attn_impl="einsum")
    b1 = TransformerBlock(96, 4, 768, dtype=jnp.float32, attn_impl="einsum",
                          quant="int8")
    p = b0.init(jax.random.key(2), x, ctx)
    assert jax.tree.structure(p) == jax.tree.structure(
        b1.init(jax.random.key(2), x, ctx)
    )
    o0 = np.asarray(b0.apply(p, x, ctx))
    o1 = np.asarray(b1.apply(p, x, ctx))
    d = np.abs(o0 - o1)
    assert d.max() > 0, "int8 path not exercised"
    assert d.max() / np.abs(o0).max() < 0.05


def test_int8_dense_accuracy():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reface_tpu.ops.quant import int8_dense

    x = jax.random.normal(jax.random.key(0), (7, 33, 96))
    w = jax.random.normal(jax.random.key(1), (96, 64)) * 0.05
    ref = np.asarray(x @ w)
    got = np.asarray(int8_dense(x, w, out_dtype=jnp.float32))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.02


def test_int8_resblock_close_and_tree_stable():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reface_tpu.nn.unet import ResBlock

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 24))
    emb = jax.random.normal(jax.random.key(1), (2, 48))
    r0 = ResBlock(32, dtype=jnp.float32)
    r1 = ResBlock(32, dtype=jnp.float32, quant="int8")
    p = r0.init(jax.random.key(2), x, emb)
    assert jax.tree.structure(p) == jax.tree.structure(
        r1.init(jax.random.key(2), x, emb)
    )
    o0 = np.asarray(r0.apply(p, x, emb))
    o1 = np.asarray(r1.apply(p, x, emb))
    d = np.abs(o0 - o1)
    assert d.max() > 0, "int8 conv path not exercised"
    assert d.max() / np.abs(o0).max() < 0.05


def test_int8_vae_resnetblock_close_and_tree_stable():
    """VAEConfig.quant="int8" routes the ResnetBlock convs through QConv;
    the param tree must be unchanged (checkpoints load either way) and the
    output must stay within serving tolerance of fp32."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reface_tpu.nn.vae import ResnetBlock

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 24))
    r0 = ResnetBlock(32, dtype=jnp.float32)
    r1 = ResnetBlock(32, dtype=jnp.float32, quant="int8")
    p = r0.init(jax.random.key(2), x)
    assert jax.tree.structure(p) == jax.tree.structure(
        r1.init(jax.random.key(2), x)
    )
    o0 = np.asarray(r0.apply(p, x))
    o1 = np.asarray(r1.apply(p, x))
    d = np.abs(o0 - o1)
    assert d.max() > 0, "int8 conv path not exercised"
    assert d.max() / np.abs(o0).max() < 0.05


def test_int8_conv_accuracy_and_per_sample_scales():
    """int8_conv quantizes activations with PER-SAMPLE scales: an outlier
    in one batch element must not degrade the other elements' outputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reface_tpu.ops.quant import int8_conv

    x = jax.random.normal(jax.random.key(0), (3, 9, 9, 16))
    w = jax.random.normal(jax.random.key(1), (3, 3, 16, 24)) * 0.05
    ref = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    got = np.asarray(int8_conv(x, w, out_dtype=jnp.float32))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.02
    # blow up sample 0 by 100x; samples 1/2 must quantize as before
    x_hot = x.at[0].multiply(100.0)
    got_hot = np.asarray(int8_conv(x_hot, w, out_dtype=jnp.float32))
    np.testing.assert_allclose(got_hot[1:], got[1:], rtol=0, atol=1e-6)


def test_int8_full_swap_pipeline_close_to_exact():
    """End-to-end guard on the --quant int8 serving mode: the tiny swap
    pipeline with UNet+VAE int8 must produce finite output within a loose
    serving tolerance of the exact path (same params, same PRNG). Catches
    wiring bugs (wrong scale broadcast, dtype leaks) that otherwise only
    the on-chip tools/compare_modes.py run would see."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from reface_tpu.pipelines.swap import FaceSwapper, tiny_swap_config

    cfg0 = tiny_swap_config(image_size=64, ddim_steps=2)
    cfg1 = dataclasses.replace(
        cfg0,
        unet=dataclasses.replace(cfg0.unet, quant="int8"),
        vae=dataclasses.replace(cfg0.vae, quant="int8"),
    )
    params = FaceSwapper.init_params(cfg0, jax.random.key(0))
    ks = jax.random.split(jax.random.key(1), 5)
    b, s = 2, 64
    batch = dict(
        target_image=jax.random.uniform(ks[0], (b, s, s, 3), minval=-1, maxval=1),
        inpaint_image=jax.random.uniform(ks[1], (b, s, s, 3), minval=-1, maxval=1),
        inpaint_mask=(jax.random.uniform(ks[2], (b, s, s, 1)) > 0.5).astype(
            jnp.float32
        ),
        ref_clip224=jax.random.normal(ks[3], (b, 224, 224, 3)),
        landmarks=jax.random.uniform(ks[4], (b, 136)) * s,
    )
    o0 = np.asarray(FaceSwapper(cfg0, params).swap(**batch, key=jax.random.key(2)))
    o1 = np.asarray(FaceSwapper(cfg1, params).swap(**batch, key=jax.random.key(2)))
    assert np.isfinite(o1).all()
    d = np.abs(o0 - o1)
    assert d.max() > 0, "int8 path not exercised"
    # output range is [-1, 1]; int8 deltas accumulated over the sampler
    # stay well under this at tiny size (measured ~0.05 max)
    assert d.max() < 0.5


def test_int8conv_quantizes_convs_not_transformer():
    """quant="int8conv" (round 4): ResBlock/ResnetBlock convs run the int8
    path (output differs from fp32), while the transformer matmuls keep
    EXACT dense math (TransformerBlock output bitwise-equals quant="none").
    Motivated by the round-4 chain ablation: int8 on the transformer side
    is a net loss (quantize/dequantize VPU cost > MXU gain), on the conv
    side a 2.37 ms/fwd win (BENCH_LOG 'Round-4 conv-side attribution')."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reface_tpu.nn.unet import ResBlock, TransformerBlock

    x = jax.random.normal(jax.random.key(0), (2, 64, 96))
    ctx = jax.random.normal(jax.random.key(1), (2, 1, 768))
    b0 = TransformerBlock(96, 4, 768, dtype=jnp.float32, attn_impl="einsum")
    b1 = TransformerBlock(96, 4, 768, dtype=jnp.float32, attn_impl="einsum",
                          quant="int8conv")
    p = b0.init(jax.random.key(2), x, ctx)
    np.testing.assert_array_equal(
        np.asarray(b0.apply(p, x, ctx)), np.asarray(b1.apply(p, x, ctx))
    )

    xr = jax.random.normal(jax.random.key(3), (2, 8, 8, 24))
    emb = jax.random.normal(jax.random.key(4), (2, 48))
    r0 = ResBlock(32, dtype=jnp.float32)
    r1 = ResBlock(32, dtype=jnp.float32, quant="int8conv")
    pr = r0.init(jax.random.key(5), xr, emb)
    assert jax.tree.structure(pr) == jax.tree.structure(
        r1.init(jax.random.key(5), xr, emb)
    )
    o0 = np.asarray(r0.apply(pr, xr, emb))
    o1 = np.asarray(r1.apply(pr, xr, emb))
    d = np.abs(o0 - o1)
    assert d.max() > 0, "int8conv conv path not exercised"
    assert d.max() / np.abs(o0).max() < 0.05
