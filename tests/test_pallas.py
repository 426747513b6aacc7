"""Pallas kernel correctness (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from multimodal_gar_tpu.ops.pallas import subm_conv_pallas, subm_conv_xla


def test_subm_conv_pallas_matches_xla(rng):
    m, k, c, d = 128, 27, 16, 16
    feats = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
    nbr = jnp.asarray(rng.integers(-1, m, (m, k)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(k, c, d)).astype(np.float32) * 0.1)
    out_p = subm_conv_pallas(feats, nbr, w, block_m=64)
    out_x = subm_conv_xla(feats, nbr, w)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-2, atol=2e-2)  # bf16 internal matmuls


def test_subm_conv_pallas_absent_neighbors(rng):
    m, k, c, d = 64, 27, 8, 8
    feats = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
    nbr = jnp.full((m, k), -1, jnp.int32)             # all absent -> zeros
    w = jnp.asarray(rng.normal(size=(k, c, d)).astype(np.float32))
    out = subm_conv_pallas(feats, nbr, w, block_m=64)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_stem_conv_pallas_interpret_parity():
    """Pallas stem-conv kernel logic vs lax.conv (interpret mode on CPU;
    the hardware parity test lives in tools/bench_stem.py)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from multimodal_gar_tpu.ops.pallas.stem_conv import stem_conv_pallas

    rng = np.random.default_rng(0)
    xd = jnp.asarray(rng.normal(size=(1, 15, 19, 132, 12))
                     .astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(7, 4, 4, 12, 64))
                     .astype(np.float32) * 0.05)
    ref = jax.lax.conv_general_dilated(
        xd, w2, (2, 1, 1), [(3, 3), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = stem_conv_pallas(xd, w2, interpret=True)
    # 3-pass bf16 split: ~1e-5 relative; budget 1e-3 (VERDICT criterion)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_stem_conv_pallas_interpret_fused_affine():
    """Folded-BN epilogue: relu(conv * scale + bias) inside the kernel."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from multimodal_gar_tpu.ops.pallas.stem_conv import stem_conv_pallas

    rng = np.random.default_rng(1)
    xd = jnp.asarray(rng.normal(size=(1, 9, 11, 68, 12)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(7, 4, 4, 12, 64))
                     .astype(np.float32) * 0.05)
    sc = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    bi = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    conv = jax.lax.conv_general_dilated(
        xd, w2, (2, 1, 1), [(3, 3), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    ref = jnp.maximum(conv * sc + bi, 0.0)
    got = stem_conv_pallas(xd, w2, scale=sc, bias=bi, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_stem_conv_pallas_dimajor_interpret_parity():
    """Round-5 di-major stem kernel vs lax.conv AND vs the dj-major kernel
    (identical sums — same bf16 product split, different patch assembly)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from multimodal_gar_tpu.ops.pallas.stem_conv import stem_conv_pallas

    rng = np.random.default_rng(2)
    xd = jnp.asarray(rng.normal(size=(1, 15, 19, 132, 12))
                     .astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(7, 4, 4, 12, 64))
                     .astype(np.float32) * 0.05)
    sc = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    bi = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    conv = jax.lax.conv_general_dilated(
        xd, w2, (2, 1, 1), [(3, 3), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    ref = jnp.maximum(conv * sc + bi, 0.0)
    for passes in (1, 3):
        got = stem_conv_pallas(xd, w2, scale=sc, bias=bi, interpret=True,
                               passes=passes, dimajor=True)
        v1 = stem_conv_pallas(xd, w2, scale=sc, bias=bi, interpret=True,
                              passes=passes)
        # vs f32 ref: bounded by the bf16 product split (passes=1 is plain
        # bf16 — v1 measures the same 4.3e-2 max on this fixture)
        tol = 1e-3 if passes == 3 else 5e-2
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=tol, rtol=tol)
        # vs the dj-major kernel: same products, different accumulation
        # order (4 K=560 partial dots vs one K=2240 dot) => ulp-level only
        np.testing.assert_allclose(np.asarray(got), np.asarray(v1),
                                   atol=1e-4, rtol=0)


def test_stem_conv_pallas_cmajor_interpret_parity():
    """Round-5 cout-major-output stem variant: identical dots to the
    dj-major kernel, output written as a sublane split instead of 8
    per-program (cout, n) transposes => BITWISE equal to the default."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from multimodal_gar_tpu.ops.pallas.stem_conv import stem_conv_pallas

    rng = np.random.default_rng(3)
    xd = jnp.asarray(rng.normal(size=(1, 15, 19, 132, 12))
                     .astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(7, 4, 4, 12, 64))
                     .astype(np.float32) * 0.05)
    sc = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    bi = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    for passes in (1, 3):
        got = stem_conv_pallas(xd, w2, scale=sc, bias=bi, interpret=True,
                               passes=passes, cmajor=True)
        base = stem_conv_pallas(xd, w2, scale=sc, bias=bi, interpret=True,
                                passes=passes)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_stem_conv_pallas_pipelined_interpret_parity():
    """Round-5 aliased-BlockSpec (pipelined) stem kernel: identical dots to
    the manual-DMA dj-major kernel — the 8 aliased blocks merge into the
    exact window the DMA fetched — so BITWISE equal, plain and fused."""
    import numpy as np
    import jax.numpy as jnp

    from multimodal_gar_tpu.ops.pallas.stem_conv import stem_conv_pallas

    rng = np.random.default_rng(4)
    # odd T (flagship parity), single w-chunk (w_out 128 post-align)
    xd = jnp.asarray(rng.normal(size=(2, 9, 19, 131, 12))
                     .astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(7, 4, 4, 12, 64))
                     .astype(np.float32) * 0.05)
    sc = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    bi = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    got = stem_conv_pallas(xd, w2, interpret=True, passes=1, pipelined=True)
    base = stem_conv_pallas(xd, w2, interpret=True, passes=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))
    gotf = stem_conv_pallas(xd, w2, scale=sc, bias=bi, interpret=True,
                            passes=1, pipelined=True)
    basef = stem_conv_pallas(xd, w2, scale=sc, bias=bi, interpret=True,
                             passes=1)
    np.testing.assert_array_equal(np.asarray(gotf), np.asarray(basef))
    # fallback geometries (multi-chunk W, passes=3) must still be correct:
    # pipelined silently degrades to the manual-DMA kernel
    xd2 = jnp.asarray(rng.normal(size=(1, 7, 12, 700, 12))
                      .astype(np.float32))
    got2 = stem_conv_pallas(xd2, w2, interpret=True, passes=1,
                            pipelined=True)
    base2 = stem_conv_pallas(xd2, w2, interpret=True, passes=1)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(base2))
