"""Inception-v1 I3D video backbone in Flax (NDHWC layout).

Capability parity with reference model/backbone.py:99-425 (Unit3D same-padding
conv stacks, MaxPool3dSamePadding, InceptionModule, InceptionI3d endpoints),
redesigned for TPU: channels-last layout so XLA tiles the 3D convolutions onto
the MXU, TF-style 'SAME' padding natively (the torch code re-implements TF SAME
by hand; under static shapes flax's padding='SAME' is identical), optional
bfloat16 compute.

Frozen Kinetics-pretrained usage (reference gat_model.py:987-997): load
converted weights via ``i3d_convert.convert_torch_checkpoint`` and wrap the
apply in ``jax.lax.stop_gradient``.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# endpoint name -> builder order, matching reference VALID_ENDPOINTS
# (backbone.py:254-273).
VALID_ENDPOINTS = (
    "Conv3d_1a_7x7",
    "MaxPool3d_2a_3x3",
    "Conv3d_2b_1x1",
    "Conv3d_2c_3x3",
    "MaxPool3d_3a_3x3",
    "Mixed_3b",
    "Mixed_3c",
    "MaxPool3d_4a_3x3",
    "Mixed_4b",
    "Mixed_4c",
    "Mixed_4d",
    "Mixed_4e",
    "Mixed_4f",
    "MaxPool3d_5a_2x2",
    "Mixed_5b",
    "Mixed_5c",
)

# endpoint -> output channels (for downstream sizing)
ENDPOINT_CHANNELS = {
    "Mixed_3b": 256, "Mixed_3c": 480, "Mixed_4b": 512, "Mixed_4c": 512,
    "Mixed_4d": 512, "Mixed_4e": 528, "Mixed_4f": 832, "Mixed_5b": 832,
    "Mixed_5c": 1024,
}


def _same_pad(dim: int, k: int, s: int) -> Tuple[int, int]:
    out = -(-dim // s)
    total = max((out - 1) * s + k - dim, 0)
    return total // 2, total - total // 2


def _s2d_prep(x: jnp.ndarray, w: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Space-to-depth the stem input and weights: x (B,T,H,W,C) ->
    xd (B,T,H/2+,W/2+,4C); w (7,7,7,C,O) -> w2 (7,4,4,4C,O). The 7^3
    stride-2 stem then becomes a (7,4,4) stride-(2,1,1) conv with identical
    outputs."""
    b, t, h, wd, c = x.shape
    kt = w.shape[0]
    cout = w.shape[-1]

    def axis_pad(dim):
        f, bk = _same_pad(dim, 7, 2)
        length = dim + f + bk
        if length % 2:
            bk += 1
        return f, bk

    fh, bh = axis_pad(h)
    fw, bw = axis_pad(wd)
    xp = jnp.pad(x, ((0, 0), (0, 0), (fh, bh), (fw, bw), (0, 0)))
    qh = xp.shape[2] // 2
    qw = xp.shape[3] // 2
    xd = xp.reshape(b, t, qh, 2, qw, 2, c)
    xd = xd.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, qh, qw, 4 * c)

    # kernel: w2[t, jh, jw, (eh, ew, c), o] = w[t, 2*jh+eh, 2*jw+ew, c, o]
    w8 = jnp.pad(w, ((0, 0), (0, 1), (0, 1), (0, 0), (0, 0)))   # zero tap 7
    w2 = w8.reshape(kt, 4, 2, 4, 2, c, cout)
    w2 = w2.transpose(0, 1, 3, 2, 4, 5, 6).reshape(kt, 4, 4, 4 * c, cout)
    return xd, w2


def _stem_conv_s2d(x: jnp.ndarray, w: jnp.ndarray, stride_t: int = 2
                   ) -> jnp.ndarray:
    """The 7x7x7/stride-2 stem conv via space-to-depth on H and W.

    With C_in=3 the direct strided conv runs at ~4 TFLOP/s on TPU (measured
    16 ms at flagship shapes); folding 2x2 spatial blocks into channels turns
    it into a (7,4,4) stride-(2,1,1) conv over 4*C_in channels with identical
    outputs (tested) at ~6x the throughput. Weights stay in the original
    (7,7,7,Cin,Cout) layout so checkpoint conversion is unaffected.
    """
    xd, w2 = _s2d_prep(x, w)
    kt = w.shape[0]
    ft, bt = _same_pad(x.shape[1], kt, stride_t)
    return jax.lax.conv_general_dilated(
        xd, w2, window_strides=(stride_t, 1, 1),
        padding=[(ft, bt), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _stem_ref_s2d(xd: jnp.ndarray, w2: jnp.ndarray, s: jnp.ndarray,
                  b: jnp.ndarray) -> jnp.ndarray:
    """XLA reference of the fused Pallas stem on s2d'd inputs:
    relu(conv(xd, w2) * s + b) with the kernel's fixed (3,3) temporal pad."""
    y = jax.lax.conv_general_dilated(
        xd, w2, window_strides=(2, 1, 1),
        padding=[(3, 3), (0, 0), (0, 0)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return nn.relu(y * s + b)


from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _pallas_stem_op(interp: bool, passes: int, dimajor: bool, cmajor: bool,
                    pipelined: bool, xd: jnp.ndarray, w2: jnp.ndarray,
                    s: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Fused stem conv+BN+ReLU: Pallas kernel forward, XLA-reference VJP
    (pallas_call has no AD rule; the train step differentiates through the
    frozen eval-mode stem, so a working backward is required)."""
    from ..ops.pallas.stem_conv import stem_conv_pallas
    return stem_conv_pallas(xd, w2, scale=s, bias=b, interpret=interp,
                            passes=passes, dimajor=dimajor, cmajor=cmajor,
                            pipelined=pipelined)


def _pallas_stem_fwd(interp, passes, dimajor, cmajor, pipelined,
                     xd, w2, s, b):
    return (_pallas_stem_op(interp, passes, dimajor, cmajor, pipelined,
                            xd, w2, s, b), (xd, w2, s, b))


def _pallas_stem_bwd(interp, passes, dimajor, cmajor, pipelined, res, g):
    _, vjp = jax.vjp(_stem_ref_s2d, *res)
    return vjp(g)


_pallas_stem_op.defvjp(_pallas_stem_fwd, _pallas_stem_bwd)


class _StemKernel(nn.Module):
    """Holds the stem conv kernel at params path <name>/kernel."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


def _pallas_stem_mode() -> Tuple[bool, bool]:
    """(use_pallas, interpret) gate for the Pallas stem kernel.

    Active on real TPU backends; CPU tests can opt in to interpret mode via
    MGAR_PALLAS_INTERPRET=1 (tiny shapes only — interpret is slow).
    """
    import os
    if jax.default_backend() == "tpu":
        return True, False
    if os.environ.get("MGAR_PALLAS_INTERPRET"):
        return True, True
    return False, False


def _conv3d_t2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3)/stride-1 SAME conv as 3 temporally-shifted 2D convs.

    out[:, t] = sum_dt conv2d(x[:, t + dt - 1], kernel[dt]) with zero pads
    at the T edges — identical sums to the 3D conv, but each term runs on
    the TPU's native 2D convolution path with T folded into the batch dim.
    """
    b, t, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dt in range(3):
        xs = jax.lax.dynamic_slice_in_dim(xp, dt, t, axis=1)
        y = jax.lax.conv_general_dilated(
            xs.reshape(b * t, h, w, c), kernel[dt], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = y if out is None else out + y
    return out.reshape(b, t, h, w, -1)


class Unit3D(nn.Module):
    """Conv3D (SAME pad, no bias) + BatchNorm(eps=1e-3, momentum=0.01) + ReLU.

    Reference: backbone.py:134-206. ``s2d_stem`` selects the space-to-depth
    fast path for the 7^3/stride-2 stem (exact same outputs); on TPU the
    eval-mode stem additionally runs as a Pallas im2col-GEMM kernel with the
    inference BatchNorm + ReLU folded into its epilogue
    (ops/pallas/stem_conv.py) unless ``pallas_stem`` is False.

    ``t_pad``: explicit temporal padding for the temporal-cone-culled path
    (InceptionI3d.center_slice) — the (3,3,3)/stride-1 conv pads (pl, pr)
    zeros on T instead of SAME, producing input_T - 2 + pl + pr outputs.
    SAME on H/W is unchanged.
    """
    out_channels: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_batch_norm: bool = True
    use_bias: bool = False
    activation: bool = True
    s2d_stem: bool = False
    pallas_stem: bool = True
    # bf16 product split of the Pallas stem (ops/pallas/stem_conv.py): 3 =
    # designed error-compensated, 1 = plain bf16 (~half the kernel's DMA +
    # patch copies, a third of its MXU issue). This image's Mosaic degrades
    # the 3-pass to 1.6e-3 anyway, so 1 costs ~no accuracy here.
    stem_passes: int = 3
    # round-5 di-major stem kernel variant: one lane-shifted patch per dj
    # instead of one per (row pair, dj) — identical sums, ~45% less VMEM
    # copy traffic (ops/pallas/stem_conv.py:_stem_kernel_dimajor).
    stem_dimajor: bool = False
    # round-5 cout-major-output stem variant: writes (2, cout, n) sublane
    # splits instead of 8 per-program (cout, n) VPU transposes; one
    # XLA-side HBM transpose outside the kernel. Identical sums.
    stem_cmajor: bool = False
    # round-5 aliased-BlockSpec stem: the window arrives through 8 aliased
    # block-spec'd views (no manual DMA), so the Pallas grid pipeline
    # prefetches program i+1's window during program i's compute. Identical
    # sums; requires passes=1 (falls back to the manual-DMA kernel when the
    # geometry doesn't fit — ops/pallas/stem_conv.py).
    stem_pipelined: bool = False
    t_pad: Tuple[int, int] | None = None
    # eval-path (3,3,3)/stride-1 convs as 3 temporally-shifted NATIVE 2D
    # convs summed (T folded into batch): exact same sums, but each conv
    # maps onto the TPU's native 2D convolution path instead of XLA's 3D
    # lowering. Perf experiment for the post-stem I3D cost.
    t2d: bool = False
    # eval-mode BN fold: conv+BN+ReLU becomes conv(W*s)+b+ReLU, removing the
    # per-activation normalize pass across the ~60 frozen convs (VERDICT r2
    # weak #8). Variable tree is unchanged (bn stats still live at bn/*).
    fold_bn: bool = True
    dtype: Any = jnp.float32

    def _padding(self):
        """SAME, or explicit ((pl, pr), (1, 1), (1, 1)) in t_pad mode."""
        if self.t_pad is None:
            return "SAME"
        assert self.kernel == (3, 3, 3) and self.stride == (1, 1, 1), (
            "t_pad is only defined for the (3,3,3)/stride-1 convs", self.kernel)
        return (tuple(self.t_pad), (1, 1), (1, 1))

    def _bn_affine(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(scale, bias) of the inference BatchNorm, creating the bn
        variables through a channel-shaped dummy call so the param/stat tree
        is identical to the unfolded path (checkpoint-compatible)."""
        bn = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                          momentum=0.99, dtype=self.dtype, name="bn")
        bn(jnp.zeros((1, self.out_channels), self.dtype))
        v = bn.variables
        gamma = v["params"]["scale"].astype(jnp.float32)
        beta = v["params"]["bias"].astype(jnp.float32)
        mean = v["batch_stats"]["mean"].astype(jnp.float32)
        var = v["batch_stats"]["var"].astype(jnp.float32)
        s = gamma * jax.lax.rsqrt(var + 1e-3)
        return s, beta - mean * s

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        fold = (self.fold_bn and self.use_batch_norm and not train
                and not self.use_bias)
        if self.s2d_stem:
            assert self.kernel == (7, 7, 7) and self.stride == (2, 2, 2)
            # parameter lives at the canonical conv3d/kernel path so the
            # checkpoint converter is oblivious to the fast path
            kernel = _StemKernel(
                self.kernel + (x.shape[-1], self.out_channels),
                name="conv3d")()
            use_pallas, interp = _pallas_stem_mode()
            # odd T only: the kernel's symmetric (3,3) temporal pad matches
            # TF-SAME there (flagship T=15); even T SAME pads (2,3).
            use_pallas = (use_pallas and self.pallas_stem and not train
                          and self.dtype == jnp.float32
                          and x.shape[1] % 2 == 1
                          and self.use_batch_norm and self.activation)
            if use_pallas:
                return self._pallas_stem(x, kernel, interp)
            if fold:
                s, b = self._bn_affine()
                kernel = kernel * s
            x = _stem_conv_s2d(x.astype(self.dtype),
                               kernel.astype(self.dtype))
        elif fold:
            s, b = self._bn_affine()
            kernel = _StemKernel(
                self.kernel + (x.shape[-1], self.out_channels),
                name="conv3d")()
            kf = (kernel * s).astype(self.dtype)
            if (self.t2d and self.kernel == (3, 3, 3)
                    and self.stride == (1, 1, 1) and self.t_pad is None):
                x = _conv3d_t2d(x.astype(self.dtype), kf)
            else:
                x = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), kf,
                    window_strides=self.stride, padding=self._padding(),
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        else:
            x = nn.Conv(self.out_channels, self.kernel, strides=self.stride,
                        padding=self._padding(), use_bias=self.use_bias,
                        dtype=self.dtype, name="conv3d")(x)
        if fold:
            x = x + b.astype(x.dtype)
        elif self.use_batch_norm:
            # torch momentum 0.01 == flax momentum 0.99
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             momentum=0.99, dtype=self.dtype, name="bn")(x)
        if self.activation:
            x = nn.relu(x)
        return x

    def _pallas_stem(self, x: jnp.ndarray, kernel: jnp.ndarray,
                     interp: bool) -> jnp.ndarray:
        """Eval-mode stem via the Pallas im2col GEMM with the inference
        BatchNorm + ReLU folded into the kernel epilogue. The bn submodule's
        variables are created through a channel-shaped dummy call so the
        param/stat tree is identical to the XLA path (checkpoint-compatible).
        """
        xd, w2 = _s2d_prep(x.astype(jnp.float32), kernel.astype(jnp.float32))
        s, b = self._bn_affine()
        return _pallas_stem_op(interp, self.stem_passes, self.stem_dimajor,
                               self.stem_cmajor, self.stem_pipelined,
                               xd, w2, s, b)


def max_pool_same(x: jnp.ndarray, window: Tuple[int, int, int],
                  strides: Tuple[int, int, int],
                  t_pad: Tuple[int, int] | None = None) -> jnp.ndarray:
    """3D max pool with TF-SAME padding over (T, H, W) of an NDHWC tensor.

    Kept as ONE fused reduce_window: a per-axis separable decomposition was
    tried (exact, and 6x faster in isolation) but regressed the full model
    10.5 -> 8.2 clips/s — XLA fuses the single window into neighbors while
    the 3-pass version materializes intermediates in HBM.

    ``t_pad``: explicit (pl, pr) temporal padding (reduce_window pads with
    -inf, identical to SAME's edge behavior) for the temporal-cone-culled
    path; H/W stay SAME.
    """
    if t_pad is not None:
        assert window == (3, 3, 3) and strides == (1, 1, 1)
        return nn.max_pool(x, window_shape=window, strides=strides,
                           padding=(tuple(t_pad), (1, 1), (1, 1)))
    return nn.max_pool(x, window_shape=window, strides=strides, padding="SAME")


class InceptionModule(nn.Module):
    """Four-branch inception block (reference backbone.py:210-235).

    ``t_pad`` (temporal-cone mode): the input covers exactly the temporal
    backward cone [lo-1+pl, hi+1-pr) of the needed output interval [lo, hi);
    the 3x3x3 branches pad (pl, pr) zeros on T (pl=1 iff lo==0, pr=1 iff
    hi==T — exactly where TF-SAME would pad), and the 1x1 branches slice to
    the center so all four branches emit [lo, hi). Output values are
    position-for-position identical to the SAME-mode module.
    """
    out_channels: Sequence[int]    # [b0, b1a, b1b, b2a, b2b, b3b]
    t2d: bool = False
    t_pad: Tuple[int, int] | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        oc = self.out_channels
        tp = self.t_pad
        if tp is None:
            xc = x
        else:
            pl, pr = tp
            xc = x[:, (1 - pl):(x.shape[1] - (1 - pr))]
        b0 = Unit3D(oc[0], (1, 1, 1), dtype=self.dtype, name="b0")(xc, train)
        b1 = Unit3D(oc[1], (1, 1, 1), dtype=self.dtype, name="b1a")(x, train)
        b1 = Unit3D(oc[2], (3, 3, 3), t2d=self.t2d, t_pad=tp,
                    dtype=self.dtype, name="b1b")(b1, train)
        b2 = Unit3D(oc[3], (1, 1, 1), dtype=self.dtype, name="b2a")(x, train)
        b2 = Unit3D(oc[4], (3, 3, 3), t2d=self.t2d, t_pad=tp,
                    dtype=self.dtype, name="b2b")(b2, train)
        b3 = max_pool_same(x, (3, 3, 3), (1, 1, 1), t_pad=tp)
        b3 = Unit3D(oc[5], (1, 1, 1), dtype=self.dtype, name="b3b")(b3, train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# module configs keyed by endpoint (reference backbone.py:307-376)
_INCEPTION_CFG = {
    "Mixed_3b": [64, 96, 128, 16, 32, 32],
    "Mixed_3c": [128, 128, 192, 32, 96, 64],
    "Mixed_4b": [192, 96, 208, 16, 48, 64],
    "Mixed_4c": [160, 112, 224, 24, 64, 64],
    "Mixed_4d": [128, 128, 256, 24, 64, 64],
    "Mixed_4e": [112, 144, 288, 32, 64, 64],
    "Mixed_4f": [256, 160, 320, 32, 128, 128],
    "Mixed_5b": [256, 160, 320, 32, 128, 128],
    "Mixed_5c": [384, 192, 384, 48, 128, 128],
}


class InceptionI3d(nn.Module):
    """I3D feature extractor up to ``final_endpoint``.

    Input: (B, T, H, W, 3) NDHWC clips. Output: (B, T', H', W', C') features.
    For final_endpoint='Mixed_4f' (the reference's config): spatial stride 16
    (conv1a + pool2a + pool3a + pool4a), temporal stride 4, C' = 832. A (15,
    720, 1280) clip yields (4, 45, 80, 832).
    """
    final_endpoint: str = "Mixed_4f"
    pallas_stem: bool = True
    stem_passes: int = 3        # Unit3D.stem_passes of the Conv3d_1a stem
    stem_dimajor: bool = False  # Unit3D.stem_dimajor of the Conv3d_1a stem
    stem_cmajor: bool = False   # Unit3D.stem_cmajor of the Conv3d_1a stem
    stem_pipelined: bool = False  # Unit3D.stem_pipelined of the stem
    # rematerialize each Inception module's activations in the backward pass
    # (jax.checkpoint): trades recompute FLOPs for activation HBM, enabling
    # larger per-chip train batches (VERDICT r2 weak #2).
    remat: bool = False
    # temporal-cone culling: the model consumes ONLY the center time slice of
    # Mixed_4f (reference gat_model.py:1050); with center_slice=True each
    # Mixed_4x module computes only the temporal positions inside the
    # backward cone of that slice (exact dead-code elimination XLA cannot do
    # through conv windows — at flagship T=15/T4=4, Mixed_4f computes 1/4 of
    # its positions and Mixed_4e 3/4). Output is (B, 1, H', W', C'), value-
    # identical to full_output[:, T4 // 2]. Only defined for Mixed_4f.
    center_slice: bool = False
    # eval-path (3,3,3) convs as 3 shifted native 2D convs (Unit3D.t2d)
    t2d: bool = False
    # eval-path batched forward as stem (batched — scales flat, ROUND5_NOTES
    # batch table) + Python-unrolled per-clip body: XLA's folded-batch layout
    # of the small Mixed_4x convs executes super-linearly (the I3D body's
    # per-clip cost inflates 1.5x from b1 to b4 at IDENTICAL per-clip
    # FLOPs/bytes — tools/probe_i3d_hlo.py), while B copies of the b1 body
    # keep each clip on the b1 fast path. Same fix as the sparse backbone's
    # batched_window_gather unroll. Exact: eval-mode BN uses running stats,
    # so per-item == batched position-for-position.
    batch_unroll: bool = False
    dtype: Any = jnp.float32
    # post-stem compute dtype (None = dtype). bfloat16 here keeps the f32
    # Pallas stem (which is f32-gated) while the ~60 post-stem convs run on
    # the MXU's native bf16 path — the round-2 full-bf16 measurement
    # silently lost the Pallas stem, which is why it looked like a wash.
    body_dtype: Any = None

    @staticmethod
    def _center_plan(t_in: int):
        """Backward temporal cone of Mixed_4f's center slice.

        Returns (plan, entry): plan maps each Mixed_4x endpoint to the
        ``t_pad`` its InceptionModule runs with (None = uncull, plain SAME),
        entry is the [lo, hi) slice of the MaxPool3d_4a output that the first
        module consumes. Intervals nest exactly — each module's planned input
        interval equals the previous module's planned output interval — so
        the forward just threads the sliced tensor through. All arithmetic is
        static (Python ints), so the culled model traces to fixed shapes.
        """
        t1 = -(-t_in // 2)          # after the stride-2 stem (SAME)
        t4 = -(-t1 // 2)            # after MaxPool3d_4a (stride 2, SAME)
        lo, hi = t4 // 2, t4 // 2 + 1
        plan = {}
        for ep in ("Mixed_4f", "Mixed_4e", "Mixed_4d", "Mixed_4c",
                   "Mixed_4b"):
            pl = 1 if lo == 0 else 0
            pr = 1 if hi == t4 else 0
            # (1,1) pads <=> the full output interval is needed <=> SAME
            plan[ep] = None if (pl, pr) == (1, 1) else (pl, pr)
            lo, hi = max(lo - 1, 0), min(hi + 1, t4)
        return plan, (lo, hi)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dtype
        bd = self.body_dtype if self.body_dtype is not None else d
        plan, entry = None, None
        if self.center_slice:
            assert self.final_endpoint == "Mixed_4f", (
                "center_slice is only defined for Mixed_4f",
                self.final_endpoint)
            plan, entry = self._center_plan(x.shape[1])
        # train is a Python bool branching the BN-fold path; keep it static
        # under remat (argnum 2: flax prepends the module instance).
        mixed_cls = nn.remat(InceptionModule, static_argnums=(2,)) \
            if self.remat else InceptionModule
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), s2d_stem=True,
                   pallas_stem=self.pallas_stem,
                   stem_passes=self.stem_passes,
                   stem_dimajor=self.stem_dimajor,
                   stem_cmajor=self.stem_cmajor,
                   stem_pipelined=self.stem_pipelined,
                   dtype=d, name="Conv3d_1a_7x7")(x, train)
        if self.final_endpoint == "Conv3d_1a_7x7":
            return x

        # body module INSTANCES created once — the unrolled per-clip passes
        # below re-call the same instances, so parameters are shared and the
        # param tree is identical to the batched path (names are explicit,
        # so init values match too).
        units = {}
        for ep in VALID_ENDPOINTS[1:]:
            if ep == "Conv3d_2b_1x1":
                units[ep] = Unit3D(64, (1, 1, 1), dtype=bd, name=ep)
            elif ep == "Conv3d_2c_3x3":
                units[ep] = Unit3D(192, (3, 3, 3), t2d=self.t2d, dtype=bd,
                                   name=ep)
            elif ep in _INCEPTION_CFG:
                tp = plan.get(ep) if plan is not None else None
                units[ep] = mixed_cls(_INCEPTION_CFG[ep], t2d=self.t2d,
                                      t_pad=tp, dtype=bd, name=ep)
            if ep == self.final_endpoint:
                break

        def body(xx):
            for ep in VALID_ENDPOINTS[1:]:
                if ep == "MaxPool3d_2a_3x3":
                    xx = max_pool_same(xx, (1, 3, 3), (1, 2, 2))
                elif ep == "MaxPool3d_3a_3x3":
                    xx = max_pool_same(xx, (1, 3, 3), (1, 2, 2))
                elif ep == "MaxPool3d_4a_3x3":
                    xx = max_pool_same(xx, (3, 3, 3), (2, 2, 2))
                    if entry is not None:
                        xx = xx[:, entry[0]:entry[1]]
                elif ep == "MaxPool3d_5a_2x2":
                    xx = max_pool_same(xx, (2, 2, 2), (2, 2, 2))
                else:
                    xx = units[ep](xx, train)
                if ep == self.final_endpoint:
                    return xx
            raise ValueError(f"unknown endpoint {self.final_endpoint}")

        if self.batch_unroll and not train and x.shape[0] > 1:
            return jnp.concatenate(
                [body(x[i:i + 1]) for i in range(x.shape[0])], axis=0)
        return body(x)
