"""PointNet++ MSG backbone (batch variant) for point-based detectors.

Capability parity with pcdet/models/backbones_3d/pointnet2_backbone.py:9-94
(PointNet2MSG: 4 set-abstraction levels with multi-scale grouping, then 4
feature-propagation levels back to the full point set) and the
pointnet2_batch CUDA modules it drives (SURVEY.md §2.6 'pointnet2_batch ops').

TPU-native design: fixed point counts per level (FPS indices are static
shapes), ball query/grouping/three_nn from ops/, masked supports. The MLPs
are Dense stacks over (B, M, S, C) — XLA fuses them into batched GEMMs.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.neighbor import (ball_query, grouping_operation, three_interpolate,
                            three_nn)
from ..ops.sampling import farthest_point_sampling


@dataclasses.dataclass(frozen=True)
class PointNet2Config:
    """KITTI PointRCNN defaults (upstream pointrcnn.yaml SA_CONFIG)."""
    npoints: Tuple[int, ...] = (4096, 1024, 256, 64)
    radii: Tuple[Tuple[float, ...], ...] = ((0.1, 0.5), (0.5, 1.0),
                                            (1.0, 2.0), (2.0, 4.0))
    nsamples: Tuple[Tuple[int, ...], ...] = ((16, 32), (16, 32), (16, 32),
                                             (16, 32))
    sa_mlps: Tuple[Tuple[Tuple[int, ...], ...], ...] = (
        ((16, 16, 32), (32, 32, 64)),
        ((64, 64, 128), (64, 96, 128)),
        ((128, 196, 256), (128, 196, 256)),
        ((256, 256, 512), (256, 384, 512)),
    )
    fp_mlps: Tuple[Tuple[int, ...], ...] = ((128, 128), (256, 256),
                                            (512, 512), (512, 512))
    use_xyz: bool = True


def _mlp(x, widths, name, train):
    for i, w in enumerate(widths):
        x = nn.Dense(w, use_bias=False, name=f"{name}_{i}")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         name=f"{name}_{i}_bn")(x)
        x = nn.relu(x)
    return x


class SAModuleMSG(nn.Module):
    """One batch SA level: FPS centers + multi-scale group/MLP/max."""
    npoint: int
    radii: Tuple[float, ...]
    nsamples: Tuple[int, ...]
    mlps: Tuple[Tuple[int, ...], ...]
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, features: Optional[jnp.ndarray],
                 valid: jnp.ndarray, train: bool = False):
        """xyz (B,N,3), features (B,N,C)|None, valid (B,N) ->
        (new_xyz (B,np,3), new_feats (B,np,C'), new_valid (B,np))."""
        def sample(x, v):
            idx = farthest_point_sampling(x, self.npoint, v)
            return x[idx], v[idx]

        new_xyz, new_valid = jax.vmap(sample)(xyz, valid)
        outs = []
        for i, (r, ns, mlp) in enumerate(zip(self.radii, self.nsamples,
                                             self.mlps)):
            def group(x, f, v, nx):
                idx, empty = ball_query(r, ns, x, nx, v)
                gx = grouping_operation(x, idx) - nx[:, None, :]
                if f is not None:
                    gf = grouping_operation(f, idx)
                    g = jnp.concatenate([gx, gf], -1) if self.use_xyz else gf
                else:
                    g = gx
                return g, empty

            if features is None:
                grouped, empty = jax.vmap(
                    lambda x, v, nx: group(x, None, v, nx))(xyz, valid,
                                                            new_xyz)
            else:
                grouped, empty = jax.vmap(group)(xyz, features, valid,
                                                 new_xyz)
            h = _mlp(grouped, mlp, f"mlp{i}", train)
            h = jnp.max(h, axis=2)
            h = h * (~empty)[..., None].astype(h.dtype)
            outs.append(h)
        feats = jnp.concatenate(outs, -1)
        return new_xyz, feats * new_valid[..., None].astype(feats.dtype), \
            new_valid


class FPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + MLP."""
    mlp: Tuple[int, ...]

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 known_valid, train: bool = False):
        def interp(u, k, kf, kv):
            dist, idx = three_nn(u, k, kv)
            return three_interpolate(kf, idx, dist)

        interpolated = jax.vmap(interp)(unknown, known, known_feats,
                                        known_valid)
        if unknown_feats is not None:
            x = jnp.concatenate([interpolated, unknown_feats], -1)
        else:
            x = interpolated
        return _mlp(x, self.mlp, "mlp", train)


class PointNet2MSG(nn.Module):
    """Full encoder-decoder over raw points -> per-point features
    (pointnet2_backbone.py:56-94)."""
    cfg: PointNet2Config = PointNet2Config()

    @nn.compact
    def __call__(self, points: jnp.ndarray, valid: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """points (B, N, 3+C) -> (B, N, fp_mlps[0][-1])."""
        c = self.cfg
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        l_xyz, l_feats, l_valid = [xyz], [feats], [valid]
        for k in range(len(c.npoints)):
            nx, nf, nv = SAModuleMSG(
                c.npoints[k], c.radii[k], c.nsamples[k], c.sa_mlps[k],
                c.use_xyz, name=f"sa{k}")(l_xyz[k], l_feats[k], l_valid[k],
                                          train)
            l_xyz.append(nx)
            l_feats.append(nf)
            l_valid.append(nv)

        for i in range(len(c.fp_mlps) - 1, -1, -1):
            l_feats[i] = FPModule(c.fp_mlps[i], name=f"fp{i}")(
                l_xyz[i], l_xyz[i + 1], l_feats[i], l_feats[i + 1],
                l_valid[i + 1], train)
        return l_feats[0] * valid[..., None].astype(l_feats[0].dtype)
