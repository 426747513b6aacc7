"""Additional sparse 3D backbones: residual encoder and UNet (PartA2).

Capability parity with pcdet/models/backbones_3d/:
  - SparseBasicBlock + VoxelResBackBone8x (spconv_backbone.py:30-67, 184-294)
  - UNetV2 (spconv_unet.py:14-212): the VoxelBackBone8x encoder plus a
    decoder of UR blocks (lateral residual block, concat with bottom, subm
    merge, channel-reduction residual, inverse conv up to the next-finer
    active set).

TPU-native design: the inverse sparse conv exploits spconv's indice_key
semantics — its output active set IS the encoder's pre-stride active set —
so SparseInverseConv3d takes the finer-stage SparseTensor as an explicit
target and gathers coarse neighbors per fine site (the transpose of
SparseConv3dDown's gather map), keeping every shape static.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.sparse_backbone import (SparseConvBlock, SparseTensor,
                                      SubMConv3d, _kernel_offsets_aniso,
                                      _tup3, _neighbor_idx_subm)
from ..ops import voxel as vox


class SparseBasicBlock(nn.Module):
    """Residual submanifold block (spconv_backbone.py:30-67):
    subm-conv+BN+ReLU -> subm-conv+BN -> +identity -> ReLU."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False,
                 neighbor_idx: jnp.ndarray | None = None) -> SparseTensor:
        if neighbor_idx is None:
            neighbor_idx = _neighbor_idx_subm(st.coords, st.valid,
                                              st.spatial_shape, 3)
        identity = st.features
        x = SubMConv3d(self.channels, dtype=self.dtype,
                       name="conv1")(st, neighbor_idx)
        f = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         name="bn1")(
            x.features, mask=jnp.broadcast_to(
                st.valid[..., None], x.features.shape) if train else None)
        f = nn.relu(f) * st.valid[..., None].astype(f.dtype)
        x = SubMConv3d(self.channels, dtype=self.dtype,
                       name="conv2")(x.replace(features=f), neighbor_idx)
        f = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         name="bn2")(
            x.features, mask=jnp.broadcast_to(
                st.valid[..., None], x.features.shape) if train else None)
        f = nn.relu(f + identity) * st.valid[..., None].astype(f.dtype)
        return st.replace(features=f)


class SparseInverseConv3d(nn.Module):
    """Inverse sparse conv: coarse -> the given fine active set
    (spconv.SparseInverseConv3d with a shared indice_key). For each fine
    voxel f, gathers coarse voxels o with f = o*stride - pad + k."""
    out_channels: int
    kernel_size: Any = 3
    stride: Any = 2
    padding: Any = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coarse: SparseTensor, fine_coords: jnp.ndarray,
                 fine_valid: jnp.ndarray,
                 fine_shape: Tuple[int, int, int]) -> SparseTensor:
        kz, ky, kx = _tup3(self.kernel_size)
        k3 = kz * ky * kx
        cin = coarse.features.shape[-1]
        w = self.param("kernel", nn.initializers.kaiming_normal(),
                       (k3, cin, self.out_channels))
        s = jnp.asarray(_tup3(self.stride), jnp.int32)
        p = jnp.asarray(_tup3(self.padding), jnp.int32)
        koffs = _kernel_offsets_aniso(self.kernel_size)

        def per_item(cc, cv, cf, fc, fv):
            table = vox.build_lookup(cc, cv, coarse.spatial_shape)
            num = fc[:, None, :] + p[None, None, :] - koffs[None, :, :]
            o = num // s
            exact = (o * s == num).all(axis=-1)
            qv = jnp.broadcast_to(fv[:, None], exact.shape) & exact
            idx = vox.lookup(table, o, qv, coarse.spatial_shape)  # (Mf, K3)
            hit = (idx >= 0)[..., None].astype(cf.dtype)
            return cf[jnp.clip(idx, 0)] * hit                     # (Mf,K3,C)

        gathered = jax.vmap(per_item)(coarse.coords, coarse.valid,
                                      coarse.features, fine_coords,
                                      fine_valid)
        out = jnp.einsum("bmkc,kcd->bmd", gathered.astype(self.dtype),
                         w.astype(self.dtype))
        out = out * fine_valid[..., None].astype(out.dtype)
        return SparseTensor(features=out, coords=fine_coords,
                            valid=fine_valid, spatial_shape=fine_shape)


class InverseConvBlock(nn.Module):
    """inverse conv + BN + ReLU (post_act_block conv_type='inverseconv')."""
    out_channels: int
    padding: Any = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, coarse: SparseTensor, fine: SparseTensor,
                 train: bool = False) -> SparseTensor:
        st = SparseInverseConv3d(self.out_channels, padding=self.padding,
                                 dtype=self.dtype,
                                 name="conv")(coarse, fine.coords, fine.valid,
                                              fine.spatial_shape)
        f = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         name="bn")(
            st.features, mask=jnp.broadcast_to(
                st.valid[..., None], st.features.shape) if train else None)
        f = nn.relu(f) * st.valid[..., None].astype(f.dtype)
        return st.replace(features=f)


class VoxelResBackbone8x(nn.Module):
    """Residual sparse encoder (VoxelResBackBone8x, spconv_backbone.py:184):
    channels 16/32/64/128, two SparseBasicBlocks per stage."""
    max_voxels_per_stage: Tuple[int, int, int, int] = (16000, 16000, 8000, 4000)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False
                 ) -> Dict[str, SparseTensor]:
        caps = self.max_voxels_per_stage
        x = SparseConvBlock(16, "subm", dtype=self.dtype,
                            name="conv_input")(st, train)
        nbr1 = _neighbor_idx_subm(x.coords, x.valid, x.spatial_shape, 3)
        x1 = SparseBasicBlock(16, self.dtype, name="res1_0")(x, train, nbr1)
        x1 = SparseBasicBlock(16, self.dtype, name="res1_1")(x1, train, nbr1)

        def down_and_res(x_in, ch, cap, pad, idx):
            x_ = SparseConvBlock(ch, "spconv", stride=2, padding=pad,
                                 max_out_voxels=cap, dtype=self.dtype,
                                 name=f"conv{idx}_down")(x_in, train)
            nbr = _neighbor_idx_subm(x_.coords, x_.valid, x_.spatial_shape, 3)
            x_ = SparseBasicBlock(ch, self.dtype,
                                  name=f"res{idx}_0")(x_, train, nbr)
            return SparseBasicBlock(ch, self.dtype,
                                    name=f"res{idx}_1")(x_, train, nbr)

        x2 = down_and_res(x1, 32, caps[1], 1, 2)
        x3 = down_and_res(x2, 64, caps[2], 1, 3)
        x4 = down_and_res(x3, 128, caps[3], (0, 1, 1), 4)
        return {"x_conv1": x1, "x_conv2": x2, "x_conv3": x3, "x_conv4": x4}


class UNetV2(nn.Module):
    """Sparse UNet (spconv_unet.py UNetV2): VoxelBackBone8x-shaped encoder
    plus UR-block decoder back to stride 1; emits per-voxel point features
    (16 ch) at the input active set and the multi-scale encoder tensors."""
    max_voxels_per_stage: Tuple[int, int, int, int] = (16000, 16000, 8000, 4000)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, st: SparseTensor, train: bool = False,
                 rulebook: Dict[str, jnp.ndarray] | None = None):
        from ..models.sparse_backbone import VoxelBackbone8x
        ms = VoxelBackbone8x(self.max_voxels_per_stage, self.dtype,
                             name="encoder")(st, train, rulebook)
        x1, x2, x3, x4 = (ms["x_conv1"], ms["x_conv2"], ms["x_conv3"],
                          ms["x_conv4"])

        def ur_block(lateral, bottom, fine, ch_mid, ch_out, idx, pad=1,
                     last_subm=False):
            """UR_block_forward (spconv_unet.py:135-143): conv_m merges the
            concat to ch_mid; the inverse conv maps ch_mid -> ch_out."""
            nbr = _neighbor_idx_subm(lateral.coords, lateral.valid,
                                     lateral.spatial_shape, 3)
            x_trans = SparseBasicBlock(lateral.features.shape[-1], self.dtype,
                                       name=f"up_t{idx}")(lateral, train, nbr)
            cat = x_trans.replace(features=jnp.concatenate(
                [bottom.features, x_trans.features], -1))
            x_m = SparseConvBlock(ch_mid, "subm", dtype=self.dtype,
                                  name=f"up_m{idx}")(cat, train, nbr)
            # channel_reduction: (N, C1) -> (N, C2) by summing C1/C2 groups
            n_groups = cat.features.shape[-1] // ch_mid
            red = cat.features.reshape(cat.features.shape[:-1]
                                       + (ch_mid, n_groups)).sum(-1)
            merged = x_m.replace(features=x_m.features + red)
            if last_subm:
                return SparseConvBlock(ch_out, "subm", dtype=self.dtype,
                                       name=f"up_out{idx}")(merged, train,
                                                            nbr)
            return InverseConvBlock(ch_out, padding=pad, dtype=self.dtype,
                                    name=f"inv{idx}")(merged, fine, train)

        x_up4 = ur_block(x4, x4, x3, 64, 64, 4, pad=(0, 1, 1))
        x_up3 = ur_block(x3, x_up4, x2, 64, 32, 3)
        x_up2 = ur_block(x2, x_up3, x1, 32, 16, 2)
        x_up1 = ur_block(x1, x_up2, x1, 16, 16, 1, last_subm=True)
        return x_up1, ms
