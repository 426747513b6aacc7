"""Dataset registry: name -> adapter class, plus batch-iterator assembly.

Capability parity with pcdet/datasets/__init__.py:20-51 (__all__ registry +
build_dataloader:54-89): a single entry point resolves a dataset by its
config name and yields fixed-shape DetBatches for the detector zoo, with
the epoch-seeded deterministic sharding that replaces the reference's
DistributedSampler (datasets/__init__.py:31-51) — each host/process takes
`indices[epoch-shuffled][rank::world]`.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional, Sequence, Type

import numpy as np

_DATASETS: Dict[str, str] = {
    # name (as in pcdet DATASET configs) -> "module:Class"
    "KittiDataset": "kitti:KittiDataset",
    "NuScenesDataset": "nuscenes:NuScenesDataset",
    "WaymoDataset": "waymo:WaymoDataset",
    "LyftDataset": "lyft:LyftDataset",
    "ONCEDataset": "once:OnceDataset",
    "PandasetDataset": "pandaset:PandasetDataset",
    "Argo2Dataset": "argo2:Argo2Dataset",
    "CustomDataset": "custom:CustomDataset",
}


def available_datasets() -> Sequence[str]:
    return sorted(_DATASETS)


def build_dataset(name: str, **kwargs):
    """pcdet `__all__[dataset_cfg.DATASET]` analogue."""
    if name not in _DATASETS:
        raise KeyError(f"unknown dataset {name!r}; have {available_datasets()}")
    module_name, cls_name = _DATASETS[name].split(":")
    import importlib
    module = importlib.import_module(f".{module_name}", __package__)
    return getattr(module, cls_name)(**kwargs)


def det_batches(dataset, batch_size: int, voxel_size, max_voxels: int,
                *, shuffle: bool = True, seed: int = 0, epoch: int = 0,
                rank: int = 0, world: int = 1, drop_last: bool = True,
                with_indices: bool = False,
                **det_batch_kwargs) -> Iterator:
    """Deterministic sharded DetBatch iterator over `dataset`.

    Replaces the reference's DataLoader + DistributedSampler pair
    (pcdet/datasets/__init__.py:31-51, 71-78): the permutation is seeded
    by (seed, epoch) so every process computes the same order, then each
    rank takes its strided shard.

    With drop_last=False the remainder batch is padded to the fixed batch
    size by REPEATING the last frame (shapes must stay static for XLA).
    Evaluation loops must therefore iterate with `with_indices=True` —
    each yield becomes (real_indices, batch) where len(real_indices) <=
    batch_size — and keep only the first len(real_indices) per-item
    outputs; collecting one det_anno per batch row would otherwise
    double-count the repeated frame against dataset.evaluation's
    zip(det_annos, infos) alignment.
    """
    n = len(dataset)
    idx = np.arange(n)
    if shuffle:
        idx = np.random.default_rng((seed, epoch)).permutation(n)
    idx = idx[rank::world]
    stop = (len(idx) // batch_size * batch_size) if drop_last else len(idx)
    for s in range(0, stop, batch_size):
        chunk = idx[s:s + batch_size]
        real = list(map(int, chunk))
        if len(chunk) < batch_size and not drop_last:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], batch_size - len(chunk))])
        batch = dataset.det_batch(list(map(int, chunk)), voxel_size,
                                  max_voxels, **det_batch_kwargs)
        yield (real, batch) if with_indices else batch
