"""Multi-host utilities: cross-process eval merging and metric reduction.

TPU-native replacement for the reference's dormant distributed plumbing
(SURVEY.md §2.7/§5.8): pcdet's pickle-based ``all_gather``
(commu_utils.py:50-111), ``reduce_dict``/``all_reduce`` (:114-168) and the
filesystem-based ``merge_results_dist`` (common_utils.py:211-232) become
``jax.experimental.multihost_utils`` collectives over the mesh — no NCCL/Gloo
transport layer to manage.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def allgather_arrays(x: Any) -> Any:
    """Gather a pytree of per-host numpy arrays across hosts along axis 0.

    The ``merge_results_dist`` / ``commu_utils.all_gather`` analogue for eval
    results; single-process runs return the input unchanged.
    """
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils
    return jax.tree_util.tree_map(
        lambda a: np.asarray(multihost_utils.process_allgather(
            np.asarray(a))).reshape((-1,) + np.asarray(a).shape[1:]), x)


def reduce_metrics_mean(metrics: Dict[str, float]) -> Dict[str, float]:
    """Average scalar metrics across hosts (``reduce_dict`` analogue)."""
    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils
    keys = sorted(metrics)
    vec = np.asarray([float(metrics[k]) for k in keys], np.float32)
    summed = multihost_utils.process_allgather(vec).reshape(-1, len(keys))
    mean = summed.mean(axis=0)
    return {k: float(v) for k, v in zip(keys, mean)}


def merge_eval_records(records: List) -> List:
    """Concatenate per-host detection/GT record lists across hosts.

    Records are arbitrary python tuples, exchanged as pickled byte buffers:
    first an allgather of buffer lengths, then an allgather of max-length
    padded buffers (process_allgather requires uniform shapes).
    """
    if jax.process_count() == 1:
        return records
    from jax.experimental import multihost_utils
    buf = _encode(records)
    lengths = multihost_utils.process_allgather(
        np.asarray([len(buf)], np.int64)).reshape(-1)
    max_len = int(lengths.max())
    padded = np.zeros((max_len,), np.uint8)
    padded[:len(buf)] = buf
    all_bufs = multihost_utils.process_allgather(padded).reshape(-1, max_len)
    merged: List = []
    for i in range(jax.process_count()):
        merged.extend(_decode(all_bufs[i, :int(lengths[i])]))
    return merged


def _encode(records: List) -> np.ndarray:
    import pickle
    raw = pickle.dumps(records)
    return np.frombuffer(raw, np.uint8)


def _decode(buf: np.ndarray) -> List:
    import pickle
    return pickle.loads(bytes(np.asarray(buf, np.uint8)))
