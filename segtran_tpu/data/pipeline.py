"""Input pipeline: seeded shuffling, thread-pool loading, device prefetch.

Replaces the reference's torch DataLoader(num_workers=4) + DistributedSampler
(reference train2d.py:844-875): shuffling is an explicit seeded permutation
per epoch (set_epoch semantics), batches are host-stacked numpy, and a
double-buffered prefetcher overlaps host IO with device compute. Under a mesh,
batches are device_put with a 'data'-axis sharding, which replaces per-rank
sampler sharding (every host loads its own shard of the global batch when
running multi-host).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence

import jax
import numpy as np


def epoch_indices(n: int, epoch: int, seed: int = 0,
                  shuffle: bool = True) -> np.ndarray:
    """DistributedSampler.set_epoch equivalent: deterministic per-epoch
    permutation."""
    if not shuffle:
        return np.arange(n)
    rng = np.random.RandomState((seed * 1_000_003 + epoch) % (2 ** 31))
    return rng.permutation(n)


def _stack(samples: Sequence[dict], keys: Optional[Sequence[str]] = None
           ) -> Dict[str, np.ndarray]:
    keys = keys or [k for k, v in samples[0].items()
                    if isinstance(v, (np.ndarray, np.floating, np.integer,
                                      float, int))]
    return {k: np.stack([np.asarray(s[k]) for s in samples]) for k in keys}


def batch_iterator(dataset, batch_size: int, epoch: int, seed: int = 0,
                   shuffle: bool = True, drop_last: bool = True,
                   num_threads: int = 4,
                   keys: Optional[Sequence[str]] = None
                   ) -> Iterator[Dict[str, np.ndarray]]:
    """Yield stacked numpy batches; sample loading fans out to threads."""
    from concurrent.futures import ThreadPoolExecutor
    idx = epoch_indices(len(dataset), epoch, seed, shuffle)
    n = len(idx)
    if drop_last:
        n = (n // batch_size) * batch_size
        if n == 0:
            # otherwise the caller's epoch loop spins forever on 0 batches
            raise ValueError(
                f"dataset has {len(idx)} samples, fewer than the batch size "
                f"{batch_size} (drop_last): lower --bs or add data")
    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        for s in range(0, n, batch_size):
            chunk = idx[s:s + batch_size]
            if len(chunk) < batch_size and drop_last:
                break
            samples = list(pool.map(dataset.__getitem__, chunk))
            yield _stack(samples, keys)


def prefetch_to_device(it: Iterator, size: int = 2,
                       sharding=None) -> Iterator:
    """Double-buffered host->device prefetch (the reference relies on
    DataLoader workers + implicit .cuda() copies, train2d.py:1147)."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    err: list = []

    def producer():
        try:
            for batch in it:
                if sharding is not None:
                    batch = jax.device_put(batch, sharding)
                else:
                    batch = jax.device_put(batch)
                q.put(batch)
        except BaseException as e:  # re-raised in the consumer thread
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            break
        yield item
