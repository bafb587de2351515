"""Device-side batch prefetching — no host stalls in the step loop.

The host pipeline (CTDataModule) decodes batches on background threads; this
wrapper additionally moves them to device (with the target sharding) ahead
of the consumer so jitted steps never wait on H2D transfer — the TPU-native
replacement for torch DataLoader's pin_memory + non-blocking copies
(reference utils/load_nrrd_dataset.py:105-109) and the BASELINE "stream
volumes without host stalls" requirement.
"""
from __future__ import annotations

import collections
from typing import Iterator, Optional

import jax


def device_prefetch(
    iterator: Iterator,
    size: int = 2,
    sharding: Optional[object] = None,
) -> Iterator:
    """Yield batches that are already on device.

    iterator: yields pytrees of host arrays. sharding: a Sharding (or pytree
    of shardings) for jax.device_put; None = default device placement.
    """
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    for batch in iterator:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
