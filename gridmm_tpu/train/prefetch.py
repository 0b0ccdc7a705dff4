"""Asynchronous host->device batch prefetching.

The reference overlaps host data work with device compute via CUDA-stream
prefetch (pretrain_src/data/loader.py:90-124 PrefetchLoader). The jax
equivalent: a background thread stages the NEXT batch onto the device
(device_put is async) while the current step runs, so the accelerator never
waits on host collation or PCIe/tunnel transfer."""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax


def device_prefetch(batches: Iterable, size: int = 2,
                    device=None) -> Iterator:
    """Wrap a host batch iterator; yields device-resident batches.

    `size` bounds the number of staged batches (device memory x size)."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    END = object()
    err: list = []

    def producer():
        try:
            for batch in batches:
                staged = jax.device_put(batch, device)
                q.put(staged)
        except Exception as e:  # surface producer errors to the consumer
            err.append(e)
        finally:
            q.put(END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is END:
            if err:
                raise err[0]
            return
        yield item
