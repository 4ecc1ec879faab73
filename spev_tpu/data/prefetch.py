"""Background-thread batch prefetching.

The train loop's host work (npz loads + collate) must overlap device
compute or it becomes the throughput ceiling: a bf16 train step is ~21 ms
on a v5e while staging a 16-row batch from the npz cache costs a similar
order single-threaded.  ``prefetch`` runs the producer iterator in a
daemon thread with a small bounded queue, so batch N+1 stages while step N
executes — composing with the trainer's lag-1 metrics fetch
(``train/trainer.py``) for a fully pipelined host loop.

Order is preserved exactly; producer exceptions re-raise at the consumer's
next pull.  If the consumer abandons the generator early the producer
thread parks on the bounded queue and dies with the process (daemon) —
acceptable for epoch iterators, do not wrap infinite streams you plan to
abandon often.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_END = object()


def prefetch(iterable: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Yield ``iterable``'s items in order, produced ``depth`` ahead by a
    background thread.  ``depth <= 0`` returns the iterable's iterator
    unchanged (useful to disable for determinism-sensitive debugging)."""
    if depth <= 0:
        return iter(iterable)

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err: list = []

    def worker() -> None:
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            q.put(_END)

    threading.Thread(target=worker, daemon=True, name="spev-prefetch").start()

    def consume() -> Iterator[T]:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item

    return consume()
