"""Iterator pipelining: prefetch/parallel-map over chunk streams.

Counterpart of /root/reference/packages/vaex-core/vaex/itertools.py
(pmap/buffer/pwait — the IO pipelining that overlaps S3 reads with compute):
`buffer` runs the producer ahead on a thread so the consumer of chunk i never
waits for chunk i+1's host-side read/eval — the reference's
evaluate_iterator(prefetch=True) pattern (dataframe.py:3112-3166)."""

from __future__ import annotations

import concurrent.futures
import queue
import threading


def buffer(iterator, n=2):
    """Yield from `iterator` while a background thread keeps up to `n`
    items materialized ahead."""
    q = queue.Queue(maxsize=n)
    sentinel = object()
    error = []

    def produce():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # noqa: BLE001
            error.append(e)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=produce, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item


def pmap(f, iterator, pool=None, max_workers=4):
    """Parallel ordered map over an iterator (reference: itertools.pmap)."""
    own_pool = pool is None
    pool = pool or concurrent.futures.ThreadPoolExecutor(max_workers=max_workers)
    try:
        futures = []
        iterator = iter(iterator)
        # prime
        for item in iterator:
            futures.append(pool.submit(f, item))
            if len(futures) >= max_workers:
                break
        for item in iterator:
            yield futures.pop(0).result()
            futures.append(pool.submit(f, item))
        while futures:
            yield futures.pop(0).result()
    finally:
        if own_pool:
            pool.shutdown(wait=False)


def pwait(iterator):
    """Resolve an iterator of futures in order (reference: itertools.pwait)."""
    for future in iterator:
        yield future.result() if hasattr(future, "result") else future


def consume(iterator):
    for _ in iterator:
        pass
