"""Minimal promise + delayed-DAG composition.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/promise.py
(aplus-style promises) and vaex/delayed.py (`@vaex.delayed`): lets users batch
many statistics with ``delay=True`` so the executor fuses them into a single
streaming pass — on TPU, into one compiled XLA program.
"""

from __future__ import annotations

import functools


class Promise:
    PENDING = "pending"
    FULFILLED = "fulfilled"
    REJECTED = "rejected"

    def __init__(self):
        self.state = Promise.PENDING
        self.value = None
        self.reason = None
        self._callbacks = []

    @staticmethod
    def fulfilled(value):
        p = Promise()
        p.fulfill(value)
        return p

    @staticmethod
    def rejected(reason):
        p = Promise()
        p.reject(reason)
        return p

    def fulfill(self, value):
        if self.state != Promise.PENDING:
            return
        # chain if value is itself a promise
        if isinstance(value, Promise):
            value.then(self.fulfill, self.reject)
            return
        self.state = Promise.FULFILLED
        self.value = value
        for on_ok, _ in self._callbacks:
            on_ok(value)
        self._callbacks = []

    def reject(self, reason):
        if self.state != Promise.PENDING:
            return
        self.state = Promise.REJECTED
        self.reason = reason
        for _, on_fail in self._callbacks:
            on_fail(reason)
        self._callbacks = []

    def then(self, on_fulfilled=None, on_rejected=None):
        result = Promise()

        def ok(value):
            try:
                out = on_fulfilled(value) if on_fulfilled is not None else value
                result.fulfill(out)
            except Exception as e:  # noqa: BLE001
                result.reject(e)

        def fail(reason):
            if on_rejected is not None:
                try:
                    out = on_rejected(reason)
                    result.fulfill(out)
                    return
                except Exception as e:  # noqa: BLE001
                    reason = e
            result.reject(reason)

        if self.state == Promise.FULFILLED:
            ok(self.value)
        elif self.state == Promise.REJECTED:
            fail(self.reason)
        else:
            self._callbacks.append((ok, fail))
        return result

    def end(self):
        def raise_it(reason):
            raise reason
        self.then(None, raise_it)

    def get(self):
        """Value if fulfilled; raises if rejected; error if pending."""
        if self.state == Promise.FULFILLED:
            return self.value
        if self.state == Promise.REJECTED:
            raise self.reason
        raise RuntimeError("promise still pending — call df.execute() first")

    @property
    def isFulfilled(self):
        return self.state == Promise.FULFILLED

    @property
    def isRejected(self):
        return self.state == Promise.REJECTED

    @property
    def isPending(self):
        return self.state == Promise.PENDING


def all_promises(promises):
    result = Promise()
    promises = list(promises)
    if not promises:
        result.fulfill([])
        return result
    values = [None] * len(promises)
    remaining = [len(promises)]

    def make_ok(i):
        def ok(value):
            values[i] = value
            remaining[0] -= 1
            if remaining[0] == 0:
                result.fulfill(list(values))
        return ok

    for i, p in enumerate(promises):
        p.then(make_ok(i), result.reject)
    return result


def delayed(f):
    """Compose functions over promises: args that are promises are awaited,
    the wrapped call returns a promise (reference: vaex/delayed.py).

    Works transparently on plain values too.
    """

    @functools.wraps(f)
    def wrapped(*args, **kwargs):
        arg_promises = [a if isinstance(a, Promise) else Promise.fulfilled(a) for a in args]
        kwarg_keys = list(kwargs)
        kwarg_promises = [kwargs[k] if isinstance(kwargs[k], Promise) else Promise.fulfilled(kwargs[k]) for k in kwarg_keys]

        everything = all_promises(arg_promises + kwarg_promises)

        def call(values):
            n = len(arg_promises)
            call_args = values[:n]
            call_kwargs = dict(zip(kwarg_keys, values[n:]))
            return f(*call_args, **call_kwargs)

        return everything.then(call)

    return wrapped


def delayed_args(*args):
    return all_promises([a if isinstance(a, Promise) else Promise.fulfilled(a) for a in args])


def delayed_list(values):
    return delayed_args(*values)


def delayed_dict(d):
    keys = list(d)

    @delayed
    def make(values):
        return dict(zip(keys, values))

    return make(delayed_list([d[k] for k in keys]))
