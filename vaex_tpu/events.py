"""Signal/slot events (reference: /root/reference/packages/vaex-core/vaex/events.py)."""

from __future__ import annotations


class Signal:
    def __init__(self, name=None):
        self.name = name
        self.callbacks = []

    def connect(self, callback, prepend=False):
        if prepend:
            self.callbacks.insert(0, callback)
        else:
            self.callbacks.append(callback)
        return callback

    def disconnect(self, callback):
        self.callbacks.remove(callback)

    def emit(self, *args, **kwargs):
        return [callback(*args, **kwargs) for callback in list(self.callbacks)]

    __call__ = emit
