"""User-function serialization for pipeline state.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/serialize.py
+ expression.py FunctionSerializablePickle (:1434): UDFs registered on a
DataFrame are pickled into `state_get` so fitted pipelines ship to servers.
Functions marked `traceable` are jax-compatible and stay inside compiled
device passes.
"""

from __future__ import annotations

import base64

try:
    import cloudpickle as pickle  # lambdas & closures (reference uses vaex.serialize pickle)
except ImportError:  # pragma: no cover
    import pickle


class UserFunction:
    def __init__(self, name, f, traceable=False):
        self.name = name
        self.f = f
        self.traceable = traceable

    def __call__(self, *args, **kwargs):
        return self.f(*args, **kwargs)

    def host_callable(self):
        from .dispatch import StringOps

        def call(*args, **kwargs):
            args = [a.ar if isinstance(a, StringOps) else a for a in args]
            return self.f(*args, **kwargs)
        return call

    def encode(self):
        return dict(type="pickle", name=self.name, traceable=self.traceable,
                    data=base64.b64encode(pickle.dumps(self.f)).decode("ascii"))

    @classmethod
    def decode(cls, spec, trusted=True):
        if not trusted:
            raise ValueError("refusing to unpickle function from untrusted state")
        f = pickle.loads(base64.b64decode(spec["data"]))
        return cls(spec["name"], f, traceable=spec.get("traceable", False))


def traceable(f):
    """Mark a UDF as jax-traceable so `df.apply` keeps it on-device."""
    f._vaex_traceable = True
    return f
