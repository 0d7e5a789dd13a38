"""Typed serialization: JSON specs + out-of-band binary blobs.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/encoding.py
(Encoding:339, serialize/deserialize:428-487): registry-based codecs turn
tasks, binners, aggregations, dtypes, arrays, datasets and dataframe state
into wire-format messages — how the server ships work (server/), how
fingerprints and the result cache key (cache.py), and how pipeline state
round-trips (dataframe.state_get).
"""

from __future__ import annotations

import base64
import json
import struct

import numpy as np

try:
    import pyarrow as pa
except ImportError:  # pragma: no cover
    pa = None

registry = {}


def register(name):
    def wrapper(cls):
        registry[name] = cls
        return cls
    return wrapper


class Encoding:
    """Reference: vaex/encoding.py:339."""

    def __init__(self):
        self.blobs = {}
        self._blob_counter = 0

    # -- typed dispatch
    def encode(self, typename, value):
        return registry[typename].encode(self, value)

    def decode(self, typename, spec, **kwargs):
        return registry[typename].decode(self, spec, **kwargs)

    def encode_list(self, typename, values):
        return [self.encode(typename, v) for v in values]

    def decode_list(self, typename, specs, **kwargs):
        return [self.decode(typename, s, **kwargs) for s in specs]

    def encode_dict(self, typename, values):
        return {k: self.encode(typename, v) for k, v in values.items()}

    def decode_dict(self, typename, specs, **kwargs):
        return {k: self.decode(typename, s, **kwargs) for k, s in specs.items()}

    def encode_collection(self, typename, value):
        if isinstance(value, (list, tuple)):
            return self.encode_list(typename, value)
        if isinstance(value, dict):
            return self.encode_dict(typename, value)
        return self.encode(typename, value)

    # -- binary blobs (out-of-band)
    def add_blob(self, buffer) -> str:
        blob_id = f"blob-{self._blob_counter}"
        self._blob_counter += 1
        self.blobs[blob_id] = bytes(buffer)
        return blob_id

    def get_blob(self, blob_id) -> bytes:
        return self.blobs[blob_id]


@register("dtype")
class dtype_codec:
    @staticmethod
    def encode(encoding, dtype):
        from .datatype import DataType
        dt = DataType(dtype)
        if dt.is_arrow:
            return {"type": "arrow", "spec": str(dt.internal)}
        return {"type": "numpy", "spec": dt.numpy.str}

    @staticmethod
    def decode(encoding, spec):
        from .datatype import DataType
        if spec["type"] == "arrow":
            mapping = {"string": pa.string(), "large_string": pa.large_string()}
            return DataType(mapping.get(spec["spec"], None) or _arrow_type_from_str(spec["spec"]))
        return DataType(np.dtype(spec["spec"]))


def _arrow_type_from_str(s):
    simple = {"int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(), "int64": pa.int64(),
              "uint8": pa.uint8(), "uint16": pa.uint16(), "uint32": pa.uint32(), "uint64": pa.uint64(),
              "float": pa.float32(), "double": pa.float64(), "bool": pa.bool_(),
              "string": pa.string(), "large_string": pa.large_string()}
    if s in simple:
        return simple[s]
    raise ValueError(f"cannot decode arrow type {s!r}")


@register("ndarray")
class ndarray_codec:
    """Reference: encoding.py ndarray codec — raw bytes as a blob."""

    @staticmethod
    def encode(encoding, ar):
        if np.ma.isMaskedArray(ar):
            return {
                "values": ndarray_codec.encode(encoding, ar.data),
                "mask": ndarray_codec.encode(encoding, np.ma.getmaskarray(ar)),
            }
        ar = np.ascontiguousarray(ar)
        if ar.dtype.kind == "O":
            data = json.dumps([None if v is None else v for v in ar.tolist()]).encode()
            return {"objects": encoding.add_blob(data), "shape": ar.shape}
        view = ar.view(np.int64) if ar.dtype.kind in "Mm" else ar
        blob_id = encoding.add_blob(memoryview(view).cast("B"))
        return {"data": blob_id, "dtype": ar.dtype.str, "shape": list(ar.shape)}

    @staticmethod
    def decode(encoding, spec):
        if "values" in spec:
            values = ndarray_codec.decode(encoding, spec["values"])
            mask = ndarray_codec.decode(encoding, spec["mask"])
            return np.ma.MaskedArray(values, mask=mask)
        if "objects" in spec:
            data = json.loads(encoding.get_blob(spec["objects"]).decode())
            return np.array(data, dtype=object).reshape(spec["shape"])
        dtype = np.dtype(spec["dtype"])
        raw = encoding.get_blob(spec["data"])
        base = np.dtype("int64") if dtype.kind in "Mm" else dtype
        ar = np.frombuffer(raw, dtype=base).reshape(spec["shape"])
        if dtype.kind in "Mm":
            ar = ar.view(dtype)
        return ar


@register("array")
class array_codec:
    @staticmethod
    def encode(encoding, ar):
        from . import array_types
        if array_types.is_arrow_array(ar):
            if isinstance(ar, pa.ChunkedArray):
                ar = ar.combine_chunks()
            sink = pa.BufferOutputStream()
            batch = pa.record_batch([ar], names=["a"])
            with pa.ipc.new_stream(sink, batch.schema) as writer:
                writer.write_batch(batch)
            return {"arrow": encoding.add_blob(sink.getvalue().to_pybytes())}
        return {"numpy": encoding.encode("ndarray", ar)}

    @staticmethod
    def decode(encoding, spec):
        if "arrow" in spec:
            buf = encoding.get_blob(spec["arrow"])
            reader = pa.ipc.open_stream(pa.py_buffer(buf))
            table = reader.read_all()
            return table.column(0).combine_chunks()
        return encoding.decode("ndarray", spec["numpy"])


@register("binner")
class binner_codec:
    @staticmethod
    def encode(encoding, binner):
        return binner.encode(encoding)

    @staticmethod
    def decode(encoding, spec):
        from .ops.gridagg import decode_binner
        return decode_binner(spec)


@register("aggregation")
class aggregation_codec:
    @staticmethod
    def encode(encoding, agg_desc):
        return agg_desc.encode(encoding)

    @staticmethod
    def decode(encoding, spec):
        from . import agg as agg_mod
        return agg_mod.decode(encoding, spec)


@register("hashmap")
class hashmap_codec:
    @staticmethod
    def encode(encoding, hashmap):
        return hashmap.encode(encoding)

    @staticmethod
    def decode(encoding, spec):
        from .hash import HashMapUnique
        return HashMapUnique.decode(encoding, spec)


@register("dataframe-state")
class state_codec:
    @staticmethod
    def encode(encoding, df):
        return df.state_get()

    @staticmethod
    def decode(encoding, spec, df=None):
        assert df is not None
        return df.state_set(spec)


@register("task")
class task_codec:
    """Tasks ship as (name, df-state, spec) — the server reconstructs them on
    its own DataFrame (reference: tasks encoded for remote execution,
    server/executor.py)."""

    @staticmethod
    def encode(encoding, task):
        from .tasks import TaskAggregation, TaskHashmapUniqueCreate
        if isinstance(task, TaskAggregation):
            return {
                "task": "aggregation",
                "binners": encoding.encode_list("binner", task.binners),
                "aggregation": encoding.encode("aggregation", task.aggregation_description),
            }
        if isinstance(task, TaskHashmapUniqueCreate):
            return {
                "task": "hash_map_unique",
                "expression": task.expression,
                "limit": task.limit,
                "selection": task.selection if isinstance(task.selection, (str, type(None))) else str(task.selection),
                "return_inverse": task.return_inverse,
            }
        raise TypeError(f"cannot encode task {task!r}")

    @staticmethod
    def decode(encoding, spec, df=None):
        from .tasks import TaskAggregation, TaskHashmapUniqueCreate
        assert df is not None
        if spec["task"] == "aggregation":
            binners = tuple(encoding.decode_list("binner", spec["binners"]))
            agg_desc = encoding.decode("aggregation", spec["aggregation"])
            return TaskAggregation(df, binners, agg_desc)
        if spec["task"] == "hash_map_unique":
            return TaskHashmapUniqueCreate(df, spec["expression"], limit=spec.get("limit"),
                                           selection=spec.get("selection"),
                                           return_inverse=spec.get("return_inverse", False))
        raise TypeError(f"cannot decode task {spec!r}")


@register("task-result")
class task_result_codec:
    @staticmethod
    def encode(encoding, value):
        from .hash import HashMapUnique
        if isinstance(value, HashMapUnique):
            return {"kind": "hashmap", "value": encoding.encode("hashmap", value)}
        if isinstance(value, (int, float, str, bool, type(None))):
            return {"kind": "scalar", "value": value}
        if np.isscalar(value) or (isinstance(value, np.ndarray) and value.ndim == 0):
            return {"kind": "npscalar", "value": encoding.encode("ndarray", np.atleast_1d(np.asarray(value)))}
        return {"kind": "array", "value": encoding.encode("ndarray", np.asarray(value) if not np.ma.isMaskedArray(value) else value)}

    @staticmethod
    def decode(encoding, spec):
        if spec["kind"] == "hashmap":
            return encoding.decode("hashmap", spec["value"])
        if spec["kind"] == "scalar":
            return spec["value"]
        if spec["kind"] == "npscalar":
            return encoding.decode("ndarray", spec["value"])[0]
        return encoding.decode("ndarray", spec["value"])


# ---------------------------------------------------------------------------
# wire format: JSON spec + packed binary blobs
# (reference: encoding.py serialize:428 / _pack_blobs:442)
# ---------------------------------------------------------------------------

HEADER = b"VAEXTPU1"


def serialize(spec, encoding: Encoding) -> bytes:
    """[8B magic][4B json_len][json][per blob: 4B id_len, id, 8B len, data]"""
    payload = json.dumps(spec, default=_json_default).encode()
    parts = [HEADER, struct.pack("<I", len(payload)), payload]
    for blob_id, blob in encoding.blobs.items():
        bid = blob_id.encode()
        parts.append(struct.pack("<I", len(bid)))
        parts.append(bid)
        parts.append(struct.pack("<Q", len(blob)))
        parts.append(blob)
    return b"".join(parts)


def deserialize(data: bytes):
    """→ (spec, Encoding with blobs loaded)."""
    assert data[:8] == HEADER, "bad magic"
    offset = 8
    (json_len,) = struct.unpack_from("<I", data, offset)
    offset += 4
    spec = json.loads(data[offset:offset + json_len].decode())
    offset += json_len
    encoding = Encoding()
    while offset < len(data):
        (id_len,) = struct.unpack_from("<I", data, offset)
        offset += 4
        blob_id = data[offset:offset + id_len].decode()
        offset += id_len
        (blob_len,) = struct.unpack_from("<Q", data, offset)
        offset += 8
        encoding.blobs[blob_id] = data[offset:offset + blob_len]
        offset += blob_len
    return spec, encoding


def _json_default(obj):
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.datetime64, np.timedelta64)):
        return str(obj)
    return str(obj)
