"""JSON dataset opener: round-trips ``df.export('x.json')``
(reference: vaex.from_json over pandas read_json)."""

from __future__ import annotations

import numpy as np

from ..dataset import DatasetArrays, register_opener


class JsonDataset:
    @classmethod
    def can_open(cls, path, **kwargs):
        return str(path).endswith(".json")

    @classmethod
    def open(cls, path, fs_options=None, orient=None, **kwargs):
        import pandas as pd
        df = pd.read_json(path, orient=orient)
        columns = {}
        for name in df.columns:
            values = df[name].to_numpy()
            if values.dtype == object:
                try:
                    import pyarrow as pa
                    values = pa.array(values.tolist())
                except Exception:  # noqa: BLE001 - mixed types stay objects
                    pass
            columns[str(name)] = values
        return DatasetArrays(columns)


register_opener(JsonDataset)
