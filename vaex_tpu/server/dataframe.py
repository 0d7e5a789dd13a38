"""Remote DataFrames: same lazy API, executor swapped for RPC.

TPU-native counterpart of /root/reference/packages/vaex-server/vaex/server/
dataframe.py + executor.py:5-47: the client-side DataFrame carries only
metadata (row count, column dtypes) and pipeline state; scheduled tasks are
encoded and executed by the server's TPU executor.
"""

from __future__ import annotations

import numpy as np

from .. import encoding as encoding_mod
from ..dataframe import DataFrameLocal
from ..dataset import Dataset
from ..datatype import DataType
from ..tasks import TaskAggregation, TaskHashmapUniqueCreate


class DatasetRemote(Dataset):
    """Metadata-only stand-in for the server's dataset."""

    snake_name = "remote"

    def __init__(self, name, row_count, columns, fingerprint):
        super().__init__()
        self.name = name
        self._row_count = row_count
        self._dtypes = columns
        self._columns = {c: _RemoteColumnStub(self, c) for c in columns}
        self._remote_fingerprint = fingerprint

    def _fingerprint(self):
        return self._remote_fingerprint

    def data_type(self, name):
        return self._dtypes[name]

    def chunk_iterator(self, columns, chunk_size=None, reverse=False, start=0, end=None):
        raise RuntimeError("remote datasets have no local data — operations execute server-side")


class _RemoteColumnStub:
    def __init__(self, ds, name):
        self.ds = ds
        self.name = name

    def __len__(self):
        return self.ds.row_count

    def data_type(self):
        return self.ds._dtypes[self.name]

    def fingerprint(self):
        return f"remote-{self.ds._remote_fingerprint}-{self.name}"


class RemoteExecutor:
    """Reference: vaex-server/vaex/server/executor.py:5."""

    def __init__(self, client):
        self.client = client
        self.tasks = []
        self.passes = 0

    def schedule(self, task):
        if isinstance(task, (TaskAggregation, TaskHashmapUniqueCreate)):
            self.tasks.append(task)
            return task
        raise NotImplementedError(f"task {type(task).__name__} cannot run remotely")

    def execute(self):
        prev_ids = None
        while True:
            pending = [t for t in self.tasks if t.isPending and not t.cancelled]
            self.tasks = []
            if not pending:
                break
            ids = frozenset(id(t) for t in pending)
            if ids == prev_ids:
                raise RuntimeError("remote executor made no progress: the same "
                                   "tasks are still pending after a round-trip")
            prev_ids = ids
            self.passes += 1
            by_df = {}
            for t in pending:
                by_df.setdefault(id(t.df), (t.df, []))[1].append(t)
            for _, (df, tasks) in by_df.items():
                enc = encoding_mod.Encoding()
                specs = [enc.encode("task", t) for t in tasks]

                def progress(fraction, tasks=tasks):
                    # fan server progress frames into the local tasks;
                    # any local callback returning False cancels remotely
                    ok = True
                    for t in tasks:
                        if t.signal_progress(fraction) is False:
                            ok = False
                    return ok

                wants_progress = any(t._progress_callbacks for t in tasks)
                try:
                    results = self.client._execute(
                        df._remote_name, df.state_get(), specs, enc,
                        progress=progress if wants_progress else None)
                    for t, r in zip(tasks, results):
                        t.fulfill(r)
                except Exception as e:  # noqa: BLE001
                    for t in tasks:
                        if t.isPending:
                            t.reject(e)
                    raise

    async def execute_async(self):
        import asyncio
        loop = asyncio.get_running_loop()
        await loop.run_in_executor(None, self.execute)


class DataFrameRemote(DataFrameLocal):
    """Reference: vaex-server/vaex/server/dataframe.py DataFrameRemote."""

    def __init__(self, client, name, meta):
        enc = encoding_mod.Encoding()
        columns = {cname: enc.decode("dtype", dspec) for cname, dspec in meta["columns"].items()}
        dataset = DatasetRemote(name, meta["row_count"], columns, meta["fingerprint"])
        super().__init__(dataset, name=name)
        self.client = client
        self._remote_name = name
        self._executor = RemoteExecutor(client)

    def is_local(self):
        return False

    def copy(self, column_names=None, treeshake=False):
        df = DataFrameRemote(self.client, self._remote_name, {
            "row_count": self.dataset.row_count,
            "columns": {c: encoding_mod.Encoding().encode("dtype", self.dataset._dtypes[c])
                        for c in self.dataset._dtypes},
            "fingerprint": self.dataset._remote_fingerprint,
        })
        df.virtual_columns = dict(self.virtual_columns)
        df.variables = dict(self.variables)
        df.functions = dict(self.functions)
        df._index_start = self._index_start
        df._index_end = self._index_end
        for name, history in self.selection_histories.items():
            df.selection_histories[name] = list(history)
            df.selection_history_indices[name] = self.selection_history_indices[name]
        if column_names is not None:
            df.column_names = list(column_names)
        else:
            df.column_names = list(self.column_names)
        return df

    def data_type(self, expression, array_type=None, internal=False, axis=0):
        from ..expression import Expression
        expression = expression.expression if isinstance(expression, Expression) else str(expression)
        if expression in self.dataset._dtypes:
            return self.dataset._dtypes[expression]
        return self.client._data_type(self._remote_name, self.state_get(), expression)

    def evaluate(self, expression, i1=None, i2=None, out=None, selection=None, filtered=True,
                 array_type=None, parallel=True, chunk_size=None, progress=None):
        from ..expression import Expression
        from .. import array_types
        expression = expression.expression if isinstance(expression, Expression) else str(expression)
        result = self.client._evaluate(self._remote_name, self.state_get(), expression, i1=i1, i2=i2)
        return array_types.convert(result, array_type)

    def is_masked(self, column):
        return False

    def _evaluate_iterator_raw(self, expressions, i1=None, i2=None, selection=None, filtered=True, chunk_size=None):
        results = [self.evaluate(e, i1=i1, i2=i2) for e in expressions]
        n = len(results[0]) if results else 0
        yield 0, n, results
