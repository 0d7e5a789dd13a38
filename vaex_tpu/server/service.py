"""Server-side execution service.

TPU-native counterpart of /root/reference/packages/vaex-server/vaex/server/
service.py:61-95 (AsyncThreadedService): holds named DataFrames, applies
client state, decodes tasks against a private copy and runs them on the
server's executor (which drives the TPU mesh).
"""

from __future__ import annotations

import contextlib
import os
import queue

from .. import encoding as encoding_mod


class _ExecutorPool:
    """Pool of private executors so concurrent client requests overlap
    (reference: AsyncThreadedService's thread pool of ExecutorLocal,
    service.py:61-95).  The executor is non-reentrant, so each in-flight
    request owns one for its duration; device work serializes on the chip
    while host-side chunk prep, result fetches and progress streams of
    different requests interleave."""

    def __init__(self, size=None):
        if size is None:
            size = int(os.environ.get("VAEX_TPU_SERVER_EXECUTORS", "4"))
        self._q = queue.Queue()
        self.size = size
        for _ in range(size):
            self._q.put(None)  # executors are created lazily on first use

    @contextlib.contextmanager
    def acquire(self):
        ex = self._q.get()
        if ex is None:
            from ..execution import ExecutorLocal
            ex = ExecutorLocal(mesh="auto")
        try:
            yield ex
        finally:
            self._q.put(ex)


class Service:
    def __init__(self, dataframes: dict):
        self.dataframes = dict(dataframes)
        self._pool = _ExecutorPool()

    def add_dataframe(self, name, df):
        self.dataframes[name] = df

    def list_datasets(self):
        out = {}
        for name, df in self.dataframes.items():
            out[name] = {
                "row_count": df.dataset.row_count,
                "columns": {col: encoding_mod.Encoding().encode("dtype", df.data_type(col))
                            for col in df.get_column_names()},
                "fingerprint": df.dataset.fingerprint,
            }
        return out

    def _df_for(self, name, state=None):
        df = self.dataframes[name].copy()
        if state:
            df.state_set(state)
        return df

    def execute(self, name, state, task_specs, enc: encoding_mod.Encoding,
                progress=None, cancel_event=None):
        """Decode → schedule → run → encode results (reference: service.py
        execute → ExecutorLocal passes).

        progress: optional callable(fraction) invoked from the executor's
        chunk loop (streamed to the client as interim frames).
        cancel_event: optional threading.Event; when set, the executor's
        progress check returns False and the pass aborts cooperatively
        (reference: cancellation via progress callbacks returning False,
        execution.py:420-431)."""
        df = self._df_for(name, state)
        tasks = [enc.decode("task", spec, df=df) for spec in task_specs]
        if progress is not None or cancel_event is not None:
            def callback(fraction):
                if cancel_event is not None and cancel_event.is_set():
                    return False
                if progress is not None:
                    progress(fraction)
                return True
            for task in tasks:
                task.progress(callback)
        with self._pool.acquire() as executor:
            df.executor = executor
            for task in tasks:
                executor.schedule(task)
            df.execute()
        out_enc = encoding_mod.Encoding()
        results = [out_enc.encode("task-result", task.get()) for task in tasks]
        return results, out_enc

    def evaluate(self, name, state, expression, i1=None, i2=None):
        df = self._df_for(name, state)
        with self._pool.acquire() as executor:
            df.executor = executor
            result = df.evaluate(expression, i1=i1, i2=i2)
        out_enc = encoding_mod.Encoding()
        return out_enc.encode("array", _as_encodable(result)), out_enc

    def data_type(self, name, state, expression):
        df = self._df_for(name, state)
        dt = df.data_type(expression)
        return encoding_mod.Encoding().encode("dtype", dt)

    def call_dataframe(self, name, state, method, args, kwargs):
        """Whitelisted remote method calls (reference: websocket.py
        call-dataframe)."""
        allowed = {"length_unfiltered", "get_column_names", "unique", "nunique", "__len__"}
        if method not in allowed:
            raise ValueError(f"method {method!r} not allowed remotely")
        df = self._df_for(name, state)
        with self._pool.acquire() as executor:
            df.executor = executor
            out = getattr(df, method)(*args, **kwargs) if method != "__len__" else len(df)
        return out


def _as_encodable(result):
    from .. import array_types
    if array_types.is_arrow_array(result):
        return result
    import numpy as np
    return np.asarray(result) if not np.ma.isMaskedArray(result) else result
