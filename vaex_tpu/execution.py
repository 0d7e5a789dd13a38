"""The streaming executor: one compiled device pass over chunked columns.

TPU-native re-design of /root/reference/packages/vaex-core/vaex/execution.py
(Executor:172, ExecutorLocal.execute_generator:311): tasks are collected and
deduplicated, aggregations sharing a grid are fused, and a single XLA program
per run streams host chunks → device (the reference instead fans chunks over
a CPU thread pool with per-thread C++ task-parts, execution.py:432-435).

The device step is jit-compiled once per (task set, dtypes, chunk bucket) and
re-used across chunks; accumulator buffers are donated so grids update in
place in HBM.  Chunk dispatch is asynchronous (JAX), so host-side chunk
preparation of chunk i+1 overlaps device compute of chunk i — the double
buffering the reference implements with prefetch threads
(dataframe.py:3112-3166).

Multi-chip: when the executor is constructed with a mesh of >1 devices, rows
of each chunk are sharded over the mesh with `shard_map`, each device updates
a local grid replica, and replicas are reduced with `psum` when the pass
finishes (SURVEY.md §2.3 split-K reduction → psum).
"""

from __future__ import annotations

import functools
import logging
import threading

import numpy as np

import jax
import jax.numpy as jnp

from . import array_types, cache, settings, utils
from .datatype import DataType
from .dispatch import MV
from .scopes import BlockScope, DeviceScope, expression_is_device_compatible
from .tasks import Task, TaskAggregation, TaskHashmapUniqueCreate, TaskMapReduce
from .ops import gridagg

logger = logging.getLogger("vaex_tpu.execution")

_main_executor = None


def get_main_executor():
    global _main_executor
    if _main_executor is None:
        _main_executor = ExecutorLocal(mesh="auto")
    return _main_executor


def set_main_executor(executor):
    global _main_executor
    _main_executor = executor


class UserAbort(Exception):
    pass


def _bucket_length(n, n_shards=1):
    """Pad length for a chunk: next power of two, min 128 — bounds the number
    of distinct compiled programs (SURVEY.md §7 recompilation control).
    Always a multiple of n_shards so rows split evenly over the mesh."""
    n = max(int(n), 1)
    L = 128
    while L < n or L % n_shards:
        L *= 2
    return L


def chunk_size_for(row_count, n_devices=1):
    """Auto chunk size (reference: execution.py:283-292): large enough to
    keep the device busy, clamped to [size_min, size_max]."""
    if settings.chunk.size is not None:
        return settings.chunk.size
    chunk_size = max(settings.chunk.size_min, min(settings.chunk.size_max, row_count))
    # multiple of 8 keeps hdf5 string null-bitmaps aligned & tiles friendly
    return (chunk_size + 7) // 8 * 8


class DeviceColumnCache:
    """HBM-resident column chunks, keyed by (dataset, column, range, pad).

    The TPU-native analogue of the reference keeping hot mmap pages in the OS
    page cache: the first pass over a column pays the host→HBM transfer, every
    later aggregation reads straight from HBM.  LRU-bounded by byte budget
    (VAEX_TPU_DEVICE_CACHE_BYTES, default 8 GiB — half of a v5e's HBM)."""

    def __init__(self, limit_bytes=None):
        import collections
        import os
        if limit_bytes is None:
            limit_bytes = int(utils.parse_memory_size(
                os.environ.get("VAEX_TPU_DEVICE_CACHE_BYTES", "8GB")))
        self.limit_bytes = limit_bytes
        self._data = collections.OrderedDict()
        self._total = 0

    def get(self, key):
        entry = self._data.get(key)
        if entry is None:
            return None
        self._data.move_to_end(key)
        return entry[0]

    def put(self, key, value):
        if key in self._data:
            return
        nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in value if a is not None)
        self._data[key] = (value, nbytes)
        self._total += nbytes
        while self._total > self.limit_bytes and len(self._data) > 1:
            _, (_, old_bytes) = self._data.popitem(last=False)
            self._total -= old_bytes

    def clear(self):
        self._data.clear()
        self._total = 0


_device_cache = DeviceColumnCache()


class _AggTaskPlan:
    """Device-side plan for one or more identical TaskAggregations.

    Plans dedupe on (op identity, canonical exprs, binners): h2o q4's
    `mean(v2)` where `df['v2'] = df['v1']` shares v1's sum grid instead of
    paying a second payload slot in the fused kernel, and a non-nullable
    integer `count(v)` shares the bare row count's grid (the reference's
    agg.py counts hit the same grid through its own dedupe at the C++ grid
    level).  `fulfill_tasks` are the directly-scheduled tasks this plan's
    finalized grid answers (empty for compound carriers — those are read
    by the compound combine instead)."""

    def __init__(self, task, op, value_expr, order_expr, selection_expr, value_as_validity=False):
        self.task = task
        self.op = op
        self.value_expr = value_expr          # str or None
        self.order_expr = order_expr          # str or None (first/last)
        self.selection_expr = selection_expr  # str or None
        # for non-numeric (string) values: value_expr is `notna(orig)` and
        # only gates inclusion — counting non-null strings without shipping
        # string bytes to the device
        self.value_as_validity = value_as_validity
        self.fulfill_tasks = []


def _canonical_expr(df, expr):
    """Virtual-column-expanded, AST-round-tripped form: 'v2' aliasing 'v1'
    canonicalizes to the same string as 'v1' itself."""
    if expr is None:
        return None
    try:
        from . import expresso
        from .expression import Expression
        expanded = Expression(df, str(expr)).expand().expression
        return expresso.node_to_string(expresso.parse_expression(expanded))
    except Exception:  # noqa: BLE001 — malformed exprs fail later, loudly
        return str(expr)


def _expr_never_missing(df, expr):
    """True when `expr` provably yields no missing/NaN values: integer/bool
    dtype AND every leaf dataset column is a plain (unmasked) array or a
    device array, with no missing-synthesizing functions in the closure.
    Used to canonicalize count(v) -> count(*) (same grid, one less plan)."""
    try:
        dtype = df.data_type(expr)
        np_dtype = dtype.numpy
    except Exception:  # noqa: BLE001
        return False
    if not dtype.is_numeric or np_dtype.kind not in "iub":
        return False
    try:
        from . import expresso
        from .expression import Expression
        e = Expression(df, str(expr))
        blocked = {"_map", "map", "hashmap_apply", "_ordinal_values", "_choose"}
        if blocked & set(expresso.names(e.expand().expression)):
            return False
        for dep in e.root_columns():
            col = df.dataset[dep]
            if array_types.is_jax_array(col):
                continue  # device columns carry no mask by construction
            if not isinstance(col, np.ndarray) or np.ma.isMaskedArray(col):
                return False
        return True
    except Exception:  # noqa: BLE001
        return False


class Run:
    """Dependency analysis of one batch of tasks (reference: execution.py:43)."""

    def __init__(self, df, tasks):
        self.df = df
        self.tasks = tasks
        self.dataset_deps = set()
        for task in tasks:
            self.dataset_deps |= task.dependencies()
        self.dataset_deps = sorted(self.dataset_deps)


class Executor:
    def __init__(self):
        self.tasks = []
        self._task_index = {}  # pending-task dedupe: fingerprint -> task
        self.signal_begin = []
        self.signal_end = []

    def schedule(self, task):
        """Queue a task; dedupe by fingerprint; probe the result cache
        (reference: execution.py:218 + cache probe cache.py:351)."""
        if task.cacheable and task.requires_fingerprint and cache.is_on():
            fp = task.fingerprint()
            value = cache.get(fp)
            if value is not None:
                logger.debug("cache hit for %s", fp)
                task.fulfill(value)
                return task
        # dedupe identical pending tasks — indexed by fingerprint so a
        # widget dashboard batching hundreds of delayed stats stays O(n)
        # (a linear scan re-fingerprinting per comparison was O(n^2))
        if task.requires_fingerprint:
            fp = task.fingerprint()
            other = self._task_index.get(fp)
            if other is not None and other.isPending and not other.cancelled:
                other.then(task.fulfill, task.reject)
                return task
            self._task_index[fp] = task
        self.tasks.append(task)
        return task


# device combine fns for compound aggregations (TaskAggregationCompound):
# flat grid states (incl. void cell) -> one flat output grid.  Division in
# f64 masters, result cast to the requested output dtype; empty cells give
# 0/0 = NaN exactly like the host numpy path (agg.py:146-153).

def _combine_mean(states, out_dtype, ddof=0):
    s, c = states
    f = jnp.float64 if s.dtype in (jnp.float64, jnp.int64, jnp.uint64) else jnp.float32
    return (s.astype(f) / c.astype(f)).astype(out_dtype)


def _combine_var(states, out_dtype, ddof=0):
    m2, s, c = states
    f = jnp.float64 if m2.dtype == jnp.float64 else jnp.float32
    cf = c.astype(f)
    mean = s.astype(f) / cf
    raw2 = m2.astype(f) / cf
    variance = raw2 - mean * mean
    if ddof:
        variance = variance * (cf / (cf - ddof))
    return variance.astype(out_dtype)


def _combine_std(states, out_dtype, ddof=0):
    return jnp.sqrt(_combine_var(states, jnp.float64, ddof=ddof)).astype(out_dtype)


def _combine_presence_bits(states, out_dtype, ddof=0):
    """count grid -> little-endian packed presence bitmap: the groupby
    empty-group mask fetches C/8 bytes instead of a 4-8 byte/cell count grid
    (raw output: the host unpacks with np.unpackbits(bitorder='little'))."""
    (c,) = states
    present = (c[:-1] != 0)  # void cell dropped here (raw skips the slicing)
    n = present.shape[0]
    pad = (-n) % 8
    if pad:
        present = jnp.concatenate([present, jnp.zeros(pad, bool)])
    weights = (2 ** jnp.arange(8, dtype=jnp.int32)).astype(jnp.uint8)
    return (present.reshape(-1, 8).astype(jnp.uint8) * weights).sum(
        axis=1, dtype=jnp.int32).astype(jnp.uint8)


COMBINE_FNS = {"mean": _combine_mean, "var": _combine_var, "std": _combine_std,
               "presence_bits": _combine_presence_bits}


class ExecutorLocal(Executor):
    supports_device_finalize = True

    def __init__(self, mesh=None):
        super().__init__()
        if mesh == "auto":
            from .parallel.mesh import default_mesh
            mesh = default_mesh()
        self.mesh = mesh
        self._program_cache = {}
        self.program_compiles = 0  # cache misses; pass_log shows per-pass delta
        self._executing = False
        self.passes = 0  # number of full passes over data (reference: execution.py:273)
        self.pass_log = []  # per-pass stats (reference logs wall-clock per
                            # pass, execution.py:436; SURVEY §5.1 tracing)
        self.bytes_h2d = 0  # host->device bytes shipped (chunk uploads);
                            # pass_log records the per-pass delta
        self._local = threading.local()

    # ------------------------------------------------------------------
    def _pending(self):
        return [t for t in self.tasks if t.isPending and not t.cancelled]

    def _check_progressing(self, prev_ids):
        """Guard against delayed callbacks that re-schedule without ever
        resolving: if a full pass leaves the exact same task set pending,
        another pass cannot help (reference loops on actual pending state,
        execution.py:265-290 — a fixed retry bound would silently
        under-execute deep delayed chains)."""
        ids = frozenset(id(t) for t in self._pending())
        if ids and ids == prev_ids:
            raise RuntimeError(
                "executor made no progress: the same tasks are still pending "
                "after a full pass (a delayed callback may be re-scheduling "
                "tasks without resolving them)")
        return ids

    def execute(self):
        # delayed DAGs can schedule follow-up tasks when earlier ones
        # fulfill (e.g. limits → binned aggregation, reference two-pass
        # pattern dataframe.py:1844); loop until the queue actually drains
        prev_ids = None
        while self._pending():
            for _ in self.execute_generator():
                pass
            prev_ids = self._check_progressing(prev_ids)

    async def execute_async(self):
        """Genuinely asynchronous drain (reference async generator core,
        execution.py:265-493): the chunk pump runs on a worker thread and
        control returns to the event loop at every chunk boundary, so
        progress streaming, cancellation and other coroutines interleave
        with a running pass."""
        import asyncio

        loop = asyncio.get_running_loop()
        sentinel = object()
        prev_ids = None
        while self._pending():
            gen = self.execute_generator()
            while True:
                item = await loop.run_in_executor(None, next, gen, sentinel)
                if item is sentinel:
                    break
            prev_ids = self._check_progressing(prev_ids)

    def _pop_tasks(self):
        tasks = [t for t in self.tasks if t.isPending and not t.cancelled]
        self.tasks = []
        self._task_index = {}
        by_df = {}
        for task in tasks:
            key = task.df.fingerprint() if task.df is not None else None
            by_df.setdefault(key, []).append(task)
        return by_df

    def execute_generator(self):
        if self._executing:
            raise RuntimeError(
                "nested execute call: you may not call execute() from within a "
                "progress callback or delayed function (reference guard: "
                "execution.py:330-341)")
        self._executing = True
        try:
            by_df = self._pop_tasks()
            for _, tasks in by_df.items():
                yield from self._execute_run(tasks)
        finally:
            self._executing = False

    # ------------------------------------------------------------------
    def _execute_run(self, tasks):
        import time as _time
        t_start = _time.perf_counter()
        compiles_before = self.program_compiles
        h2d_before = self.bytes_h2d
        df = tasks[0].df
        run = Run(df, tasks)
        self.passes += 1

        agg_tasks = [t for t in tasks if isinstance(t, TaskAggregation)]
        hashmap_tasks = [t for t in tasks if isinstance(t, TaskHashmapUniqueCreate)]
        mapreduce_tasks = [t for t in tasks if isinstance(t, TaskMapReduce)]

        row_count = df._length_unfiltered
        chunk_size = chunk_size_for(row_count)

        plans, device_inputs, host_exprs, compounds = self._plan_device(df, agg_tasks)
        need_filter = df.filtered
        filter_on_device = need_filter and expression_is_device_compatible(df, df._filter_expression())

        # initialize states (one grid replica per mesh device); allocations
        # are pre-accounted by the memory tracker (reference double-entry
        # check: execution.py:413 + agg.py:311-318)
        from . import memory as memory_mod
        tracker = memory_mod.create_tracker()
        n_shards = int(np.prod(self.mesh.devices.shape)) if self.mesh is not None else 1
        states = []
        for plan in plans:
            ncells = int(np.prod([b.shape for b in plan.task.binners])) if plan.task.binners else 1
            plan.op.rows_upper_bound = row_count  # lets counts pick int32
            state = plan.op.init(ncells)
            if n_shards > 1:
                from .parallel.mesh import replicate_state, mesh_process_count, put_sharded
                state = replicate_state(state, n_shards)
                if mesh_process_count(self.mesh) > 1:
                    # multi-host: place one replica on each global device
                    state = jax.tree_util.tree_map(
                        lambda a: put_sharded(self.mesh, np.asarray(a)), state)
            tracker.pre_alloc(memory_mod.track_state_bytes(state),
                              f"aggregation grids for {plan.task.aggregation_description!r}")
            states.append(state)

        from .hash import _HashmapBuilder, _DeviceUniqueBuilder
        program = None
        L_current = None
        hashmap_builders = [
            _DeviceUniqueBuilder(t) if _DeviceUniqueBuilder.eligible(t) else _HashmapBuilder(t)
            for t in hashmap_tasks]
        host_hashmap_tasks = [b.task for b in hashmap_builders
                              if isinstance(b, _HashmapBuilder)]
        mr_values = {id(t): [] for t in mapreduce_tasks}

        i_chunk = 0
        start = df._index_start
        end = df._index_end
        total = end - start

        # columns the host side must see (string exprs, hashmap/mapreduce
        # tasks, host-evaluated filters); everything else can come straight
        # from the HBM column cache without touching the host storage layer
        host_cols = set()
        from .expression import Expression
        for expr in host_exprs:
            host_cols |= Expression(df, expr).root_columns()
        if need_filter and (not filter_on_device or mapreduce_tasks or hashmap_tasks):
            host_cols |= df._selection_dependencies("__filter__")
        for t in host_hashmap_tasks + mapreduce_tasks:
            host_cols |= t.dependencies()
        ds_fp = df.dataset.fingerprint
        boundaries = []
        pos = start
        while pos < end:
            nxt = min(pos + chunk_size, end)
            boundaries.append((pos, nxt))
            pos = nxt
        fully_cached = set()
        for name in device_inputs:
            if name in host_cols:
                continue
            keys = [(ds_fp, name, b1, b2, _bucket_length(b2 - b1, n_shards)) for b1, b2 in boundaries]
            if all(_device_cache.get(k) is not None for k in keys):
                fully_cached.add(name)
        for b in hashmap_builders:
            if not isinstance(b, _HashmapBuilder):
                # device builder reads its root columns from the chunk dict
                fully_cached.discard(b.task.expression)
                from .expression import Expression as _Expr
                fully_cached -= _Expr(df, b.task.expression).root_columns()
        read_deps = [c for c in run.dataset_deps if c not in fully_cached]
        binlim_inputs = None

        try:
            for i1, i2, chunks in df.dataset.chunk_iterator(read_deps, chunk_size, start=start, end=end):
                n = i2 - i1
                host_scope = None

                def get_host_scope():
                    nonlocal host_scope
                    if host_scope is None:
                        host_scope = BlockScope(df, values=dict(chunks))
                    return host_scope

                filter_mask_host = None
                if need_filter and (not filter_on_device or mapreduce_tasks or hashmap_tasks):
                    fm = get_host_scope().evaluate(df._filter_expression())
                    filter_mask_host = _to_bool_mask(fm)

                # ---- device aggregation path
                if plans:
                    L = _bucket_length(n, n_shards)
                    inputs, masks = self._prepare_device_inputs(
                        df, chunks, device_inputs, host_exprs, L, get_host_scope,
                        filter_mask_host if (need_filter and not filter_on_device) else None,
                        cache_key_base=(ds_fp, start + i1, start + i2))
                    if binlim_inputs is None and settings.compute.dynamic_limits:
                        binlim_inputs = self._binner_limit_inputs(df, plans)
                    if binlim_inputs:
                        inputs.update(binlim_inputs)
                    if program is None or L != L_current:
                        program = self._get_program(df, plans, inputs, masks, L,
                                                    filter_on_device, need_filter)
                        L_current = L
                    states = program(tuple(states), inputs, masks,
                                     np.int64(n), np.int64(i1))

                # ---- host paths
                if hashmap_tasks or mapreduce_tasks:
                    from .hash import _DeviceUniqueBuilder as _DUB
                    for builder in hashmap_builders:
                        if isinstance(builder, _DUB):
                            Lb = _bucket_length(n, n_shards)
                            builder.process_chunks(
                                chunks, i1, i2, filter_mask_host,
                                get_host_scope=get_host_scope,
                                cache_key=(ds_fp, start + i1, start + i2, Lb))
                        else:
                            builder.process(get_host_scope(), i1, i2, filter_mask_host)
                    for t in mapreduce_tasks:
                        self._process_mapreduce(t, get_host_scope(), chunks, i1, i2,
                                                filter_mask_host, mr_values[id(t)])

                i_chunk += 1
                fraction = (i2) / total if total else 1.0
                for task in tasks:
                    if not task.signal_progress(fraction):
                        raise UserAbort("user aborted")
                yield fraction

            # ---- reduce + fulfill.  Replica merge happens ON DEVICE (log-
            # depth tree over the replica axis, replicated output): on one
            # host it shrinks the D2H fetch D-fold, across hosts it is the
            # DCN/ICI reduction.  Then ONE packed D2H: every fetched array
            # pays a full device round-trip (~30ms on a tunneled TPU), so all
            # states are concatenated per dtype and fetched as single buffers.
            if n_shards > 1 and plans:
                from .parallel.mesh import merge_replicas_device
                states = merge_replicas_device(plans, states, self.mesh)
            # compound finalize ON DEVICE: mean/var/std grids combine into one
            # output each, so the packed D2H ships 1 grid instead of 2-3 —
            # the result fetch is the per-query fixed cost (VERDICT r2 #3/#6)
            combined_states = []
            for comp in compounds:
                combined_states.append(self._device_combine(
                    comp, [states[i] for i in comp["plan_idx"]]))
            # (plan, state idx, tasks to answer): deduped plans may answer
            # several identical tasks from one grid; carrier-only plans
            # (fulfill_tasks empty) are read by the compound combine above
            plain = [(plan, i, list(plan.fulfill_tasks))
                     for i, plan in enumerate(plans) if plan.fulfill_tasks]
            # keep_device tasks (device-resident groupby results): post-process
            # and fulfill ON DEVICE — zero bytes of the grid cross the link
            if any(getattr(c["task"], "keep_device", False) for c in compounds) \
                    or any(getattr(t, "keep_device", False)
                           for _, _, ts in plain for t in ts):
                keep_comp = [(c, s) for c, s in zip(compounds, combined_states)
                             if getattr(c["task"], "keep_device", False)]
                fetch_comp = [(c, s) for c, s in zip(compounds, combined_states)
                              if not getattr(c["task"], "keep_device", False)]
                keep_plain, fetch_plain = [], []
                for plan, i, ts in plain:
                    keep_t = [t for t in ts if getattr(t, "keep_device", False)]
                    fetch_t = [t for t in ts if not getattr(t, "keep_device", False)]
                    dev = plan.op.finalize_device(states[i]) if keep_t else None
                    if dev is not None:
                        keep_plain.extend((plan, t, dev) for t in keep_t)
                    else:
                        fetch_t = ts  # device finalize unsupported: fetch all
                    if fetch_t:
                        fetch_plain.append((plan, i, fetch_t))
                for comp, cstate in keep_comp:
                    ctask = comp["task"]
                    if comp["args"].get("raw"):
                        self._fulfill(ctask, cstate)
                        continue
                    self._fulfill(ctask, _shape_device_grid(cstate, ctask.binners,
                                                            ctask.aggregation_description))
                for plan, t, dev in keep_plain:
                    self._fulfill(t, _shape_device_grid(dev, t.binners,
                                                        t.aggregation_description))
                compounds = [c for c, _ in fetch_comp]
                combined_states = [s for _, s in fetch_comp]
                plain = fetch_plain
            fetched = packed_device_get(combined_states + [states[i] for _, i, _ in plain])
            for comp, raw in zip(compounds, fetched[:len(combined_states)]):
                ctask = comp["task"]
                if comp["args"].get("raw"):
                    # combine output is not a cell grid (e.g. packed presence
                    # bits): deliver verbatim, the descriptor's finish decodes
                    self._fulfill(ctask, np.asarray(raw))
                    continue
                grid_flat = np.asarray(raw)[:-1]  # drop void cell
                shape = tuple(b.shape for b in ctask.binners)
                grid = grid_flat.reshape(shape) if shape else grid_flat[0]
                if shape:
                    grid = grid[ctask.aggregation_description.get_result_slicing(ctask.binners)]
                self._fulfill(ctask, grid)
            for (plan, _, ts), state in zip(plain, fetched[len(combined_states):]):
                raw = plan.op.finalize(state)
                grid_flat = np.asarray(raw)[:-1]  # drop void cell
                for t in ts:
                    shape = tuple(b.shape for b in t.binners)
                    grid = grid_flat.reshape(shape) if shape else grid_flat[0]
                    desc = t.aggregation_description
                    if shape:
                        grid = grid[desc.get_result_slicing(t.binners)]
                    self._fulfill(t, grid)
            for builder in hashmap_builders:
                self._fulfill(builder.task, builder.finish())
            for t in mapreduce_tasks:
                self._fulfill(t, t.reduce(mr_values[id(t)]))
            elapsed = _time.perf_counter() - t_start
            self.pass_log.append(dict(
                rows=total, seconds=round(elapsed, 4),
                rows_per_s=round(total / elapsed) if elapsed else None,
                tasks=len(tasks), agg_tasks=len(agg_tasks), chunks=i_chunk,
                shards=n_shards, deps=list(run.dataset_deps),
                compiles=self.program_compiles - compiles_before,
                bytes_h2d=self.bytes_h2d - h2d_before))
            if len(self.pass_log) > 1000:
                del self.pass_log[:500]
            logger.info("pass %d: %s rows in %.3fs (%d tasks)",
                        self.passes, f"{total:,}", elapsed, len(tasks))
        except Exception as e:  # noqa: BLE001
            for task in tasks:
                if task.isPending:
                    task.reject(e)
            if not isinstance(e, UserAbort):
                raise

    def _device_combine(self, comp, states):
        """Jitted compound combine, cached per (fn, dtypes, shapes)."""
        name = comp["combine"]
        args = comp["args"]
        out_dtype = np.dtype(args.get("out", "float64"))
        ddof = args.get("ddof", 0)
        key = ("combine", name, str(out_dtype), ddof,
               tuple((tuple(np.shape(s)), str(np.asarray(s).dtype) if not hasattr(s, "dtype") else str(s.dtype)) for s in states))
        fn = self._program_cache.get(key)
        if fn is None:
            base = COMBINE_FNS[name]
            fn = jax.jit(functools.partial(base, out_dtype=out_dtype, ddof=ddof))
            self._program_cache[key] = fn
        return fn(states)

    def _fulfill(self, task, value):
        if (task.cacheable and task.requires_fingerprint and cache.is_on()
                and not array_types.is_jax_array(value)):
            # device-resident results are process-local (buffers die with the
            # process) — never serialized into the result cache
            cache.set(task.fingerprint(), value)
        task.fulfill(value)

    # ------------------------------------------------------------------
    def _plan_device(self, df, agg_tasks):
        """Build per-task device plans and collect required inputs.

        Returns (plans, leaf_columns, host_exprs): host_exprs are expressions
        that must be evaluated host-side per chunk (strings, UDFs) and shipped
        as ready arrays keyed by their expression string.
        """
        plans = []
        leaf_columns = set()
        host_exprs = set()
        compounds = []

        # compound tasks (mean/var/std with device finalize) expand into
        # carrier sub-plans; their states combine on device at fetch time
        from .tasks import TaskAggregationCompound
        work_items = []
        for task in agg_tasks:
            if isinstance(task, TaskAggregationCompound):
                idxs = []
                for sub in task.sub_descriptors:
                    carrier = TaskAggregation(task.df, task.binners, sub)
                    idxs.append(len(work_items))
                    work_items.append(carrier)
                compounds.append(dict(task=task, plan_idx=idxs,
                                      combine=task.combine_name, args=task.combine_args))
            else:
                work_items.append(task)
        agg_tasks = work_items

        def classify(expr):
            if expr is None or expr == "*":
                return
            if expression_is_device_compatible(df, expr):
                from .expression import Expression
                for name in Expression(df, expr).root_columns():
                    dt = df.data_type(name)
                    if dt.is_numeric or dt.is_bool or dt.is_temporal:
                        leaf_columns.add(name)
                    else:
                        host_exprs.add(expr)
                        return
            else:
                host_exprs.add(expr)

        plan_key_index = {}   # dedupe: identical (op, exprs, binners) share one grid
        plan_of_item = []     # work_item idx -> plan idx (compound remap below)
        is_carrier = set()
        for comp in compounds:
            is_carrier.update(comp["plan_idx"])

        for item_i, task in enumerate(agg_tasks):
            desc = task.aggregation_description
            short = desc.short_name
            value_expr = None
            order_expr = None
            value_as_validity = False
            if short == "count":
                value_expr = None if desc.expression == "*" else desc.expression
                if value_expr is not None and _expr_never_missing(df, value_expr):
                    # count(v) over a provably complete int/bool expression
                    # counts rows: share the bare count(*) grid
                    value_expr = None
                if value_expr is not None:
                    dt = df.data_type(value_expr)
                    if not (dt.is_numeric or dt.is_bool or dt.is_temporal):
                        value_expr = f"notna({value_expr})"
                        value_as_validity = True
                        dtype = np.dtype(bool)
                    else:
                        dtype = dt.device_dtype
                else:
                    dtype = None
                op = gridagg.AggOpCount(dtype)
            elif short in ("sum", "summoment", "min", "max"):
                value_expr = desc.expression
                dtype = df.data_type(value_expr).device_dtype
                if short == "summoment":
                    op = gridagg.AggOpSumMoment(dtype, moment=desc.agg_args.get("moment", 2))
                else:
                    op = gridagg.make_agg_op(short, dtype)
                if short in ("min", "max") and np.dtype(dtype) == np.dtype("float64") \
                        and jax.default_backend() == "tpu":
                    # TPU: no usable f64 compares or 64-bit bitcasts — the
                    # order-preserving i64 key is computed host-side and
                    # shipped (functions._f64_minmax_key; gridagg op decodes)
                    value_expr = f"_f64_minmax_key({value_expr})"
                if short == "sum" and np.dtype(dtype) == np.dtype("float64") \
                        and op.precision == "float64" \
                        and jax.default_backend() == "tpu":
                    # parity-mode f64 sums: ship the exact i64 bit patterns
                    # (f64 H2D is lossy dd on axon); the exact-limb
                    # accumulator decodes them integerly on device
                    # (functions._f64_sum_bits, gridagg._decode_float_bits)
                    value_expr = f"_f64_sum_bits({value_expr})"
            elif short in ("first", "last"):
                value_expr = desc.expressions[0]
                order_expr = desc.expressions[1] if len(desc.expressions) > 1 else None
                dtype = df.data_type(value_expr).device_dtype
                op = gridagg.AggOpFirst(dtype, inverted=(short == "last"))
            else:
                raise NotImplementedError(f"aggregation {short!r} has no device op")
            selection_expr = df._selection_expression(desc.selection)
            for e in [value_expr, order_expr, selection_expr]:
                classify(e)
            for b in task.binners:
                classify(b.expression)
            key = (type(op).__name__,
                   str(np.dtype(op.data_dtype)) if op.data_dtype is not None else None,
                   getattr(op, "moment", None), getattr(op, "inverted", None),
                   op.precision,
                   _canonical_expr(df, value_expr),
                   _canonical_expr(df, order_expr),
                   _canonical_expr(df, selection_expr),
                   value_as_validity, tuple(task.binners))
            idx = plan_key_index.get(key)
            if idx is None:
                idx = len(plans)
                plan_key_index[key] = idx
                plans.append(_AggTaskPlan(task, op, value_expr, order_expr, selection_expr,
                                          value_as_validity=value_as_validity))
            plan_of_item.append(idx)
            if item_i not in is_carrier:
                plans[idx].fulfill_tasks.append(task)
        for comp in compounds:
            comp["plan_idx"] = [plan_of_item[i] for i in comp["plan_idx"]]

        if df.filtered and expression_is_device_compatible(df, df._filter_expression()):
            classify(df._filter_expression())
        return plans, sorted(leaf_columns), sorted(host_exprs), compounds

    def _prepare_device_inputs(self, df, chunks, leaf_columns, host_exprs, L, get_host_scope,
                               filter_mask_host, cache_key_base=None):
        import jax as _jax
        # multi-host mesh: every input must be placed as a global row-sharded
        # array (each process owns the shards of its addressable devices);
        # on one host the jitted shard_map reshards plain device arrays itself
        multiproc = False
        if self.mesh is not None:
            from .parallel.mesh import mesh_process_count, put_sharded
            multiproc = mesh_process_count(self.mesh) > 1

        def place(padded):
            self.bytes_h2d += getattr(padded, "nbytes", 0)
            if multiproc:
                return put_sharded(self.mesh, padded)
            return _jax.device_put(padded)

        inputs = {}
        masks = {}
        for name in leaf_columns:
            raw = chunks.get(name)
            # device-resident source columns: the chunk is already an HBM
            # slice — caching it would DOUBLE the column's footprint (a
            # 768M-row frame OOMs 16GB HBM exactly this way) for a copy
            # XLA can re-make at ~800GB/s; bypass the cache entirely
            jax_src = raw is not None and array_types.is_jax_array(raw)
            key = None
            if cache_key_base is not None and not jax_src:
                ds_fp, a1, a2 = cache_key_base
                key = (ds_fp, name, a1, a2, L)
                cached = _device_cache.get(key)
                if cached is not None:
                    inputs[name], mask = cached
                    if mask is not None:
                        masks[name] = mask
                    continue
            if raw is None:
                # the prescan omitted this column from read_deps as fully
                # cached; if its entries were LRU-evicted between the
                # prescan and this chunk the fallthrough would crash in
                # _pad_to with an opaque "len() of unsized object" —
                # fail diagnosably instead (ADVICE r3)
                raise KeyError(
                    f"column {name!r} absent from both the chunk payload and "
                    f"the HBM column cache (evicted mid-run?)")
            values, valid = array_types.extract_mask(raw)
            values = _device_view(values)
            dev_values = place(_pad_to(values, L))
            dev_mask = place(_pad_to(~valid, L, fill=True)) if valid is not None else None
            inputs[name] = dev_values
            if dev_mask is not None:
                masks[name] = dev_mask
            if key is not None:
                _device_cache.put(key, (dev_values, dev_mask))
        df_fp = None
        for expr in host_exprs:
            # host-expression inputs (string funcs, UDFs, f64 minmax keys)
            # also live in the HBM cache: keyed by the df state fingerprint
            # since their values depend on virtual columns/variables — a
            # repeated query re-uses the upload (an f64 minmax key column
            # is 8B/row; re-shipping it per call dominated the q7 workload)
            key = None
            if cache_key_base is not None:
                if df_fp is None:
                    df_fp = df.fingerprint()
                ds_fp, a1, a2 = cache_key_base
                key = (ds_fp, "hostexpr", expr, df_fp, a1, a2, L)
                cached = _device_cache.get(key)
                if cached is not None:
                    inputs[expr], mask = cached
                    if mask is not None:
                        masks[expr] = mask
                    continue
            result = get_host_scope().evaluate(expr)
            values, valid = array_types.extract_mask(result)
            values = _device_view(np.asarray(values))
            dev_values = place(_pad_to(values, L))
            dev_mask = place(_pad_to(~np.asarray(valid), L, fill=True)) if valid is not None else None
            inputs[expr] = dev_values
            if dev_mask is not None:
                masks[expr] = dev_mask
            if key is not None:
                _device_cache.put(key, (dev_values, dev_mask))
        if filter_mask_host is not None:
            fm = _pad_to(filter_mask_host, L, fill=False)
            inputs["__filter_mask__"] = place(fm) if multiproc else fm
        return inputs, masks

    def _binner_limit_inputs(self, df, plans):
        """Ship the current binner limit VALUES (see _binner_slots) and
        referenced hashmap key tables (_hashmap_table_vars) as runtime
        inputs; the compiled step reads them instead of baked constants.
        Placed once per run (dict merged into every chunk's inputs); tables
        are HBM-cached by hashmap fingerprint across runs."""
        import jax as _jax
        scalar, ordinal, _ = _binner_slots(plans)
        hash_vars = _hashmap_table_vars(df, plans)
        if not scalar and not ordinal and not hash_vars:
            return {}
        multiproc = False
        if self.mesh is not None:
            from .parallel.mesh import mesh_process_count, put_sharded
            multiproc = mesh_process_count(self.mesh) > 1

        def place(arr):
            if multiproc:
                return put_sharded(self.mesh, arr, replicate=True)
            return _jax.device_put(arr)

        out = {}
        if scalar:
            out["__binlims_f__"] = place(
                np.array([[b.minimum, b.maximum] for b in scalar], np.float64))
        if ordinal:
            out["__binlims_i__"] = place(
                np.array([b.minimum for b in ordinal], np.int64))
        for name, hm in hash_vars:
            key = ("hashtab", hm.fingerprint, multiproc)
            cached = _device_cache.get(key)
            if cached is None:
                dev = hm._device_sorted_keys
                spec = hm.device_table_spec()
                if (dev is not None and not multiproc
                        and dev.shape[0] == spec["bucket"]
                        and str(dev.dtype) == spec["dtype"]):
                    # device-built table (ascending by construction): reuse
                    # the resident keys and synthesize the identity perm on
                    # device — zero H2D bytes for the table (the padded host
                    # copy of a 63M-key table is ~500MB over a ~35MB/s link)
                    import jax.numpy as jnp
                    meta = hm.device_table_meta()
                    # identity perm, clamped so the padded tail repeats the
                    # last code (the broadcast-equality branch takes max over
                    # duplicate matches — it must be uniform there)
                    perm_dev = jnp.minimum(
                        jnp.arange(spec["bucket"], dtype=jnp.int32),
                        np.int32(max(hm.count - 1, 0)))
                    cached = (dev, perm_dev, place(meta))
                else:
                    skeys, perm, meta = hm.device_table_arrays()
                    cached = (place(skeys), place(perm), place(meta))
                _device_cache.put(key, cached)
            out[f"__hashtab_{name}_k__"] = cached[0]
            out[f"__hashtab_{name}_p__"] = cached[1]
            out[f"__hashtab_{name}_m__"] = cached[2]
        return out

    def _get_program(self, df, plans, inputs, masks, L, filter_on_device, need_filter):
        dyn = settings.compute.dynamic_limits
        if dyn:
            # limits enter as runtime args: key on binner STRUCTURE + the
            # value-sharing pattern, not the limit values (_binner_slots)
            specs = [(_structural_task_spec(p.task.spec()), p.value_expr,
                      p.order_expr, p.selection_expr) for p in plans]
            pattern = _binner_slots(plans)[2]
        else:
            specs = [(p.task.spec(), p.value_expr, p.order_expr, p.selection_expr)
                     for p in plans]
            pattern = None
        # variables are baked into the trace as constants — EXCEPT hashmap
        # key tables shipped as runtime inputs (dynamic tables): those key
        # on table STRUCTURE (dtype/bucket/narrowing), not values
        dyn_tables = {n for n, _ in _hashmap_table_vars(df, plans)} if dyn else set()
        var_fps = {}
        for k, v in df.variables.items():
            if k in dyn_tables:
                var_fps[k] = ("dyntab", v.device_table_spec())
            else:
                var_fps[k] = utils._fingerprint_normalize(v)
        key = utils.fingerprint(
            specs, pattern,
            {k: str(v.dtype) for k, v in inputs.items()},
            {k: str(v.dtype) for k, v in masks.items()},
            L, filter_on_device, need_filter,
            df._filter_expression() if need_filter else None,
            dict(df.virtual_columns),
            var_fps,
            settings.compute.precision,
            # kernel-choice settings are baked into the trace: a mode flip
            # mid-process must not reuse a program compiled for the old mode
            settings.compute.strategy,
            settings.compute.pallas_payload,
            settings.compute.sorted_grid,
            "v2",
        )
        if key in self._program_cache:
            return self._program_cache[key]
        self.program_compiles += 1
        program = _compile_pass(df, plans, filter_on_device and need_filter,
                                (not filter_on_device) and need_filter, self.mesh, L)
        self._program_cache[key] = program
        return program

    def _process_mapreduce(self, task, host_scope, chunks, i1, i2, filter_mask, out_values):
        blocks = [host_scope.evaluate(e) for e in task.expressions]
        if task.pre_filter and filter_mask is not None and not task.ignore_filter:
            blocks = [array_types.filter_array(b, filter_mask) for b in blocks]
        if task.selection is not None:
            sel_expr = task.df._selection_expression(task.selection)
            sel_mask = _to_bool_mask(host_scope.evaluate(sel_expr))
            if task.pre_filter and filter_mask is not None:
                sel_mask = sel_mask[filter_mask]
            blocks = [array_types.filter_array(b, sel_mask) for b in blocks]
        if task.to_numpy:
            blocks = [array_types.to_numpy(b) for b in blocks]
        out_values.append(task.map(i1, i2, *blocks))


# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _group_packer(metas):
    """Jitted packer for a fixed (shape, dtype) signature: flatten the
    leaves into as few buffers as possible.  All 4-byte dtypes bitcast to
    one int32 buffer (every fetched buffer pays a tunnel round-trip, and
    the count+sum grids of a binned-mean pass are i32+f32 — one buffer
    instead of two).  64-bit dtypes stay grouped per dtype: the x64
    rewriter can't bitcast 64-bit element types."""
    order = {}  # group key -> [(leaf index, dtype)]
    for i, (_, dtype) in enumerate(metas):
        key = "b32" if dtype.itemsize == 4 and dtype.kind in "iuf" else dtype
        order.setdefault(key, []).append((i, dtype))

    def pack(*leaves):
        groups = []
        for key, items in order.items():
            parts = []
            for i, dtype in items:
                leaf = leaves[i].reshape(-1)
                if key == "b32" and leaf.dtype != jnp.int32:
                    leaf = jax.lax.bitcast_convert_type(leaf, jnp.int32)
                parts.append(leaf)
            groups.append(jnp.concatenate(parts) if len(parts) > 1 else parts[0])
        return tuple(groups)

    return jax.jit(pack), order


def _shape_device_grid(raw, binners, desc):
    """Device-side mirror of the host raw→grid post-processing: drop the void
    cell, reshape to the binner shape, apply the result slicing — all lazy jax
    ops (keep_device tasks: the grid never leaves HBM)."""
    grid_flat = raw[:-1]
    shape = tuple(b.shape for b in binners)
    grid = grid_flat.reshape(shape) if shape else grid_flat[0]
    if shape:
        grid = grid[desc.get_result_slicing(binners)]
    return grid


def packed_device_get(tree):
    """device_get that fetches one concatenated buffer per dtype instead of
    one array per leaf: on a tunneled device every fetched array pays a full
    round-trip (~30ms measured), so N states would cost N RTTs."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if len(leaves) <= 1 or not all(isinstance(l, jax.Array) for l in leaves):
        return jax.device_get(tree)
    metas = tuple((tuple(l.shape), np.dtype(l.dtype)) for l in leaves)
    pack, order = _group_packer(metas)
    bufs = jax.device_get(pack(*leaves))
    out = [None] * len(leaves)
    for buf, (key, items) in zip(bufs, order.items()):
        buf = np.asarray(buf)
        off = 0
        for i, dtype in items:
            shape = metas[i][0]
            count = int(np.prod(shape, dtype=np.int64)) if shape else 1
            part = buf[off:off + count]
            if key == "b32" and part.dtype != dtype:
                part = part.view(dtype)
            out[i] = part.reshape(shape)
            off += count
    return jax.tree_util.tree_unflatten(treedef, out)


def _device_view(values):
    """Host ndarray → dtype the device accepts (temporals as int64)."""
    if array_types.is_jax_array(values):
        return values           # already device-resident, nothing to fix up
    values = np.asarray(values)
    if values.dtype.kind in "Mm":
        # normalize to nanoseconds: every temporal consumer in the pass
        # (BinnerTime periods, datetime literals, td arithmetic) assumes
        # i64 ns; non-ns units would silently compare wrong otherwise
        unit = "datetime64[ns]" if values.dtype.kind == "M" else "timedelta64[ns]"
        if values.dtype != np.dtype(unit):
            values = values.astype(unit)
        return values.view(np.int64)
    if values.dtype.kind in "SU":
        raise TypeError("string columns cannot be shipped to the device directly")
    if not values.dtype.isnative:
        values = values.astype(values.dtype.newbyteorder("="))
    return values


def _pad_to(values, L, fill=0):
    if array_types.is_jax_array(values):
        import jax.numpy as jnp
        n = len(values)
        if n == L:
            return values
        return jnp.concatenate(
            [values, jnp.full(L - n, fill, dtype=values.dtype)])
    values = np.asarray(values)
    n = len(values)
    if n == L:
        return values
    out = np.full(L, fill, dtype=values.dtype)
    out[:n] = values
    return out


def _to_bool_mask(ar):
    """Filter/selection result → plain bool array (missing = False,
    reference semantics: masked selection values don't select)."""
    if np.ma.isMaskedArray(ar):
        return np.asarray(ar.filled(False)).astype(bool)
    if array_types.is_arrow_array(ar):
        import pyarrow as pa
        ar = ar.combine_chunks() if isinstance(ar, pa.ChunkedArray) else ar
        return np.asarray(ar.fill_null(False)).astype(bool)
    return np.asarray(ar).astype(bool)


def _binner_slots(plans):
    """Runtime-limits slot assignment (settings.compute.dynamic_limits).

    Bin limits (BinnerScalar min/max) and ordinal minimums are data-derived
    for `limits=None/'minmax'` queries and GrouperIntRange groupbys — baking
    them into the trace as constants made every fresh pair a full remote XLA
    recompile (~20-40s through the tunneled compiler).  Instead the compiled
    step reads them from two small runtime inputs (`__binlims_f__` [nf, 2]
    f64, `__binlims_i__` [ni] i64) and the program cache keys on the binner
    STRUCTURE only (_structural_task_spec).

    Slots are assigned per distinct binner VALUE (BinnerBase.__eq__) in
    first-appearance order across (plan, binner) occurrences, so plans that
    share a grid keep sharing one slot (and one Pallas kernel group).  The
    returned `pattern` — the slot index per occurrence — goes into the
    program key: a future run may only reuse the program when its
    value-sharing pattern matches, which is exactly the condition for the
    closure's slot references to stay correct.
    """
    scalar, ordinal = [], []
    s_index, o_index = {}, {}
    pattern = []
    for plan in plans:
        for b in (plan.task.binners or ()):
            if isinstance(b, gridagg.BinnerScalar):
                idx = s_index.get(b)
                if idx is None:
                    idx = s_index[b] = len(scalar)
                    scalar.append(b)
                pattern.append(("f", idx))
            elif isinstance(b, gridagg.BinnerOrdinal):
                idx = o_index.get(b)
                if idx is None:
                    idx = o_index[b] = len(ordinal)
                    ordinal.append(b)
                pattern.append(("i", idx))
            else:
                pattern.append(("other", -1))
    return scalar, ordinal, tuple(pattern)


def _hashmap_table_vars(df, plans):
    """Numeric HashMapUnique variables referenced by this run's expressions —
    their key tables ship as runtime inputs (`__hashtab_<var>_{k,p,m}__`) so
    the compiled pass is reusable across tables of the same structure
    (hash.HashMapUnique.map_ordinal_device tables=; same idea as
    _binner_slots).  Deterministic order (sorted by variable name)."""
    from .expression import Expression
    from .hash import HashMapUnique
    exprs = set()
    for plan in plans:
        for e in (plan.value_expr, plan.selection_expr, plan.order_expr):
            if e:
                exprs.add(str(e))
        for b in (plan.task.binners or ()):
            exprs.add(b.expression)
    if df.filtered:
        exprs.add(df._filter_expression())
    names = set()
    for e in exprs:
        try:
            names |= Expression(df, e).expand().variables()
        except Exception:  # noqa: BLE001 — malformed exprs fail later, loudly
            pass
    out = []
    for n in sorted(names):
        v = df.variables.get(n)
        if isinstance(v, HashMapUnique) and not v._is_string and v.count:
            out.append((n, v))
    return out


def _structural_binner_spec(spec):
    """Encoded binner spec with the runtime-argument fields neutralized —
    what remains is exactly what shapes the traced program (see
    _binner_slots).  BinnerOrdinal's i32-narrowing branch choice depends on
    the minimum's magnitude, so that BOOLEAN stays in the key."""
    out = dict(spec)
    if out.get("type") == "scalar":
        out["minimum"] = out["maximum"] = "<dyn>"
    elif out.get("type") == "ordinal":
        b = gridagg.BinnerOrdinal(
            out["expression"], out["count"], out.get("minimum", 0),
            out.get("allow_other", False), out.get("invert", False),
            out.get("assume_in_range", False))
        out["in_range32"] = b.in_range32()
        out["minimum"] = "<dyn>"
    return out


def _structural_task_spec(spec):
    if not isinstance(spec, dict) or "binners" not in spec:
        return spec
    out = dict(spec)
    out["binners"] = [_structural_binner_spec(b) for b in spec["binners"]]
    return out


def _plan_pallas_groups(plans, L_local):
    """Static Pallas fusion planning (see the call site in _compile_pass).

    Returns (groups, partner): groups is a list of launch dicts
    ``{binners, selection, sorted, units}`` where each unit is
    ``{value_expr, vav, counts: [plan idx], payloads: [(plan idx, role,
    exact_spec)]}``; partner maps plan idx -> group idx.  Count members ride
    the kernel's count block when their validity matches the launch's cell
    include (decided at trace time — mask presence is a trace-time fact);
    otherwise they become exact 0/1 indicator payloads.
    """
    from .ops.pallas_gridagg import (MAX_CELLS_COUNT, MAX_CELLS_PAYLOAD,
                                     MAX_CELLS_SORTED, MIN_CELLS,
                                     exact_int_spec)
    units = {}
    for i, plan in enumerate(plans):
        binners = plan.task.binners
        if not binners or plan.order_expr is not None:
            continue
        ncells = int(np.prod([b.shape for b in binners]))
        if not (MIN_CELLS <= ncells <= MAX_CELLS_SORTED):
            continue
        op = plan.op
        if not isinstance(op, (gridagg.AggOpCount, gridagg.AggOpSum,
                               gridagg.AggOpSumMoment)):
            continue
        if op.precision == "float64":
            # reference-parity mode: exact scatter/segment paths only for
            # float data (round-4 fix: float64 mode previously still engaged
            # the kernel, so 'parity' runs weren't)
            continue
        sorted_scale = ncells > MAX_CELLS_PAYLOAD
        role, spec = None, None
        if isinstance(op, gridagg.AggOpCount):
            role = "count"
        elif plan.value_as_validity:
            continue   # value-as-validity only makes sense for counts
        elif isinstance(op, gridagg.AggOpSumMoment):
            # moment payloads (v**m) ride the approx digit/hilo path — the
            # fused binned mean+std workload stays on the MXU; f64 moments
            # join beyond the flat cap (sorted-kernel scale, mixed
            # precision: ~3e-6 hilo error, documented); 1-byte int moments
            # are exact through m=2 via the integral snap
            dt = np.dtype(op.data_dtype)
            if dt.kind == "f":
                if dt.itemsize > 4 and not sorted_scale:
                    continue
            elif not (dt.kind in "biu" and dt.itemsize == 1):
                continue
            role = "moment"
        else:  # AggOpSum
            acc = op.init(1)
            dt = np.dtype(op.data_dtype)
            if acc.dtype in (jnp.float32, jnp.float64):
                if gridagg._sum_partial_dtype(op.data_dtype, acc.dtype) == np.dtype("float32"):
                    role = "sum"
                elif sorted_scale and dt.kind == "f":
                    # f64 float inputs: the exact hi/lo-pair scatter keeps
                    # near-f64 accuracy at flat-kernel scales; beyond the
                    # flat cap the sorted kernel takes them (266M rows/s vs
                    # 50M for the pair scatter, ~3e-6 per-value hilo error)
                    role = "sum"
                else:
                    continue
            else:
                spec = exact_int_spec(dt)
                if spec is None:
                    continue   # int64: beyond the kernel's int32 inputs
                if sorted_scale:
                    # sorted kernel: single-digit (1-byte) ints only, and
                    # its int32 locals stay exact only while chunk rows
                    # stay under 2^24
                    if dt.itemsize != 1 or L_local > (1 << 24):
                        continue
                role = "sum"
        ukey = (tuple(binners), plan.value_expr, plan.selection_expr,
                plan.value_as_validity)
        units.setdefault(ukey, []).append((i, role, spec))

    launches = {}
    for (binners_t, value_expr, selection, vav), members in sorted(
            units.items(), key=lambda kv: str(kv[0])):
        counts = [m[0] for m in members if m[1] == "count"]
        # per-unit payload cap matches the old per-group cap: extras fall
        # back to the scatter path
        payloads = [m for m in members if m[1] != "count"][:4]
        if not counts and not payloads:
            continue
        launches.setdefault((binners_t, selection), []).append(
            dict(value_expr=value_expr, vav=vav, counts=counts,
                 payloads=payloads))

    groups, partner = [], {}
    MAX_PAYLOAD_SLOTS = 8
    for (binners_t, selection), ulist in launches.items():
        ncells = int(np.prod([b.shape for b in binners_t]))
        # pack units into launches bounded by the payload-slot budget
        # (worst case each count member needs an indicator slot when merged)
        packs, cur, cur_n = [], [], 0
        for u in ulist:
            n_slots = len(u["payloads"]) + (len(u["counts"])
                                            if len(ulist) > 1 else 0)
            if cur and cur_n + n_slots > MAX_PAYLOAD_SLOTS:
                packs.append(cur)
                cur, cur_n = [], 0
            cur.append(u)
            cur_n += n_slots
        if cur:
            packs.append(cur)
        for pack in packs:
            n_pay = sum(len(u["payloads"]) for u in pack)
            # beyond the flat kernel's cap (MACs/row = O(C) loses to scatter
            # there) the sorted tile-local kernel takes over: sort + local
            # one-hot matmuls + sequential window merge
            sorted_path = ncells > (MAX_CELLS_PAYLOAD if n_pay
                                    else MAX_CELLS_COUNT)
            if sorted_path and not settings.compute.sorted_grid:
                continue
            gid = len(groups)
            groups.append(dict(binners=binners_t, selection=selection,
                               sorted=sorted_path, units=pack))
            for u in pack:
                for ci in u["counts"]:
                    partner[ci] = gid
                for (pi, _, _) in u["payloads"]:
                    partner[pi] = gid
    return groups, partner


def _compile_pass(df, plans, filter_on_device, filter_host_mask, mesh, L):
    """Build the jitted device step for one run.

    step(states, inputs, masks, n_valid, i1) -> states
    """
    filter_expr = df._filter_expression() if filter_on_device else None
    n_shards = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    L_local = L // n_shards
    dyn_limits = settings.compute.dynamic_limits
    if dyn_limits:
        _scalar_b, _ordinal_b, _ = _binner_slots(plans)
        slot_f = {b: i for i, b in enumerate(_scalar_b)}
        slot_i = {b: i for i, b in enumerate(_ordinal_b)}

    # -- static strategy planning: fuse eligible (count, sum, moment) plans
    # over the same (grid, selection) into ONE Pallas MXU kernel launch
    # (ops/pallas_gridagg.py).  Two tiers (round 5): plans sharing a value
    # expression form a UNIT (count rides the kernel's count block, value
    # validity folds into the cell index); units over the same (binners,
    # selection) MERGE into one launch — each unit keeps its own validity by
    # zeroing its payload (exact int payloads to -offset, which the
    # offset*count reconstruction cancels) instead of voiding the row.
    # Integer sums ride EXACT balanced base-256 digit payloads (int32
    # accumulators + slab recombination: bit-exact at any magnitude, h2o q1
    # measured 27B rows/s kernel-only at 100 cells); float sums ride the
    # digit modes; 1-byte int moments ride the approx path (the integral
    # snap keeps v**2 of int8 exact).
    pallas_partner = {}   # plan idx -> group idx in pallas_groups
    pallas_groups = []
    strategy = settings.compute.strategy
    on_tpu = jax.devices()[0].platform in ("tpu",)
    if strategy in ("auto", "pallas") and (on_tpu or strategy == "pallas"):
        pallas_groups, pallas_partner = _plan_pallas_groups(plans, L_local)

    def step(states, inputs, masks, n_valid, i1, row_offset=0):
        # 32-bit row indices: 64-bit emulation makes remote XLA compiles ~20x
        # slower; L_local < 2^31 always, and n_valid/row_offset fit i32 within
        # one chunk.  Global row order keys (first/last) are rebuilt as
        # i1 + rows in i64 only where needed.
        rows32 = jax.lax.broadcasted_iota(jnp.int32, (L_local, 1), 0).squeeze(-1)
        rows32 = rows32 + row_offset.astype(jnp.int32) if not isinstance(row_offset, int) else rows32 + np.int32(row_offset)
        row_valid = rows32 < n_valid.astype(jnp.int32)
        rows = rows32
        scope = DeviceScope(df, values=inputs, masks=masks)

        base_include = row_valid
        if filter_expr is not None:
            fmv = scope.evaluate(filter_expr)
            fmask = fmv.values.astype(bool)
            if fmv.mask is not None:
                fmask = fmask & ~fmv.mask
            base_include = base_include & fmask
        if filter_host_mask:
            base_include = base_include & inputs["__filter_mask__"].astype(bool)

        # bin indices per distinct binner tuple
        bins_cache = {}
        flat_cache = {}

        limsf = inputs.get("__binlims_f__") if dyn_limits else None
        limsi = inputs.get("__binlims_i__") if dyn_limits else None

        def get_bins(binners):
            key = tuple(binners)
            if key not in bins_cache:
                bins = []
                for b in binners:
                    mv = scope.evaluate(b.expression)
                    if limsf is not None and isinstance(b, gridagg.BinnerScalar):
                        bins.append(b.to_bins(mv.values, mv.mask, limits=limsf[slot_f[b]]))
                    elif limsi is not None and isinstance(b, gridagg.BinnerOrdinal):
                        bins.append(b.to_bins(mv.values, mv.mask, minimum=limsi[slot_i[b]]))
                    else:
                        bins.append(b.to_bins(mv.values, mv.mask))
                bins_cache[key] = bins
            return bins_cache[key]

        def get_flat(binners):
            key = tuple(binners)
            if key not in flat_cache:
                flat_cache[key] = gridagg.flat_index(binners, get_bins(binners))
            return flat_cache[key]

        work = []
        for i, (plan, state) in enumerate(zip(plans, states)):
            if i in pallas_partner:
                # evaluated inside the group launch (shared scope caches
                # dedupe any overlap with scatter plans)
                work.append((plan, state, None, None, None, None))
                continue
            binners = plan.task.binners
            if binners:
                flat = get_flat(binners)
            else:
                flat = jnp.zeros((L_local,), dtype=jnp.int32)
            include = base_include
            if plan.selection_expr is not None:
                smv = scope.evaluate(plan.selection_expr)
                smask = smv.values.astype(bool)
                if smv.mask is not None:
                    smask = smask & ~smv.mask
                include = include & smask
            value = None
            order_key = None
            if plan.value_expr is not None:
                vmv = scope.evaluate(plan.value_expr)
                value = vmv.values
                if plan.value_as_validity:
                    include = include & value.astype(bool)
                    value = None
                else:
                    # all primitive aggs skip missing & nan values
                    # (reference: agg_sum.cpp:98-126, agg_count.cpp:44-67)
                    if vmv.mask is not None:
                        include = include & ~vmv.mask
                    if jnp.issubdtype(value.dtype, jnp.floating):
                        include = include & ~jnp.isnan(value)
            if isinstance(plan.op, gridagg.AggOpFirst):
                if plan.order_expr is not None:
                    omv = scope.evaluate(plan.order_expr)
                    okey = omv.values.astype(jnp.int64)
                else:
                    okey = i1 + rows.astype(jnp.int64)
                order_key = -okey if plan.op.inverted else okey
            work.append((plan, state, flat, value, include, order_key))

        pallas_results = {}   # gid -> {plan idx: flat partial grid}

        def run_pallas_group(gid):
            from .ops.pallas_gridagg import histflat_grid, sorted_histflat_grid
            g = pallas_groups[gid]
            binners = g["binners"]
            ncells = int(np.prod([b.shape for b in binners]))
            include_g = base_include
            if g["selection"] is not None:
                smv = scope.evaluate(g["selection"])
                smask = smv.values.astype(bool)
                if smv.mask is not None:
                    smask = smask & ~smv.mask
                include_g = include_g & smask
            single = len(g["units"]) == 1
            vals, specs, assign = [], [], []
            count_block = []   # plan idxs served by the kernel's count grid
            for u in g["units"]:
                vmv = None
                vvalid = None   # the unit's value-validity mask, or None
                if u["value_expr"] is not None:
                    vmv = scope.evaluate(u["value_expr"])
                    if u["vav"]:
                        vvalid = vmv.values.astype(bool)
                        if vmv.mask is not None:
                            vvalid = vvalid & ~vmv.mask
                    else:
                        if vmv.mask is not None:
                            vvalid = ~vmv.mask
                        if jnp.issubdtype(vmv.values.dtype, jnp.floating):
                            nn = ~jnp.isnan(vmv.values)
                            vvalid = nn if vvalid is None else vvalid & nn
                if single and vvalid is not None:
                    # single-unit launch: fold the value validity into the
                    # cell index — counts then ride the count block for free
                    # (bitwise-identical to the round-4 per-value grouping)
                    include_g = include_g & vvalid
                    vvalid = None
                include_u = include_g if vvalid is None else include_g & vvalid
                for ci in u["counts"]:
                    if vvalid is None:
                        count_block.append(ci)
                    else:
                        # count-with-validity in a merged launch: exact 0/1
                        # indicator payload (one extra int8 digit block)
                        if g["sorted"]:
                            vals.append(include_u.astype(jnp.float32))
                        else:
                            vals.append(include_u.astype(jnp.int32))
                        specs.append((0, 1))
                        assign.append(ci)
                for (pi, role, spec) in u["payloads"]:
                    v = vmv.values
                    if spec is not None:
                        off = spec[0]
                        if g["sorted"]:
                            # sorted kernel takes raw f32 values + offset
                            # (1-byte ints only: f32 is exact there)
                            vals.append(jnp.where(include_u, v, 0).astype(jnp.float32))
                        elif np.dtype(plans[pi].op.data_dtype) == np.dtype(np.uint32):
                            # uint32 rides the bias trick: v ^ 2^31
                            # reinterpreted as int32 == v - 2^31
                            w = jnp.where(include_u, v, 0).astype(jnp.uint32)
                            vals.append(jax.lax.bitcast_convert_type(
                                w ^ np.uint32(1 << 31), jnp.int32))
                        else:
                            # excluded rows sit at -offset so digit(-offset)
                            # + offset*count cancels exactly
                            vals.append(jnp.where(include_u, v, 0)
                                        .astype(jnp.int32) - np.int32(off))
                        specs.append(spec)
                        assign.append(pi)
                    else:
                        x = jnp.where(include_u, v, 0).astype(jnp.float32)
                        if role == "moment":
                            x = x ** plans[pi].op.moment
                        vals.append(x)
                        specs.append(None)
                        assign.append(pi)
            flat = get_flat(binners)
            cflat = jnp.where(include_g, flat, np.int32(-1)).astype(jnp.int32)
            need_count = bool(count_block)
            if g["sorted"]:
                pcount, psums = sorted_histflat_grid(
                    cflat, tuple(vals), ncells, with_count=need_count,
                    int_offsets=tuple(s[0] if s is not None else None
                                      for s in specs))
            else:
                pcount, psums = histflat_grid(
                    cflat, tuple(vals), ncells, with_count=need_count,
                    int_specs=tuple(specs))
            res = {}
            for ci in count_block:
                res[ci] = pcount
            for slot, pi in enumerate(assign):
                res[pi] = psums[slot]
            pallas_results[gid] = res

        # execute: Pallas groups (one kernel launch each), scatter the rest
        new_states = [None] * len(plans)
        for i, (plan, state, flat, value, include, order_key) in enumerate(work):
            if i in pallas_partner:
                gid = pallas_partner[i]
                if gid not in pallas_results:
                    run_pallas_group(gid)
                partial = pallas_results[gid][i]
                flat_partial = jnp.concatenate(
                    [partial, jnp.zeros(1, partial.dtype)])  # void cell
                new_states[i] = state + flat_partial.astype(state.dtype)
            else:
                new_states[i] = plan.op.update(state, flat, value, include, order_key=order_key)
        return tuple(new_states)

    if mesh is not None and n_shards > 1:
        from .parallel.mesh import shard_pass

        def make(states, inputs, masks, n_valid, i1):
            return shard_pass(step, mesh, L_local)(states, inputs, masks, n_valid, i1)

        jitted = jax.jit(make, donate_argnums=0)
    else:
        jitted = jax.jit(step, donate_argnums=0)

    def run_step(states, inputs, masks, n_valid, i1):
        return jitted(states, inputs, masks, n_valid, i1)

    return run_step
