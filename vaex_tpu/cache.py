"""Task-result cache keyed by fingerprints.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/cache.py:
272-371: every task result can be memoized by (task spec fingerprint + df
fingerprint + dataset hash).  Backends: in-process memory LRU and a simple
disk store; both toggled via `cache.on()/off()` or VAEX_TPU_CACHE env.
"""

from __future__ import annotations

import collections
import contextlib
import os
import pickle
import threading

from . import settings, utils

cache = None  # active cache object (dict-like) or None
_lock = threading.Lock()
log_stats = collections.Counter()


class MemoryCache(collections.abc.MutableMapping):
    """LRU bounded by approximate byte size."""

    def __init__(self, size_limit="1GB"):
        self.size_limit = utils.parse_memory_size(size_limit)
        self._data = collections.OrderedDict()
        self._sizes = {}
        self._total = 0

    def __getitem__(self, key):
        value = self._data[key]
        self._data.move_to_end(key)
        return value

    def __setitem__(self, key, value):
        size = _sizeof(value)
        if key in self._data:
            self._total -= self._sizes[key]
        self._data[key] = value
        self._sizes[key] = size
        self._total += size
        self._data.move_to_end(key)
        while self._total > self.size_limit and len(self._data) > 1:
            old_key, _ = self._data.popitem(last=False)
            self._total -= self._sizes.pop(old_key)

    def __delitem__(self, key):
        del self._data[key]
        self._total -= self._sizes.pop(key)

    def __iter__(self):
        return iter(self._data)

    def __len__(self):
        return len(self._data)


class DiskCache(collections.abc.MutableMapping):
    def __init__(self, path=None):
        self.path = path or settings.cache.path
        os.makedirs(self.path, exist_ok=True)

    def _file(self, key):
        return os.path.join(self.path, f"{key}.pickle")

    def __getitem__(self, key):
        try:
            with open(self._file(key), "rb") as f:
                return pickle.load(f)
        except FileNotFoundError:
            raise KeyError(key)

    def __setitem__(self, key, value):
        tmp = self._file(key) + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(value, f)
        os.replace(tmp, self._file(key))

    def __delitem__(self, key):
        try:
            os.remove(self._file(key))
        except FileNotFoundError:
            raise KeyError(key)

    def __iter__(self):
        for name in os.listdir(self.path):
            if name.endswith(".pickle"):
                yield name[:-len(".pickle")]

    def __len__(self):
        return sum(1 for _ in self)


class MultiLevelCache(collections.abc.MutableMapping):
    def __init__(self, *levels):
        self.levels = levels

    def __getitem__(self, key):
        for i, level in enumerate(self.levels):
            try:
                value = level[key]
                for upper in self.levels[:i]:
                    upper[key] = value
                return value
            except KeyError:
                continue
        raise KeyError(key)

    def __setitem__(self, key, value):
        for level in self.levels:
            level[key] = value

    def __delitem__(self, key):
        found = False
        for level in self.levels:
            try:
                del level[key]
                found = True
            except KeyError:
                pass
        if not found:
            raise KeyError(key)

    def __iter__(self):
        seen = set()
        for level in self.levels:
            for key in level:
                if key not in seen:
                    seen.add(key)
                    yield key

    def __len__(self):
        return len(set(self))


class RedisCache(collections.abc.MutableMapping):
    """Redis-backed result cache (reference: vaex/cache.py:272-371 redis
    tier).  Values are pickled; keys are namespaced under 'vaex_tpu:'.
    Requires the `redis` package — gated at construction."""

    PREFIX = "vaex_tpu:"

    def __init__(self, client=None, url=None):
        if client is None:
            try:
                import redis
            except ImportError as e:
                raise ImportError(
                    "the redis cache tier requires the 'redis' package "
                    "(pip install redis)") from e
            url = url or settings.cache.redis_url
            client = redis.Redis.from_url(url) if url else redis.Redis()
        self.client = client

    def _k(self, key):
        return self.PREFIX + key

    def __getitem__(self, key):
        data = self.client.get(self._k(key))
        if data is None:
            raise KeyError(key)
        return pickle.loads(data)

    def __setitem__(self, key, value):
        self.client.set(self._k(key), pickle.dumps(value, protocol=-1))

    def __delitem__(self, key):
        if not self.client.delete(self._k(key)):
            raise KeyError(key)

    def __iter__(self):
        for k in self.client.scan_iter(self.PREFIX + "*"):
            yield k.decode()[len(self.PREFIX):]

    def __len__(self):
        return sum(1 for _ in self)


def _sizeof(value):
    import numpy as np
    if isinstance(value, np.ndarray):
        return value.nbytes
    try:
        return len(pickle.dumps(value, protocol=-1))
    except Exception:  # noqa: BLE001
        return 1024


def _create(type_name):
    """Build a cache from a type spec; comma-separated names build a
    multilevel cache front-to-back (reference: vaex/cache.py:272-326 —
    'memory,disk', 'redis', 'memory,redis', ...)."""
    singles = {"memory": lambda: MemoryCache(settings.cache.memory_size_limit),
               "disk": DiskCache, "redis": RedisCache}
    parts = [p.strip() for p in type_name.split(",") if p.strip()]
    if not parts or any(p not in singles for p in parts):
        raise ValueError(f"unknown cache type {type_name!r} "
                         f"(choose from {sorted(singles)} or comma-combinations)")
    levels = [singles[p]() for p in parts]
    return levels[0] if len(levels) == 1 else MultiLevelCache(*levels)


def on(type="memory"):
    """Enable result caching (reference: vaex/cache.py:272)."""
    global cache
    cache = _create(type)
    return cache


def off():
    """Disable caching; returns a context manager that restores on exit
    (reference: vaex/cache.py:326)."""
    global cache
    old = cache
    cache = None

    @contextlib.contextmanager
    def restore():
        try:
            yield
        finally:
            globals()["cache"] = old

    return restore()


@contextlib.contextmanager
def temporary(type="memory"):
    global cache
    old = cache
    cache = _create(type)
    try:
        yield cache
    finally:
        cache = old


def is_on():
    return cache is not None


def get(key, default=None):
    if cache is None:
        return default
    with _lock:
        try:
            value = cache[key]
            log_stats["hit"] += 1
            return value
        except KeyError:
            log_stats["miss"] += 1
            return default


def set(key, value):
    if cache is None:
        return
    with _lock:
        cache[key] = value


def fingerprint(*args, **kwargs):
    return utils.fingerprint(*args, **kwargs)


# init from settings/env
if settings.cache.type:
    on(settings.cache.type)


def memory(clear=False):
    """Turn on the in-memory cache (reference: vaex.cache.memory_infinite)."""
    return on("memory")


def memory_infinite(clear=False):
    return on("memory")


def disk(clear=False):
    """Turn on the disk cache (reference: vaex.cache.disk)."""
    return on("disk")
