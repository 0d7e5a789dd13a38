"""Typed settings for vaex_tpu, sourced from environment variables.

TPU-native re-design of the reference settings system
(/root/reference/packages/vaex-core/vaex/settings.py:26-200): same concepts
(chunk sizes, cache, progress, display), but flat dataclasses configured via
``VAEX_TPU_*`` env vars instead of a mini-pydantic clone + yaml.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


def _env(name: str, default, typ=None):
    raw = os.environ.get(name)
    if raw is None:
        return default
    typ = typ or type(default)
    if typ is bool:
        return raw.lower() in ("1", "true", "yes", "on")
    return typ(raw)


@dataclasses.dataclass
class Chunk:
    """Chunk sizing for the streaming executor.

    Mirrors reference semantics (/root/reference/packages/vaex-core/vaex/
    settings.py:83 and execution.py:283-292): chunk size is clamped to
    [size_min, size_max]; on TPU chunks are additionally padded up to a
    power-of-two bucket to bound XLA recompiles.
    """

    size: Optional[int] = None          # explicit chunk size overrides auto
    size_min: int = 1024
    size_max: int = 1024 * 1024 * 8     # rows per device pass

    def __post_init__(self):
        self.size = _env("VAEX_TPU_CHUNK_SIZE", self.size, int)
        self.size_min = _env("VAEX_TPU_CHUNK_SIZE_MIN", self.size_min)
        self.size_max = _env("VAEX_TPU_CHUNK_SIZE_MAX", self.size_max)


@dataclasses.dataclass
class Cache:
    """Task-result cache (reference: vaex/cache.py:272-371)."""

    type: Optional[str] = None          # None/'memory'/'disk'
    path: str = os.path.expanduser("~/.vaex_tpu/cache")
    memory_size_limit: str = "1GB"
    disk_size_limit: str = "10GB"

    def __post_init__(self):
        self.type = _env("VAEX_TPU_CACHE", self.type, str)
        self.path = _env("VAEX_TPU_CACHE_PATH", self.path)


@dataclasses.dataclass
class Memory:
    """Memory tracking (reference: vaex/settings.py:57-64, memory.py)."""

    tracker: str = "default"
    limit: Optional[str] = None

    def __post_init__(self):
        self.tracker = _env("VAEX_TPU_MEMORY_TRACKER", self.tracker)
        self.limit = _env("VAEX_TPU_MEMORY_LIMIT", self.limit, str)


@dataclasses.dataclass
class Display:
    max_rows: int = 10
    max_columns: int = 200

    def __post_init__(self):
        self.max_rows = _env("VAEX_TPU_DISPLAY_MAX_ROWS", self.max_rows)
        self.max_columns = _env("VAEX_TPU_DISPLAY_MAX_COLUMNS", self.max_columns)


@dataclasses.dataclass
class Compute:
    """TPU execution knobs (no reference equivalent; TPU-specific).

    - device: 'auto' picks TPU when available, else cpu.
    - precision: accumulation precision for grid aggregation.
        'mixed'    - (default) 32-bit per-chunk partial scatters folded into
                     64-bit masters: ~13x faster than 64-bit scatters on TPU,
                     counts/bool-sums exact, float sums near-f64 accurate
        'float64'  - direct 64-bit accumulation (exact reference parity, slow)
        'float32'  - everything in 32 bits (fastest, lowest accuracy)
    - onehot_grid_limit: grids up to this many cells may use the MXU
      one-hot-matmul binning strategy instead of scatter-add.
    """

    device: str = "auto"
    precision: str = "mixed"
    onehot_grid_limit: int = 4096
    sharding: str = "auto"              # 'auto'/'none': shard chunks over mesh
    strategy: str = "auto"              # 'auto': Pallas MXU kernel for small 2-D
                                        # grids on TPU; 'scatter'/'pallas' force
    groupby_int_range_cells: int = 4 << 20  # integer keys whose (max-min+1)
                                        # fits group by offset, skipping the
                                        # hashmap + per-row ordinal mapping
    device_finalize: bool = True        # mean/var/std combine ON DEVICE and
                                        # fetch one grid instead of 2-3
                                        # constituent grids (the result D2H is
                                        # the per-query fixed cost)
    device_result: bool = True          # groupby over numeric single keys
                                        # builds its result frame from
                                        # DEVICE-resident columns (no grid
                                        # D2H at all — at 1M groups the mean
                                        # grid fetch alone is ~180ms over a
                                        # tunneled link)
    device_filter: str = "auto"         # filtered-indices (extract/join on a
                                        # filtered device frame) computed on
                                        # device: 'auto' = accelerator
                                        # backends only (avoids the tunnel
                                        # D2H of every dep column; on the CPU
                                        # backend host numpy is 3x faster),
                                        # 'on'/'off' force
    dynamic_limits: bool = True         # bin limits / ordinal minimums enter
                                        # the compiled pass as runtime args,
                                        # so data-derived limits reuse the
                                        # compiled program (a fresh minmax
                                        # pair otherwise pays a full remote
                                        # XLA recompile, ~20-40s tunneled)
    pallas_payload: str = "auto"        # sum-payload encoding in the MXU
                                        # grid kernel.  'auto' (default):
                                        # integer payloads ride EXACT digit
                                        # encodings (bit-exact at any
                                        # magnitude — dtype-routed in the
                                        # executor, active in every mode);
                                        # float payloads ride 'i8sr'.  The
                                        # sr error is zero-mean with
                                        # SD(sum_cell) = s*sqrt(n_cell/6),
                                        # s = halfrange_tile/125 (see
                                        # pallas_gridagg.sr_error_sd for the
                                        # closed form) — visualization /
                                        # sketch grade; pick 'i24' for ~5e-7
                                        # analytic-grade float sums.
                                        # Explicit modes:
                                        # 'i24' (three
                                        # balanced int8 digits in one wide
                                        # int8 matmul — 946M rows/s, 5e-7
                                        # rel err), 'hilo' (bf16 hi+lo pair,
                                        # 540M, 2.8e-6), 'i8lo' (643M, 2e-5),
                                        # 'i16' (two digits: 25% fewer MACs
                                        # than i24, ~1.5e-5 rel err; error
                                        # bound scales with tile size — the
                                        # quoted figure is at t16384),
                                        # 'i8sr' (ONE stochastically-rounded
                                        # digit: 1.18-1.28B rows/s measured;
                                        # zero-mean error, SD(sum_cell) =
                                        # s*sqrt(n_cell/6) with s =
                                        # halfrange_tile/125; small-range
                                        # integer sums snap to EXACT).
                                        # All digit modes center values at
                                        # the tile midrange (exact count
                                        # block as control variate).
    sorted_grid: bool = True            # high-cardinality grids (beyond the
                                        # flat kernel's ~700k-cell cap, up to
                                        # 64M cells) aggregate via sort +
                                        # tile-local MXU kernel: 266M rows/s
                                        # at 1M cells vs 44M scatter
                                        # (benchmarks/sortkernel_lab.py);
                                        # off -> XLA scatter fallback

    def __post_init__(self):
        self.device = _env("VAEX_TPU_DEVICE", self.device)
        self.precision = _env("VAEX_TPU_PRECISION", self.precision)
        self.onehot_grid_limit = _env("VAEX_TPU_ONEHOT_GRID_LIMIT", self.onehot_grid_limit)
        self.sharding = _env("VAEX_TPU_SHARDING", self.sharding)
        self.groupby_int_range_cells = _env(
            "VAEX_TPU_GROUPBY_INT_RANGE_CELLS", self.groupby_int_range_cells)
        self.strategy = _env("VAEX_TPU_STRATEGY", self.strategy)
        self.device_finalize = _env("VAEX_TPU_DEVICE_FINALIZE", self.device_finalize)
        self.device_result = _env("VAEX_TPU_DEVICE_RESULT", self.device_result)
        self.device_filter = _env("VAEX_TPU_DEVICE_FILTER", self.device_filter)
        self.dynamic_limits = _env("VAEX_TPU_DYNAMIC_LIMITS", self.dynamic_limits)
        self.pallas_payload = _env("VAEX_TPU_PALLAS_PAYLOAD", self.pallas_payload)
        self.sorted_grid = _env("VAEX_TPU_SORTED_GRID", self.sorted_grid)


@dataclasses.dataclass
class Settings:
    chunk: Chunk = dataclasses.field(default_factory=Chunk)
    cache: Cache = dataclasses.field(default_factory=Cache)
    memory: Memory = dataclasses.field(default_factory=Memory)
    display: Display = dataclasses.field(default_factory=Display)
    compute: Compute = dataclasses.field(default_factory=Compute)
    progress_type: str = _env("VAEX_TPU_PROGRESS_TYPE", "simple")
    progress_force: bool = _env("VAEX_TPU_PROGRESS", False, bool)
    aliases_path: str = os.path.expanduser("~/.vaex_tpu/aliases.yaml")

    def as_dict(self):
        return dataclasses.asdict(self)


def _apply_yaml_file(settings, path=None):
    """Overlay settings from a YAML file (reference: settings.py loads
    ~/.vaex/main.yml).  File values apply on top of defaults; environment
    variables have already been applied in __post_init__ and win, matching
    the reference's env > file > default precedence (env keys are only
    overridden when the env var is unset).  Section names mirror the
    dataclass fields::

        chunk:
          size_max: 4194304
        compute:
          precision: float64
    """
    path = path or os.environ.get("VAEX_TPU_SETTINGS_FILE",
                                  os.path.expanduser("~/.vaex_tpu/main.yaml"))
    if not os.path.exists(path):
        return settings
    try:
        import yaml
        with open(path) as f:
            data = yaml.safe_load(f) or {}
    except Exception:
        return settings
    _ENV_NAMES = {
        ("chunk", "size"): "VAEX_TPU_CHUNK_SIZE",
        ("chunk", "size_min"): "VAEX_TPU_CHUNK_SIZE_MIN",
        ("chunk", "size_max"): "VAEX_TPU_CHUNK_SIZE_MAX",
    }
    for section, values in data.items():
        target = getattr(settings, section, None)
        if target is None or not isinstance(values, dict):
            if hasattr(settings, str(section)) and not isinstance(values, dict):
                setattr(settings, section, values)
            continue
        for key, value in values.items():
            if not hasattr(target, key):
                continue
            env_name = _ENV_NAMES.get((section, key),
                                      f"VAEX_TPU_{section.upper()}_{key.upper()}")
            if os.environ.get(env_name) is not None:
                continue  # env var wins
            setattr(target, key, value)
    return settings


main = _apply_yaml_file(Settings())
chunk = main.chunk
cache = main.cache
memory = main.memory
display = main.display
compute = main.compute
