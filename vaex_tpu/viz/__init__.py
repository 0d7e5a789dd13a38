"""Visualization accessor: df.viz.* built on binned grids.

Counterpart of /root/reference/packages/vaex-viz/vaex/viz/mpl.py (962 LoC):
every plot is an aggregation grid computed on the TPU, rendered by
matplotlib — histogram (1-D count/agg), heatmap (2-D grid with log color),
scatter (small-data fallback), vector fields on mean grids.
"""

from .mpl import DataFrameAccessorViz  # noqa: F401
