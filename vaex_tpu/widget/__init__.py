"""Jupyter widgets: reactive grid models + ipywidgets views.

Counterpart of /root/reference/packages/vaex-jupyter (SURVEY.md §2.4,
jupyter/model.py:86-566 Axis/DataArray traitlets state machines,
view.py/widgets.py): models observe expression/limit changes and recompute
their binned grids on the TPU executor; views render with matplotlib inside
ipywidgets (bqplot/ipyvolume are not in this environment).
"""

from .model import Axis, GridModel  # noqa: F401
from .view import DataFrameAccessorWidget  # noqa: F401
