"""File format support: importing this package registers all openers
(reference: entry_points 'vaex.dataset.opener', /root/reference/packages/
vaex-core/vaex/dataset.py:64)."""

from . import hdf5, arrow, csv, json  # noqa: F401  (register openers)
from .. import astro  # noqa: F401  (fits + votable openers)
