"""Contributed integrations (reference: packages/vaex-contrib).

Everything here gates its third-party dependencies at call time, so the
package imports cleanly in environments without them.
"""

from . import io  # noqa: F401
