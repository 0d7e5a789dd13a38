"""Progress tracking: a tree of progress bars mirroring the task DAG.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/progress.py
(ProgressTree:29, bar/tree:176-184): every pass reports fractional progress
per chunk; callbacks returning False cancel the pass cooperatively
(reference: execution.py:420-431).  Backends: 'simple' (stderr), 'rich',
'widget' (ipywidgets), or any callable.
"""

from __future__ import annotations

import sys
import time

from . import settings

_progressbar_registry = {}


def register_backend(name):
    def wrapper(cls):
        _progressbar_registry[name] = cls
        return cls
    return wrapper


@register_backend("simple")
class ProgressBarSimple:
    def __init__(self, title="progress", max_value=1.0):
        self.title = title
        self.max_value = max_value
        self.value = 0
        self._last_print = 0.0

    def __call__(self, fraction):
        now = time.time()
        if fraction >= 1 or now - self._last_print > 0.2:
            self._last_print = now
            width = 30
            filled = int(width * fraction)
            bar = "#" * filled + "-" * (width - filled)
            sys.stderr.write(f"\r{self.title}: [{bar}] {fraction * 100:5.1f}%")
            if fraction >= 1:
                sys.stderr.write("\n")
            sys.stderr.flush()
        return True

    def finish(self):
        self(1.0)


@register_backend("rich")
class ProgressBarRich:
    def __init__(self, title="progress", max_value=1.0):
        from rich.progress import Progress
        self.progress = Progress()
        self.task = self.progress.add_task(title, total=100)
        self.progress.start()
        self._done = False

    def __call__(self, fraction):
        self.progress.update(self.task, completed=fraction * 100)
        if fraction >= 1 and not self._done:
            self._done = True
            self.progress.stop()
        return True

    def finish(self):
        self(1.0)


@register_backend("widget")
class ProgressBarWidget:
    def __init__(self, title="progress", max_value=1.0):
        import ipywidgets
        from IPython.display import display
        self.bar = ipywidgets.FloatProgress(value=0, min=0, max=1, description=title)
        display(self.bar)

    def __call__(self, fraction):
        self.bar.value = fraction
        return True

    def finish(self):
        self(1.0)


class ProgressTree:
    """Hierarchical progress: children report fractions, parent aggregates
    (reference: progress.py:29).  Cancellation: any callback returning False
    aborts the pass (UserAbort)."""

    def __init__(self, children=None, callback=None, title=None, parent=None):
        self.children = children or []
        self.callbacks = [callback] if callback else []
        self.title = title
        self.parent = parent
        self.fraction = 0.0
        self.cancelled = False

    def add(self, title=None):
        child = ProgressTree(title=title, parent=self)
        self.children.append(child)
        return child

    def add_task(self, task, title=None):
        child = self.add(title)

        def on_progress(fraction):
            return child(fraction)

        task.progress(on_progress)
        return child

    def __call__(self, fraction):
        self.fraction = fraction
        ok = True
        for cb in self.callbacks:
            if cb(fraction) is False:
                ok = False
                self.cancelled = True
        if self.parent is not None:
            if self.parent._update_from_children() is False:
                ok = False
        return ok

    def _update_from_children(self):
        if self.children:
            self.fraction = sum(c.fraction for c in self.children) / len(self.children)
        ok = True
        for cb in self.callbacks:
            if cb(self.fraction) is False:
                ok = False
                self.cancelled = True
        if self.parent is not None:
            if self.parent._update_from_children() is False:
                ok = False
        return ok

    def exit_on(self, promise):
        return promise

    def finish(self):
        self(1.0)


def bar(type_name=None, title="vaex_tpu"):
    type_name = type_name or settings.main.progress_type
    cls = _progressbar_registry.get(type_name, ProgressBarSimple)
    return cls(title=title)


def tree(progress=None, title=None):
    """Normalize a `progress` argument (reference: progress.py tree).

    - None/False → inert tree
    - True → visual bar from settings backend
    - str → that backend
    - callable → callback (False return cancels)
    - ProgressTree → itself
    """
    if isinstance(progress, ProgressTree):
        return progress
    root = ProgressTree(title=title)
    if progress is True:
        root.callbacks.append(bar(title=title or "vaex_tpu"))
    elif isinstance(progress, str):
        root.callbacks.append(bar(progress, title=title or "vaex_tpu"))
    elif callable(progress):
        root.callbacks.append(progress)
    return root


def progressbars(progress=None, title=None):
    return tree(progress, title=title)
