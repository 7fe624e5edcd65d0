"""plot() context (reference mundipy/utils.py:4-12): user code inside a
Mundi.plot run calls plot(feature, label) to add geometries to the
debug canvas; outside a plot context it raises TypeError, matching the
reference's error contract (tests/test_external_plot.py:42-44)."""

from __future__ import annotations

import contextvars

_plot_ctx: contextvars.ContextVar = contextvars.ContextVar("mundipy_plot", default=None)


def plot(feature, label: str | None = None) -> None:
    sink = _plot_ctx.get()
    if sink is None:
        raise TypeError("mundipy.utils.plot() called outside of process fn")
    sink(feature)
