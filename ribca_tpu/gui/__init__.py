"""napari plugin package (L6 of the reference layer map, SURVEY §1).

The Qt widget classes live in :mod:`ribca_tpu.gui.widgets` and import
napari/magicgui lazily so the core framework stays importable headless;
all testable behavior (parameter validation, JSON handoff, marker
auto-extraction) is in :mod:`ribca_tpu.gui.logic`.
"""

from __future__ import annotations

__all__ = ["GUIIntegrater", "BatchProcess"]


def __getattr__(name):
    if name in __all__:
        from ribca_tpu.gui import widgets

        return getattr(widgets, name)
    raise AttributeError(name)
