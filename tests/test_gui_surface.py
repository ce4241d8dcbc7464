"""Stub-drift guard for the GUI layer (VERDICT r2 #8).

Asserts that (a) tests/qt_stubs.py implements every name+attribute in the
pinned manifest ribca_tpu/gui/qt_surface.py, and (b) gui/widgets.py
imports nothing from napari/magicgui/qtpy beyond that manifest — so any
new external dependency forces a manifest update, and porting to real
napari is a mechanical check of one file.
"""

import ast
import os

from ribca_tpu.gui.qt_surface import (
    EVENT_SURFACE,
    LAYER_SURFACE,
    LAYERLIST_SURFACE,
    QT_SURFACE,
    VIEWER_SURFACE,
)

WIDGETS_PATH = os.path.join(
    os.path.dirname(__file__), "..", "ribca_tpu", "gui", "widgets.py"
)


def _stub_modules():
    import sys

    import qt_stubs

    qt_stubs.install()
    return {name: sys.modules[name] for name in QT_SURFACE}


def test_stubs_implement_manifest():
    mods = _stub_modules()
    for mod_name, names in QT_SURFACE.items():
        mod = mods[mod_name]
        for name, attrs in names.items():
            if mod_name == "napari" and name == "napari":
                continue  # annotation-only
            obj = getattr(mod, name)
            probe = obj
            if isinstance(obj, type):
                try:
                    probe = obj()  # instance attrs (e.g. button.clicked)
                except Exception:
                    probe = obj
            for attr in attrs:
                if attr == "()" or attr.startswith("<ret>."):
                    continue  # callability / returns checked below
                assert hasattr(probe, attr) or hasattr(obj, attr), (
                    f"stub {mod_name}.{name} missing .{attr}"
                )


def test_stub_worker_and_magicgui_returns():
    import sys

    import qt_stubs

    qt_stubs.install()
    create_worker = sys.modules["napari.qt.threading"].create_worker
    w = create_worker(lambda: 1)
    for attr in ("returned", "finished", "start"):
        assert hasattr(w, attr)

    magicgui = sys.modules["magicgui"].magicgui
    panel = magicgui(call_button="Run")(lambda: None)
    assert hasattr(panel, "native") and hasattr(panel, "show")
    for attr in ("close", "setParent", "windowFlags"):
        assert hasattr(panel.native, attr)


def test_stub_viewer_layer_event_surface():
    import numpy as np
    import qt_stubs

    qt_stubs.install()
    viewer = qt_stubs.FakeViewer()
    for attr in VIEWER_SURFACE:
        assert hasattr(viewer, attr)
    for attr in LAYERLIST_SURFACE:
        assert hasattr(viewer.layers, attr)
    layer = viewer.add_labels(np.zeros((4, 4), np.int32), name="m")
    for attr in LAYER_SURFACE:
        assert hasattr(layer, attr)
    # delete events deliver .value.name (widgets._handle_delete)
    seen = []
    viewer.layers.events.removed.connect(lambda e: seen.append(e))
    viewer.remove_layer("m")
    assert seen and hasattr(seen[0], "value")
    assert hasattr(seen[0].value, "name")
    assert set(EVENT_SURFACE) == {"position", "value"}


def test_widgets_imports_stay_inside_manifest():
    """AST scan: every from-import of an external GUI package in
    widgets.py must be declared in the manifest."""
    tree = ast.parse(open(WIDGETS_PATH).read())
    external_roots = ("napari", "magicgui", "qtpy")
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module:
            root = node.module.split(".")[0]
            if root in external_roots:
                assert node.module in QT_SURFACE, (
                    f"widgets.py imports from {node.module} which is not "
                    "in gui/qt_surface.QT_SURFACE — update the manifest"
                )
                declared = QT_SURFACE[node.module]
                for alias in node.names:
                    assert alias.name in declared, (
                        f"widgets.py imports {node.module}.{alias.name} "
                        "not declared in gui/qt_surface.QT_SURFACE"
                    )
        elif isinstance(node, ast.Import):
            for alias in node.names:
                root = alias.name.split(".")[0]
                if root in external_roots:
                    assert alias.name in QT_SURFACE, (
                        f"widgets.py imports {alias.name} not in manifest"
                    )
