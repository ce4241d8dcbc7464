"""Pinned manifest of the napari/magicgui/qtpy API surface the widgets use.

The widget layer (gui/widgets.py) executes in CI only against the
in-memory stubs (tests/qt_stubs.py) because napari is not installable in
the build environment. The residual risk is silent drift: the stubs
implementing something the real libraries spell differently, or
widgets.py growing a dependency the stubs don't cover. This manifest
pins, in ONE place, every external name and attribute widgets.py
touches; tests/test_gui_surface.py asserts

  (a) the stubs implement exactly this surface, and
  (b) widgets.py imports nothing outside it (AST scan),

so when a real napari environment exists, validating the port is a
mechanical read of this file against the real API docs (reference
behaviors: _widget.py:393-885). widgets.py itself is untouched by this
mechanism.
"""

# {module: {imported name: [attributes used on it]}}
# "()" marks names that are called directly; "<ret>.attr" marks
# attributes used on the call's return value.
QT_SURFACE = {
    "qtpy.QtWidgets": {
        "QWidget": ["setLayout", "windowFlags"],
        "QVBoxLayout": ["addWidget", "itemAt"],
        "QPushButton": ["clicked", "setEnabled"],
        "QLabel": ["setText"],
        "QTextEdit": ["setReadOnly", "setPlainText"],
        "QFileDialog": ["getOpenFileName", "getExistingDirectory"],
    },
    "magicgui": {
        # decorator factory: magicgui(call_button=..., **options)(fn)
        # -> widget with .native (.close/.setParent/.windowFlags) and
        # .show()
        "magicgui": ["()", "<ret>.native", "<ret>.show"],
    },
    "napari": {
        # type annotation only ("napari.viewer.Viewer"); instances come
        # from the host application. Attributes the widgets use on a
        # viewer: layers (in / [] / .events.removed.connect),
        # add_image(name=), add_labels(name=).
        "napari": ["viewer"],
    },
    "napari.qt.threading": {
        # create_worker(fn, *args) -> worker with .returned.connect /
        # .finished.connect / .start
        "create_worker": ["()", "<ret>.returned", "<ret>.finished",
                          "<ret>.start"],
    },
    "napari.utils.notifications": {
        "show_info": ["()"],
    },
}

# duck-typed objects the widgets receive from napari at runtime
VIEWER_SURFACE = ["layers", "add_image", "add_labels"]
LAYERLIST_SURFACE = ["__contains__", "__getitem__", "events"]
LAYER_SURFACE = ["data", "name", "mouse_drag_callbacks"]
# mouse/delete event objects: event.position, event.value.name
EVENT_SURFACE = ["position", "value"]
