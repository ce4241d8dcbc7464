"""In-memory stand-ins for napari / magicgui / qtpy.

napari is not installable in this environment (offline; ROADMAP #2), but
``ribca_tpu.gui.widgets`` should still be *executed*, not just parsed.
These stubs implement exactly the API surface widgets.py touches — Qt
widgets/layout/dialog, the magicgui decorator, napari viewer/layers/
events, worker threads (run synchronously), and show_info — so the full
widget layer can be driven headlessly in CI. Install with
:func:`install` BEFORE importing ribca_tpu.gui.widgets.
"""

from __future__ import annotations

import sys
import types

INFO_MESSAGES: list[str] = []


class Signal:
    def __init__(self):
        self._subs = []

    def connect(self, fn):
        self._subs.append(fn)

    def emit(self, *args):
        for fn in list(self._subs):
            fn(*args)


# -- qtpy.QtWidgets ---------------------------------------------------------


class QWidget:
    def __init__(self, *args, **kwargs):
        pass

    def setLayout(self, layout):
        self._qt_layout = layout

    def windowFlags(self):
        return None


class QVBoxLayout:
    def __init__(self):
        self._items = []

    def addWidget(self, widget):
        self._items.append(widget)

    def itemAt(self, i):
        widget = self._items[i]
        return types.SimpleNamespace(widget=lambda: widget)


class QPushButton:
    def __init__(self, text=""):
        self._text = text
        self.clicked = Signal()
        self.enabled = True

    def setEnabled(self, value):
        self.enabled = bool(value)

    def text(self):
        return self._text


class QLabel:
    def __init__(self, text=""):
        self._text = text

    def setText(self, text):
        self._text = text

    def text(self):
        return self._text


class QTextEdit:
    def __init__(self):
        self._text = ""
        self._read_only = False

    def setReadOnly(self, value):
        self._read_only = bool(value)

    def setPlainText(self, text):
        self._text = text

    def toPlainText(self):
        return self._text


class QFileDialog:
    """Static pickers scripted through class attributes."""

    next_file: str | None = None
    next_dir: str | None = None

    @staticmethod
    def getOpenFileName(*args, **kwargs):
        return (QFileDialog.next_file, "")

    @staticmethod
    def getExistingDirectory(*args, **kwargs):
        return QFileDialog.next_dir


# -- napari -------------------------------------------------------------


class Layer:
    def __init__(self, data, name):
        self.data = data
        self.name = name
        self.mouse_drag_callbacks = []


class LayerList(list):
    def __init__(self):
        super().__init__()
        self.events = types.SimpleNamespace(removed=Signal())

    def __contains__(self, key):
        if isinstance(key, str):
            return any(layer.name == key for layer in self)
        return list.__contains__(self, key)

    def __getitem__(self, key):
        if isinstance(key, str):
            for layer in self:
                if layer.name == key:
                    return layer
            raise KeyError(key)
        return list.__getitem__(self, key)


class FakeViewer:
    def __init__(self):
        self.layers = LayerList()

    def add_image(self, data, name=""):
        layer = Layer(data, name)
        self.layers.append(layer)
        return layer

    def add_labels(self, data, name=""):
        return self.add_image(data, name)

    def remove_layer(self, name):
        layer = self.layers[name]
        list.remove(self.layers, layer)
        self.layers.events.removed.emit(
            types.SimpleNamespace(value=layer)
        )


# -- magicgui / threading / notifications ------------------------------------


LAST_PANEL: list = []  # most recent magicgui panel, for tests to invoke


def magicgui(**options):
    def decorator(fn):
        class _Panel:
            native = types.SimpleNamespace(
                setParent=lambda *a, **k: None,
                windowFlags=lambda: None,
                close=lambda: None,
            )

            def __init__(self):
                self.options = options
                self.fn = fn

            def __call__(self, **kwargs):
                return fn(**kwargs)

            def show(self):
                pass

        panel = _Panel()
        LAST_PANEL.clear()
        LAST_PANEL.append(panel)
        return panel

    return decorator


def create_worker(fn, *args, **kwargs):
    class Worker:
        def __init__(self):
            self.returned = Signal()
            self.finished = Signal()

        def start(self):
            result = fn(*args, **kwargs)
            self.returned.emit(result)
            self.finished.emit()

    return Worker()


def show_info(msg):
    INFO_MESSAGES.append(str(msg))


# -- installer ----------------------------------------------------------


def install():
    """Register the stub modules in sys.modules (idempotent)."""
    napari = types.ModuleType("napari")
    napari_qt = types.ModuleType("napari.qt")
    napari_qt_threading = types.ModuleType("napari.qt.threading")
    napari_qt_threading.create_worker = create_worker
    napari_utils = types.ModuleType("napari.utils")
    napari_notif = types.ModuleType("napari.utils.notifications")
    napari_notif.show_info = show_info
    napari.qt = napari_qt
    napari_qt.threading = napari_qt_threading
    napari.utils = napari_utils
    napari_utils.notifications = napari_notif

    magicgui_mod = types.ModuleType("magicgui")
    magicgui_mod.magicgui = magicgui

    qtpy = types.ModuleType("qtpy")
    qtwidgets = types.ModuleType("qtpy.QtWidgets")
    for cls in (QFileDialog, QLabel, QPushButton, QTextEdit, QVBoxLayout,
                QWidget):
        setattr(qtwidgets, cls.__name__, cls)
    qtpy.QtWidgets = qtwidgets

    for name, mod in {
        "napari": napari,
        "napari.qt": napari_qt,
        "napari.qt.threading": napari_qt_threading,
        "napari.utils": napari_utils,
        "napari.utils.notifications": napari_notif,
        "magicgui": magicgui_mod,
        "qtpy": qtpy,
        "qtpy.QtWidgets": qtwidgets,
    }.items():
        sys.modules.setdefault(name, mod)
