"""napari widgets: Single-Image Annotator and Batch Processing.

Functional parity with the reference plugin (_widget.py): file pickers
with OME/QPTIFF marker auto-extraction, a magicgui parameter panel with
the same fields and defaults, a worker thread that hands off through the
JSON job protocol (api/gui_api.py), result label-maps loaded back as
napari Labels layers, a marker list panel, a cell-type legend panel, and
per-cell intensity readout on mask click.

This module requires napari/magicgui/qtpy at import time; the rest of the
framework never imports it (see gui/__init__.py lazy export).
"""

from __future__ import annotations

import os
import shutil

import numpy as np

try:  # pragma: no cover - exercised only inside napari
    import napari
    from magicgui import magicgui
    from napari.qt.threading import create_worker
    from napari.utils.notifications import show_info
    from qtpy.QtWidgets import (
        QFileDialog,
        QLabel,
        QPushButton,
        QTextEdit,
        QVBoxLayout,
        QWidget,
    )
except ImportError as _err:  # pragma: no cover
    raise ImportError(
        "ribca_tpu.gui.widgets requires napari, magicgui and qtpy; "
        "install the [gui] extra"
    ) from _err

from ribca_tpu.gui import logic


class _BaseWidget(QWidget):  # pragma: no cover - Qt event plumbing
    def __init__(self, viewer: "napari.viewer.Viewer"):
        super().__init__()
        self.viewer = viewer
        self.marker_file: str | None = None
        self.markers: list[str] = []
        self.main_dir: str = os.getcwd()
        self.params = logic.default_params()
        self._layout = QVBoxLayout()
        self.setLayout(self._layout)
        self.marker_panel = QTextEdit()
        self.marker_panel.setReadOnly(True)

    def _pick_file(self, caption, filter_=""):
        path, _ = QFileDialog.getOpenFileName(self, caption, "", filter_)
        return path or None

    def _pick_dir(self, caption):
        path = QFileDialog.getExistingDirectory(self, caption)
        return path or None

    def _show_markers(self):
        if self.marker_file and os.path.isfile(self.marker_file):
            self.markers = logic.read_marker_names(self.marker_file)
            with open(self.marker_file) as f:
                self.marker_panel.setPlainText(f.read())

    def _load_prefill(self):
        path = self._pick_file("Select hyperparameters JSON", "*.json")
        if path:
            self.params = logic.load_prefill_json(path)
            if self.params.get("marker_file"):
                self.marker_file = self.params["marker_file"]
                self._show_markers()
            if self.params.get("main_dir"):
                self.main_dir = self.params["main_dir"]
            show_info("Parameters loaded from JSON")


class GUIIntegrater(_BaseWidget):  # pragma: no cover - Qt event plumbing
    """Single-image annotator widget (reference _widget.py:393-885)."""

    def __init__(self, viewer: "napari.viewer.Viewer"):
        super().__init__(viewer)
        self.params = logic.panel_defaults()
        self.image_file: str | None = None
        self.mask_file: str | None = None
        self.intensity_dict: dict | None = None
        # reset file picks when their layer is deleted (_widget.py:850-858)
        try:
            self.viewer.layers.events.removed.connect(self._handle_delete)
        except AttributeError:
            pass

        for text, cb in [
            ("Upload Image", self._add_image),
            ("Upload Marker List", self._add_marker),
            ("Upload Cell Mask", self._add_mask),
            ("Select Main Directory", self._set_main_dir),
            ("Load Parameters from JSON", self._load_prefill),
            ("Set Parameters and Run Annotator", self._open_params),
        ]:
            btn = QPushButton(text)
            btn.clicked.connect(cb)
            self._layout.addWidget(btn)
        self._layout.addWidget(QLabel("Markers"))
        self._layout.addWidget(self.marker_panel)
        self.legend_panel = QTextEdit()
        self.legend_panel.setReadOnly(True)
        self._layout.addWidget(QLabel("Cell types"))
        self._layout.addWidget(self.legend_panel)
        self.intensity_panel = QLabel("Click a cell to inspect intensities")
        self._layout.addWidget(self.intensity_panel)

    # -- callbacks ----------------------------------------------------------

    def _handle_delete(self, event):
        updates = logic.layer_delete_updates(
            getattr(getattr(event, "value", None), "name", "")
        )
        if "image_file" in updates:
            self.image_file = updates["image_file"]
            show_info("Image layer removed; please re-upload an image")
        if "mask_file" in updates:
            self.mask_file = updates["mask_file"]
            show_info("Mask layer removed; please re-upload a mask")

    def _add_image(self):
        path = self._pick_file("Select multiplexed image",
                               "*.tif *.tiff *.qptiff")
        if not path:
            return
        self.image_file = path
        from ribca_tpu.io import read_image

        img = read_image(path)
        name = logic.IMAGE_LAYER_NAME
        if name in self.viewer.layers:
            # re-upload updates in place (reference _widget.py:671-674)
            self.viewer.layers[name].data = img
        else:
            self.viewer.add_image(img, name=name)
        auto = logic.auto_extract_markers(path, self.main_dir, batch=False)
        if auto:
            self.marker_file = auto
            self._show_markers()
            show_info("Markers auto-extracted from image metadata")

    def _add_marker(self):
        path = self._pick_file("Select marker list", "*.txt *.csv")
        if path:
            self.marker_file = path
            self._show_markers()

    def _add_mask(self):
        path = self._pick_file("Select cell mask", "*.png *.tif *.tiff")
        if not path:
            return
        self.mask_file = path
        from ribca_tpu.io import read_mask

        mask = read_mask(path)
        name = logic.MASK_LAYER_NAME
        if name in self.viewer.layers:
            self.viewer.layers[name].data = mask
        else:
            layer = self.viewer.add_labels(mask, name=name)
            layer.mouse_drag_callbacks.append(self._on_mask_click)

    def _set_main_dir(self):
        path = self._pick_dir("Select main directory")
        if path:
            self.main_dir = path

    def _on_mask_click(self, layer, event):
        if self.intensity_dict is None:
            return
        pos = tuple(int(round(c)) for c in event.position[-2:])
        try:
            cell = int(layer.data[pos])
        except Exception:
            return
        vec = self.intensity_dict.get(cell)
        markers = self.markers
        if not markers and vec is not None:
            markers = [f"ch{i}" for i in range(len(np.atleast_1d(vec)))]
        self.intensity_panel.setText(logic.format_intensity(markers, vec))

    # -- run ----------------------------------------------------------------

    def _open_params(self):
        p = self.params

        @magicgui(
            call_button="Run",
            **logic.PANEL_WIDGET_OPTIONS,
        )
        def panel(
            device: str = p["device"],
            batch_size: int = p["batch_size"],
            strict: bool = p["strict"],
            infer: bool = p["infer"],
            normalize: bool = p["normalize"],
            blur: float = p["blur"],
            upper_limit: float = p["upper_limit"],
            confidence: float = p["confidence"],
            cell_size: int = p["cell_size"],
            min_cells: int = p["min_cells"],
            n_regions: int = p["n_regions"],
            n_jobs: int = p["n_jobs"],
        ):
            self.params.update(
                device=device, batch_size=batch_size, strict=strict,
                infer=infer, normalize=normalize, blur=blur,
                upper_limit=upper_limit, confidence=confidence,
                cell_size=cell_size, min_cells=min_cells,
                n_regions=n_regions, n_jobs=n_jobs,
            )
            panel.native.close()
            self._run()

        panel.native.setParent(self, panel.native.windowFlags())
        panel.show()

    def _run(self):
        errors = logic.validate_single_params(
            self.marker_file, self.image_file, self.mask_file, self.main_dir
        )
        if errors:
            for e in errors:
                show_info(e)
            return
        wd = logic.prepare_working_dir(self.main_dir)
        logic.write_single_handoff(wd, {
            **self.params,
            "marker_file": self.marker_file,
            "image_file": self.image_file,
            "mask_file": self.mask_file,
            "main_dir": self.main_dir,
        })
        worker = create_worker(logic.run_single, wd)
        worker.returned.connect(lambda res: self._finished(wd, res))
        worker.start()
        show_info("Annotator started")

    def _finished(self, wd, result):
        self.intensity_dict, legend = result
        self.legend_panel.setPlainText(legend)
        for data, name in logic.collect_output_layers(wd):
            self.viewer.add_labels(data, name=name)
        shutil.rmtree(wd, ignore_errors=True)
        show_info("Annotation finished")


class BatchProcess(_BaseWidget):  # pragma: no cover - Qt event plumbing
    """Batch-processing widget (reference _widget.py:61-390)."""

    def __init__(self, viewer: "napari.viewer.Viewer"):
        super().__init__(viewer)
        self.csv_file: str | None = None
        self.batch_id: str = "batch"

        for text, cb in [
            ("Upload Batch CSV", self._add_csv),
            ("Upload Marker List", self._add_marker),
            ("Select Main Directory", self._set_main_dir),
            ("Load Parameters from JSON", self._load_prefill),
            ("Run Batch Processing", self._run),
        ]:
            btn = QPushButton(text)
            btn.clicked.connect(cb)
            self._layout.addWidget(btn)
        self.run_button = self._layout.itemAt(4).widget()
        self._layout.addWidget(QLabel("Markers"))
        self._layout.addWidget(self.marker_panel)
        self.status = QLabel("")
        self._layout.addWidget(self.status)

    def _add_csv(self):
        path = self._pick_file("Select batch CSV", "*.csv")
        if not path:
            return
        self.csv_file = path
        # auto-extract markers from the first image in the manifest
        try:
            from ribca_tpu.io.manifest import read_manifest

            pairs = read_manifest(path)
            if pairs:
                auto = logic.auto_extract_markers(
                    pairs[0][0], self.main_dir, batch=True
                )
                if auto:
                    self.marker_file = auto
                    self._show_markers()
                    show_info("Markers auto-extracted from first image")
        except Exception:
            pass

    def _add_marker(self):
        path = self._pick_file("Select marker list", "*.txt *.csv")
        if path:
            self.marker_file = path
            self._show_markers()

    def _set_main_dir(self):
        path = self._pick_dir("Select main directory")
        if path:
            self.main_dir = path

    def _run(self):
        errors = logic.validate_batch_params(
            self.marker_file, self.csv_file, self.main_dir
        )
        if errors:
            for e in errors:
                show_info(e)
            return
        wd = logic.prepare_working_dir(self.main_dir)
        logic.write_batch_handoff(wd, {
            **self.params,
            "marker_file": self.marker_file,
            "csv_file": self.csv_file,
            "main_dir": self.main_dir,
            "batch_id": self.batch_id,
        })
        self.run_button.setEnabled(False)
        self.status.setText("Batch running...")
        worker = create_worker(logic.run_batch, wd)
        worker.finished.connect(lambda: self._afterwork(wd))
        worker.start()

    def _afterwork(self, wd):
        try:
            if logic.batch_completed(wd):
                self.status.setText(
                    f"Batch complete - results in {self.main_dir}/results"
                )
            else:
                self.status.setText("Batch failed - see log.txt")
        finally:
            shutil.rmtree(wd, ignore_errors=True)
            self.run_button.setEnabled(True)
