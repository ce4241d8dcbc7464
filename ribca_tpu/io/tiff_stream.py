"""Streaming banded TIFF reader (ctypes over the system libtiff).

The tiled device pipeline (engine/tiled.py) removes the HBM ceiling on
slide size; this module removes the HOST-RAM ceiling: a whole-slide CHW
TIFF stack is opened once and decoded row-band by row-band straight into
the band buffers the pipeline uploads, so neither memory holds the full
image. The reference (and our PIL path, io/tiff.py) decodes entire pages.

Implementation: minimal ctypes bindings over libtiff's C ABI (TIFFOpen /
TIFFSetDirectory / TIFFReadScanline / TIFFReadTile); no Python imaging
stack in the loop. Both strip-organized pages (scanline reads) and
tile-organized pages (TIFFReadTile into the band buffer) are supported
for single-sample-per-pixel layouts — the standard organizations for
multiplexed CHW stacks. Anything else (RGB pages, odd sample formats)
falls back to the whole-image PIL path at open_image().

The object quacks like the (C, H, W) ndarray the pipelines touch:
``.shape``, ``.dtype``, ``.nbytes`` and ``reader[:, lo:hi]`` row-band
slicing. It intentionally does NOT support full materialization implicitly.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import threading

import numpy as np

# TIFF tag ids (TIFF 6.0 spec)
TAG_IMAGEWIDTH = 256
TAG_IMAGELENGTH = 257
TAG_BITSPERSAMPLE = 258
TAG_COMPRESSION = 259
TAG_STRIPOFFSETS = 273
TAG_SAMPLESPERPIXEL = 277
TAG_ROWSPERSTRIP = 278
TAG_STRIPBYTECOUNTS = 279
TAG_SAMPLEFORMAT = 339
TAG_TILEWIDTH = 322
TAG_TILELENGTH = 323

COMPRESSION_NONE = 1

SAMPLEFORMAT_UINT = 1
SAMPLEFORMAT_INT = 2
SAMPLEFORMAT_IEEEFP = 3

_DTYPES = {
    (SAMPLEFORMAT_UINT, 8): np.uint8,
    (SAMPLEFORMAT_UINT, 16): np.uint16,
    (SAMPLEFORMAT_UINT, 32): np.uint32,
    (SAMPLEFORMAT_INT, 8): np.int8,
    (SAMPLEFORMAT_INT, 16): np.int16,
    (SAMPLEFORMAT_INT, 32): np.int32,
    (SAMPLEFORMAT_IEEEFP, 32): np.float32,
    (SAMPLEFORMAT_IEEEFP, 64): np.float64,
}

_LIB = None
_LIB_LOCK = threading.Lock()


def _libtiff():
    global _LIB
    with _LIB_LOCK:
        if _LIB is None:
            name = ctypes.util.find_library("tiff")
            if name is None:
                raise OSError("libtiff not found")
            lib = ctypes.CDLL(name)
            lib.TIFFOpen.restype = ctypes.c_void_p
            lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lib.TIFFClose.argtypes = [ctypes.c_void_p]
            lib.TIFFSetDirectory.restype = ctypes.c_int
            lib.TIFFSetDirectory.argtypes = [ctypes.c_void_p,
                                             ctypes.c_uint16]
            lib.TIFFNumberOfDirectories.restype = ctypes.c_uint16
            lib.TIFFNumberOfDirectories.argtypes = [ctypes.c_void_p]
            lib.TIFFIsTiled.restype = ctypes.c_int
            lib.TIFFIsTiled.argtypes = [ctypes.c_void_p]
            lib.TIFFReadScanline.restype = ctypes.c_int
            lib.TIFFReadScanline.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
                ctypes.c_uint16,
            ]
            lib.TIFFReadTile.restype = ctypes.c_ssize_t
            lib.TIFFReadTile.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
                ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint16,
            ]
            lib.TIFFNumberOfStrips.restype = ctypes.c_uint32
            lib.TIFFNumberOfStrips.argtypes = [ctypes.c_void_p]
            lib.TIFFReadEncodedStrip.restype = ctypes.c_ssize_t
            lib.TIFFReadEncodedStrip.argtypes = [
                ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p,
                ctypes.c_ssize_t,
            ]
            lib.TIFFIsByteSwapped.restype = ctypes.c_int
            lib.TIFFIsByteSwapped.argtypes = [ctypes.c_void_p]
            # variadic TIFFGetField: declare per-call below
            lib.TIFFGetField.restype = ctypes.c_int
            # silence libtiff warning spam to stderr
            lib.TIFFSetWarningHandler.restype = ctypes.c_void_p
            lib.TIFFSetWarningHandler.argtypes = [ctypes.c_void_p]
            lib.TIFFSetWarningHandler(None)
            _LIB = lib
        return _LIB


def _get_u32(lib, tif, tag, default=None):
    val = ctypes.c_uint32(0)
    ok = lib.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                          ctypes.byref(val))
    if not ok:
        if default is None:
            raise ValueError(f"TIFF tag {tag} missing")
        return default
    return val.value


def _get_u16(lib, tif, tag, default=None):
    val = ctypes.c_uint16(0)
    ok = lib.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                          ctypes.byref(val))
    if not ok:
        if default is None:
            raise ValueError(f"TIFF tag {tag} missing")
        return default
    return val.value


class _BandSlicer:
    def __init__(self, reader):
        self._r = reader

    def __getitem__(self, key):
        chans, rows = key
        if chans != slice(None):
            raise IndexError("only [:, lo:hi] band slicing is supported")
        lo = rows.start or 0
        hi = rows.stop if rows.stop is not None else self._r.shape[1]
        return self._r.read_band(lo, hi)


class TiffBandReader:
    """Row-band access to a multi-page (CHW) TIFF without full decode."""

    def __init__(self, path: str):
        self._lib = _libtiff()
        self._path = path
        self._tif = self._lib.TIFFOpen(path.encode(), b"r")
        if not self._tif:
            raise OSError(f"TIFFOpen failed for {path}")
        lib, tif = self._lib, self._tif
        n_pages = lib.TIFFNumberOfDirectories(ctypes.c_void_p(tif))
        w = _get_u32(lib, tif, TAG_IMAGEWIDTH)
        h = _get_u32(lib, tif, TAG_IMAGELENGTH)
        bits = _get_u16(lib, tif, TAG_BITSPERSAMPLE, 8)
        spp = _get_u16(lib, tif, TAG_SAMPLESPERPIXEL, 1)
        fmt = _get_u16(lib, tif, TAG_SAMPLEFORMAT, SAMPLEFORMAT_UINT)
        if spp != 1:
            raise ValueError("multi-sample pages (use the PIL path)")
        if (fmt, bits) not in _DTYPES:
            raise ValueError(f"unsupported sample format {fmt}/{bits}")
        self.dtype = np.dtype(_DTYPES[(fmt, bits)])
        # channels = the directories matching the first page's geometry;
        # pyramidal QPTIFF/OME files also carry thumbnails and reduced-
        # resolution levels, which the PIL path filters the same way
        # (io/tiff.py:45-49)
        self._dirs: list[int] = []
        self._tiled: dict[int, tuple[int, int]] = {}  # page -> (tw, tl)
        # page -> (strip offsets u64, strip bytecounts u64, rows_per_strip)
        # for uncompressed strip pages: rows are read with raw pread()s
        # instead of one TIFFReadScanline ctypes call per row (measured
        # ~58 us/call; a 3000^2x7 slide = 21k calls = seconds of pure
        # call overhead for what is page-cache I/O).
        self._raw: dict[int, tuple[np.ndarray, np.ndarray, int]] = {}
        self._swapped = bool(lib.TIFFIsByteSwapped(ctypes.c_void_p(tif)))
        for page in range(int(n_pages)):
            if not lib.TIFFSetDirectory(ctypes.c_void_p(tif), page):
                break
            pw = _get_u32(lib, tif, TAG_IMAGEWIDTH, 0)
            ph = _get_u32(lib, tif, TAG_IMAGELENGTH, 0)
            pb = _get_u16(lib, tif, TAG_BITSPERSAMPLE, 8)
            ps = _get_u16(lib, tif, TAG_SAMPLESPERPIXEL, 1)
            if (pw, ph, pb, ps) == (w, h, bits, 1):
                if lib.TIFFIsTiled(ctypes.c_void_p(tif)):
                    tw = _get_u32(lib, tif, TAG_TILEWIDTH, 0)
                    tl = _get_u32(lib, tif, TAG_TILELENGTH, 0)
                    if not (tw and tl):
                        continue
                    self._tiled[page] = (int(tw), int(tl))
                else:
                    plan = self._strip_plan(page, int(h), int(w))
                    if plan is not None:
                        self._raw[page] = plan
                self._dirs.append(page)
        if not self._dirs:
            raise ValueError("no readable full-resolution pages")
        self.shape = (len(self._dirs), int(h), int(w))
        self._fd = os.open(path, os.O_RDONLY) if self._raw else -1
        self._lock = threading.Lock()

    def _strip_plan(self, page, h, w):
        """(offsets, bytecounts, rows_per_strip) when the current page's
        rows can be served by raw pread (uncompressed strips whose byte
        counts match exactly rows*w*itemsize), else None."""
        lib, tif = self._lib, self._tif
        if _get_u16(lib, tif, TAG_COMPRESSION, COMPRESSION_NONE) \
                != COMPRESSION_NONE:
            return None
        rps = _get_u32(lib, tif, TAG_ROWSPERSTRIP, h)
        rps = min(int(rps), h) or h
        n_strips = int(lib.TIFFNumberOfStrips(ctypes.c_void_p(tif)))
        if n_strips != -(-h // rps):
            return None
        off_p = ctypes.POINTER(ctypes.c_uint64)()
        cnt_p = ctypes.POINTER(ctypes.c_uint64)()
        if not lib.TIFFGetField(ctypes.c_void_p(tif),
                                ctypes.c_uint32(TAG_STRIPOFFSETS),
                                ctypes.byref(off_p)):
            return None
        if not lib.TIFFGetField(ctypes.c_void_p(tif),
                                ctypes.c_uint32(TAG_STRIPBYTECOUNTS),
                                ctypes.byref(cnt_p)):
            return None
        offs = np.ctypeslib.as_array(off_p, (n_strips,)).copy()
        cnts = np.ctypeslib.as_array(cnt_p, (n_strips,)).copy()
        row_bytes = w * self.dtype.itemsize
        strip_rows = np.minimum(rps, h - rps * np.arange(n_strips))
        if not np.array_equal(cnts, strip_rows * row_bytes):
            return None
        return offs, cnts, rps

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.shape)) * self.dtype.itemsize

    def read_band(self, lo: int, hi: int) -> np.ndarray:
        """Decode rows [lo, hi) of every page -> (C, hi-lo, W) ndarray."""
        c, h, w = self.shape
        lo = max(int(lo), 0)
        hi = min(int(hi), h)
        out = np.empty((c, hi - lo, w), self.dtype)
        lib, tif = self._lib, self._tif
        with self._lock:
            for chan, page in enumerate(self._dirs):
                buf = out[chan]
                if page in self._raw:
                    self._read_raw(page, buf, lo, hi)
                    continue
                if not lib.TIFFSetDirectory(ctypes.c_void_p(tif), page):
                    raise OSError(f"TIFFSetDirectory({page}) failed")
                if page in self._tiled:
                    self._read_tiles(page, buf, lo, hi)
                else:
                    self._read_strips(page, buf, lo, hi)
        return out

    def _read_strips(self, page: int, buf: np.ndarray, lo: int, hi: int):
        """Fill ``buf`` (rows [lo, hi) of one strip-organized page) via
        TIFFReadEncodedStrip — unlike per-row TIFFReadScanline this
        supports random access into compressed strips."""
        lib, tif = self._lib, self._tif
        h, w = self.shape[1], self.shape[2]
        rps = min(int(_get_u32(lib, tif, TAG_ROWSPERSTRIP, h)), h) or h
        strip = np.empty((rps, w), self.dtype)
        strip_ptr = strip.ctypes.data_as(ctypes.c_void_p)
        for s0 in range((lo // rps) * rps, hi, rps):
            n = lib.TIFFReadEncodedStrip(
                ctypes.c_void_p(tif), ctypes.c_uint32(s0 // rps),
                strip_ptr, ctypes.c_ssize_t(strip.nbytes),
            )
            if n < 0:
                raise OSError(
                    f"TIFFReadEncodedStrip(page={page}, strip={s0 // rps})"
                    " failed"
                )
            r0, r1 = max(lo, s0), min(hi, s0 + rps, h)
            buf[r0 - lo : r1 - lo] = strip[r0 - s0 : r1 - s0]

    def _read_raw(self, page: int, buf: np.ndarray, lo: int, hi: int):
        """Fill ``buf`` (rows [lo, hi) of one uncompressed strip page) by
        pread()ing the strip bytes directly, merging file-contiguous
        strips into single reads."""
        offs, _cnts, rps = self._raw[page]
        row_bytes = self.shape[2] * self.dtype.itemsize
        flat = buf.reshape(-1).view(np.uint8)
        # per-row file offsets for the requested rows, merged into runs
        rows = np.arange(lo, hi, dtype=np.int64)
        file_off = offs[rows // rps] + (rows % rps) * row_bytes
        breaks = np.nonzero(np.diff(file_off) != row_bytes)[0] + 1
        starts = np.concatenate(([0], breaks))
        ends = np.concatenate((breaks, [len(rows)]))
        for s, e in zip(starts, ends):
            view = memoryview(flat[s * row_bytes : e * row_bytes])
            offset = int(file_off[s])
            while view.nbytes:
                n = os.preadv(self._fd, [view], offset)
                if n <= 0:
                    raise OSError(
                        f"raw strip read failed (page={page}, off={offset})"
                    )
                view = view[n:]
                offset += n
        if self._swapped:
            buf.byteswap(inplace=True)

    def _read_tiles(self, page: int, buf: np.ndarray, lo: int, hi: int):
        """Fill ``buf`` (rows [lo, hi) of one tile-organized page) via
        TIFFReadTile; tiles straddling the band edge are clipped."""
        lib, tif = self._lib, self._tif
        tw, tl = self._tiled[page]
        w = self.shape[2]
        tile = np.empty((tl, tw), self.dtype)
        tile_ptr = tile.ctypes.data_as(ctypes.c_void_p)
        for ty in range((lo // tl) * tl, hi, tl):
            r0, r1 = max(lo, ty), min(hi, ty + tl)
            for tx in range(0, w, tw):
                n = lib.TIFFReadTile(
                    ctypes.c_void_p(tif), tile_ptr,
                    ctypes.c_uint32(tx), ctypes.c_uint32(ty), 0, 0,
                )
                if n < 0:
                    raise OSError(
                        f"TIFFReadTile(page={page}, x={tx}, y={ty}) failed"
                    )
                cols = min(tw, w - tx)
                buf[r0 - lo : r1 - lo, tx : tx + cols] = (
                    tile[r0 - ty : r1 - ty, :cols]
                )

    def __getitem__(self, key):
        return _BandSlicer(self)[key]

    def channel_min(self) -> np.ndarray:
        """Streamed per-channel minimum (for the normalize=False path)."""
        c, h, w = self.shape
        mins = np.full(c, np.inf)
        step = max(1, (64 << 20) // max(w * c * self.dtype.itemsize, 1))
        for lo in range(0, h, step):
            band = self.read_band(lo, min(lo + step, h))
            mins = np.minimum(mins, band.min(axis=(1, 2)))
        return mins.astype(np.float32)

    def close(self):
        if getattr(self, "_tif", None):
            self._lib.TIFFClose(ctypes.c_void_p(self._tif))
            self._tif = None
        if getattr(self, "_fd", -1) >= 0:
            os.close(self._fd)
            self._fd = -1

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def open_image(path: str, host_budget_bytes: int = 8 << 30):
    """ndarray for ordinary images; a TiffBandReader for whole-slide TIFF
    stacks whose decoded size exceeds ``host_budget_bytes`` (falls back to
    the full PIL read when streaming isn't possible)."""
    from ribca_tpu.io.tiff import read_image

    if path.lower().endswith((".tif", ".tiff", ".qptiff")):
        try:
            reader = TiffBandReader(path)
        except (OSError, ValueError):
            return read_image(path)
        if reader.nbytes > host_budget_bytes:
            return reader
        try:
            if len(reader._raw) == reader.shape[0]:
                # every page raw-readable: materialize via pread (page-
                # cache speed) instead of the PIL per-page decode
                return reader.read_band(0, reader.shape[1])
        finally:
            reader.close()
    return read_image(path)
