"""Cohort-level dispatch packing: tail cells of many images share full
ensemble chunks.

The reference pads its torch mini-batches per image (model.py:397-406);
our XLA dispatches are bucketed to static shapes, so without packing a
cohort of, say, 5k-cell images pays for 8192-cell programs — up to ~40%
of ensemble compute on pad cells (VERDICT r1 "next" #9). The packer keeps
a device-resident staging buffer of 2x the pack size:

* full pieces (valid == bucket == pack) dispatch DIRECTLY — no copy;
* partial pieces append into the buffer with one donated
  dynamic-update-slice (in-place on device, one program per piece
  bucket);
* whenever the buffer holds >= pack valid cells, the front ``pack`` rows
  dispatch as one full ensemble chunk and the buffer rolls down —
  tail cells of image i and heads of image i+1 ride the same program;
* ``finalize()`` flushes the remainder through the existing bucketed
  tail programs, so pad waste is paid once per COHORT, not per image.

Results route back through per-image "sinks" (preallocated numpy prob
matrices inside each ImageRecord): a segment registry maps buffer spans
to (sink, offset) and splits across flush boundaries. Dispatches are
queued ahead of materialization (same double-buffered discipline as
engine/pipeline.py), so host bookkeeping overlaps device compute.
"""

from __future__ import annotations

import dataclasses
import functools
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from ribca_tpu.parallel.mesh import cell_sharding


@functools.lru_cache(maxsize=32)
def _zeros_fn(n: int, c: int, mesh):
    sh = cell_sharding(mesh)
    return jax.jit(
        lambda: jnp.zeros((n, c, 40, 40), jnp.float32), out_shardings=sh
    )


@functools.partial(jax.jit, donate_argnums=0)
def _insert(buf, piece, off):
    return jax.lax.dynamic_update_slice(
        buf, piece.astype(buf.dtype), (off, 0, 0, 0)
    )


@functools.partial(jax.jit, donate_argnums=0, static_argnames=("pack",))
def _shift(buf, pack: int):
    return jnp.roll(buf, -pack, axis=0)


@functools.partial(jax.jit, static_argnames=("size",))
def _prefix(buf, size: int):
    return jax.lax.slice_in_dim(buf, 0, size, axis=0)


@dataclasses.dataclass
class _Segment:
    sink: dict            # {panel: np.ndarray (n_cells, n_cls)}
    rec_off: object       # int: first sink row of a contiguous span;
                          # np.ndarray: explicit sink rows (banded order)
    buf_start: int        # first row in the staging buffer
    length: int

    def rows(self):
        if isinstance(self.rec_off, np.ndarray):
            return self.rec_off
        return slice(self.rec_off, self.rec_off + self.length)

    def split(self, head: int) -> tuple["_Segment", "_Segment"]:
        """(first ``head`` rows, remainder with buf_start reset to 0)."""
        if isinstance(self.rec_off, np.ndarray):
            a = dataclasses.replace(self, rec_off=self.rec_off[:head],
                                    length=head)
            b = dataclasses.replace(self, rec_off=self.rec_off[head:],
                                    buf_start=0, length=self.length - head)
        else:
            a = dataclasses.replace(self, length=head)
            b = dataclasses.replace(self, rec_off=self.rec_off + head,
                                    buf_start=0, length=self.length - head)
        return a, b


class CohortPacker:
    """Packs partial ensemble dispatches across images of one run."""

    def __init__(self, runner, pack_cells: int, n_channels: int,
                 prefetch_depth: int = 2):
        self.runner = runner
        self.pack = int(pack_cells)
        self.c = int(n_channels)
        self.prefetch_depth = prefetch_depth
        self._buf = None      # lazy: many runs never pack anything
        self.fill = 0
        self.segments: list[_Segment] = []
        self._inflight: deque = deque()
        # instrumentation: cells dispatched vs cells actually valid
        self.dispatched_rows = 0
        self.valid_rows = 0

    def make_sink(self, n_cells: int) -> dict:
        """Preallocated per-image output matrices the packer writes into
        (per-panel probs, or the 3-wide vote stats under device voting)."""
        return {
            key: np.empty((n_cells, width), np.float32)
            for key, width in self.runner.output_spec.items()
        }

    # -- submission -----------------------------------------------------------

    def submit(self, patches, n_valid: int, sink: dict,
               rec_off: int) -> None:
        """One extracted piece: ``patches`` is a (bucket, C, 40, 40)
        device array with ``n_valid`` true rows destined for
        ``sink[panel][rec_off : rec_off + n_valid]``."""
        b = int(patches.shape[0])
        if n_valid == 0:
            return
        if n_valid == b == self.pack:
            # full chunk: dispatch directly, no staging copy
            self._dispatch(patches, [_Segment(sink, rec_off, 0, n_valid)])
            return
        self._ensure_capacity(self.fill + b)
        self._buf = _insert(self._buf, patches, self.fill)
        self.segments.append(_Segment(sink, rec_off, self.fill, n_valid))
        self.fill += n_valid
        while self.fill >= self.pack:
            self._flush_front()

    def _ensure_capacity(self, rows: int) -> None:
        """Grow the staging buffer geometrically up to 2x pack: tiny runs
        (a 10-cell test image, a small GUI job) must not allocate — or
        roll — a multi-hundred-MB buffer sized for production cohorts."""
        cap = 0 if self._buf is None else int(self._buf.shape[0])
        if rows <= cap:
            return
        n_dev = self.runner.mesh.size
        new_cap = max(64, n_dev)
        while new_cap < rows:
            new_cap *= 2
        new_cap = min(max(new_cap, 2 * n_dev), 2 * self.pack)
        rem = new_cap % n_dev
        if rem:
            new_cap += n_dev - rem
        new = _zeros_fn(new_cap, self.c, self.runner.mesh)()
        if cap and self.fill:
            # carry the staged prefix into the bigger buffer
            new = _insert(new, _prefix(self._buf, cap), 0)
        self._buf = new

    # -- flushing -------------------------------------------------------------

    def _dispatch(self, patches, segments: list[_Segment]) -> None:
        probs = self.runner.run_chunk(patches)
        self.dispatched_rows += int(patches.shape[0])
        self.valid_rows += sum(s.length for s in segments)
        self._inflight.append((probs, segments))
        self._drain(self.prefetch_depth)

    def _flush_front(self) -> None:
        front = _prefix(self._buf, self.pack)
        resolved, carried = [], []
        for s in self.segments:
            if s.buf_start + s.length <= self.pack:
                resolved.append(s)
            elif s.buf_start >= self.pack:
                carried.append(dataclasses.replace(
                    s, buf_start=s.buf_start - self.pack))
            else:  # straddles the boundary: split
                head, tail = s.split(self.pack - s.buf_start)
                resolved.append(head)
                carried.append(tail)
        self.segments = carried
        self._buf = _shift(self._buf, self.pack)
        self.fill -= self.pack
        self._dispatch(front, resolved)

    def _drain(self, limit: int) -> None:
        while len(self._inflight) > limit:
            probs, segments = self._inflight.popleft()
            host = {p: np.asarray(a) for p, a in probs.items()}
            for s in segments:
                rows = s.rows()
                for panel, arr in host.items():
                    s.sink[panel][rows] = (
                        arr[s.buf_start : s.buf_start + s.length]
                    )

    def finalize(self) -> None:
        """Flush the remainder (bucketed) and materialize every result.
        After this, every sink handed out via make_sink is fully
        written."""
        if self.fill > 0:
            from ribca_tpu.engine.pipeline import chunk_size_for

            size = chunk_size_for(self.fill, self.pack,
                                  self.runner.mesh.size)
            self._dispatch(_prefix(self._buf, size), self.segments)
            self.segments = []
            self.fill = 0
        self._drain(0)

    @property
    def pad_fraction(self) -> float:
        """Fraction of dispatched ensemble rows that were padding."""
        if not self.dispatched_rows:
            return 0.0
        return 1.0 - self.valid_rows / self.dispatched_rows
