"""Fine-tuning trainer for the panel classifiers.

The reference ships inference-only checkpoints (no training code, SURVEY
§5 "Checkpoint/resume"); adapting RIBCA to a new cohort means fine-tuning
the panel ViTs on labeled 40x40 cell patches. This module provides that as
a first-class, TPU-native capability:

* one jitted AdamW train step (optax), cross-entropy over the panel's
  classes, optional label smoothing;
* data parallelism over the batch axis of the same 1-D cells mesh used
  for inference (parallel/mesh.py): batch sharded, params/opt-state
  replicated, gradient psum inserted by XLA;
* static batch shapes (pad the last batch) so the step compiles once;
* checkpoints through the neutral .npz store (models/store.py), loadable
  straight into the inference registry.

The driver's multi-chip dry run (``__graft_entry__.dryrun_multichip``)
executes this exact step on a virtual mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from ribca_tpu.models import store
from ribca_tpu.models.vit import build_panel_model, init_params_np
from ribca_tpu.parallel.mesh import (
    cell_sharding,
    get_mesh,
    replicated_sharding,
)


# fit(device_data="auto") keeps datasets up to this size resident in HBM
DEVICE_FIT_BYTES = 1 << 30


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.05
    batch_size: int = 256
    label_smoothing: float = 0.0
    grad_clip_norm: Optional[float] = 1.0
    dtype: str = "bfloat16"
    seed: int = 0


class Trainer:
    """Fine-tunes one panel classifier under cell-axis data parallelism."""

    def __init__(
        self,
        panel: str,
        config: TrainConfig | None = None,
        mesh: Mesh | None = None,
        init_from: Optional[dict] = None,
    ):
        self.panel = panel
        self.config = config or TrainConfig()
        self.mesh = mesh if mesh is not None else get_mesh()
        dtype = (
            jnp.bfloat16 if self.config.dtype in ("bfloat16", "bf16")
            else jnp.float32
        )
        self.model = build_panel_model(panel, dtype=dtype)

        params = (
            init_from if init_from is not None
            else init_params_np(self.model, seed=self.config.seed)
        )
        tx = [optax.adamw(
            self.config.learning_rate,
            weight_decay=self.config.weight_decay,
        )]
        if self.config.grad_clip_norm:
            tx.insert(0, optax.clip_by_global_norm(self.config.grad_clip_norm))
        self.tx = optax.chain(*tx)

        rep = replicated_sharding(self.mesh)
        self._rep = rep
        self.params = jax.device_put(params, rep)
        self.opt_state = jax.device_put(self.tx.init(self.params), rep)
        self._data_sh = cell_sharding(self.mesh)
        self._step = self._build_step(rep)
        self._step_idx = None  # device-resident-data variant, built lazily

    def _build_step(self, rep):
        model, tx = self.model, self.tx
        smoothing = self.config.label_smoothing
        n_classes = model.num_classes

        def loss_fn(params, x, y, w):
            logits = model.apply({"params": params}, x)
            if smoothing:
                targets = optax.smooth_labels(
                    jax.nn.one_hot(y, n_classes), smoothing
                )
                losses = optax.softmax_cross_entropy(logits, targets)
            else:
                losses = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y
                )
            # w masks padded examples in the (static-shape) final batch
            loss = (losses * w).sum() / jnp.maximum(w.sum(), 1.0)
            acc = ((jnp.argmax(logits, -1) == y) * w).sum() / jnp.maximum(
                w.sum(), 1.0
            )
            return loss, acc

        def step(params, opt_state, x, y, w):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, x, y, w
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, acc

        self._loss_fn = loss_fn
        data = self._data_sh
        return jax.jit(
            step,
            in_shardings=(rep, rep, data, data, data),
            out_shardings=(rep, rep, rep, rep),
        )

    def _build_step_idx(self, rep):
        """The same train step over a device-resident dataset: inputs are
        (x_all, y_all, idx, w) and the batch gathers on device (the index
        vector is sharded over the cell axis, so DP still splits the
        gather+forward across the mesh)."""
        tx, loss_fn = self.tx, self._loss_fn

        def step(params, opt_state, x_all, y_all, idx, w):
            x = jnp.take(x_all, idx, axis=0)
            y = jnp.take(y_all, idx, axis=0)
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, x, y, w
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, acc

        data = self._data_sh
        return jax.jit(
            step,
            in_shardings=(rep, rep, rep, rep, data, data),
            out_shardings=(rep, rep, rep, rep),
        )

    # -- data ----------------------------------------------------------------

    def _pad_batch(self, x, y):
        bs = self.config.batch_size
        n = len(x)
        w = np.zeros(bs, np.float32)
        w[:n] = 1.0
        if n < bs:
            x = np.concatenate(
                [x, np.zeros((bs - n, *x.shape[1:]), x.dtype)]
            )
            y = np.concatenate([y, np.zeros(bs - n, y.dtype)])
        return x, y, w

    def batches(self, x, y, rng, indices: bool = False) -> Iterator[tuple]:
        """Shuffled padded batches; with ``indices`` yields
        (index_vector, None, weights) instead of materialized arrays —
        same permutation stream, so both modes see identical batches."""
        idx = rng.permutation(len(x))
        bs = self.config.batch_size
        for start in range(0, len(x), bs):
            sel = idx[start:start + bs]
            if indices:
                n = len(sel)
                w = np.zeros(bs, np.float32)
                w[:n] = 1.0
                padded = np.zeros(bs, np.int64)
                padded[:n] = sel
                yield padded, None, w
            else:
                yield self._pad_batch(x[sel], y[sel])

    # -- public API -----------------------------------------------------------

    def train_step(self, x, y, w=None):
        """One step on a (batch_size, C, 40, 40) batch; returns (loss, acc)."""
        if w is None:
            w = np.ones(len(x), np.float32)
        sh = self._data_sh
        x = jax.device_put(np.asarray(x, np.float32), sh)
        y = jax.device_put(np.asarray(y, np.int32), sh)
        w = jax.device_put(np.asarray(w, np.float32), sh)
        self.params, self.opt_state, loss, acc = self._step(
            self.params, self.opt_state, x, y, w
        )
        return float(loss), float(acc)

    def fit(self, x, y, epochs: int = 1, log_every: int = 0, logger=None,
            device_data: bool | str = "auto"):
        """Fine-tune on (N, C, 40, 40) patches with int labels; returns the
        per-epoch (loss, acc) history.

        ``device_data`` keeps the whole dataset resident in HBM and
        gathers each batch on device, so a step uploads only its index
        vector instead of the patch tensor — the per-step transfer drops
        from ~12 MB to ~1 KB, which dominates wall time on serialized
        host<->device links (tunneled chips). "auto" = on when the set
        fits ``DEVICE_FIT_BYTES``; results are identical to the host
        path (same batch order, same padding)."""
        x = np.asarray(x, np.float32)
        y = np.asarray(y, np.int64)
        if device_data == "auto":
            device_data = x.nbytes <= DEVICE_FIT_BYTES
        rng = np.random.default_rng(self.config.seed)
        step_fn = (
            self._device_data_stepper(x, y) if device_data and len(x)
            else None
        )
        history = []
        step = 0
        for _ in range(epochs):
            losses, accs = [], []
            for bx, by, bw in self.batches(x, y, rng, indices=bool(step_fn)):
                if step_fn is not None:
                    loss, acc = step_fn(bx, bw)
                else:
                    loss, acc = self.train_step(bx, by, bw)
                losses.append(loss)
                accs.append(acc)
                step += 1
                if log_every and logger and step % log_every == 0:
                    logger.log(
                        f"step {step}: loss {loss:.4f} acc {acc:.3f}"
                    )
            history.append((float(np.mean(losses)), float(np.mean(accs))))
        return history

    def _device_data_stepper(self, x, y):
        """Upload (x, y) once; return step(idx, w) closing over them."""
        rep = self._rep
        x_all = jax.device_put(x, rep)
        y_all = jax.device_put(np.asarray(y, np.int32), rep)
        if self._step_idx is None:
            self._step_idx = self._build_step_idx(rep)
        sh = self._data_sh

        def step(idx, w):
            idx = jax.device_put(np.asarray(idx, np.int32), sh)
            w = jax.device_put(np.asarray(w, np.float32), sh)
            self.params, self.opt_state, loss, acc = self._step_idx(
                self.params, self.opt_state, x_all, y_all, idx, w
            )
            return float(loss), float(acc)

        return step

    def evaluate(self, x, y) -> float:
        """Accuracy over a labeled set (batched, padded)."""
        correct = total = 0
        for bx, by, bw in self.batches(
            np.asarray(x, np.float32), np.asarray(y, np.int64),
            np.random.default_rng(0),
        ):
            logits = self.model.apply(
                {"params": self.params}, jnp.asarray(bx)
            )
            pred = np.asarray(jnp.argmax(logits, -1))
            correct += int(((pred == by) * bw).sum())
            total += int(bw.sum())
        return correct / max(total, 1)

    def save(self, path: str, format: str = "npz") -> str:
        """Write an inference-ready checkpoint (models/registry.py npz
        layout, or an Orbax directory with ``format='orbax'``)."""
        host = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float32), self.params
        )
        return store.save_params(host, path, format=format)
