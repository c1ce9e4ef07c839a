"""Learned defect classification: a compact CNN over blob patches.

The reference reserves a ``models/`` directory and config path
(heimdall/core/config.py:72 "models": "./models") but ships no learned
model — classification is the hand-tuned confidence blend.  This module
completes that surface the TPU-native way: a small flax CNN scoring
defect-candidate patches (cut around blob-table bboxes), trained with a
jit-compiled optax step that shards data-parallel over the inspection
mesh ("data" axis) — the same mesh the inspection step runs on, so
training and inference co-locate.

Checkpointing uses orbax when available (msgpack fallback), filling the
reference's empty checkpoint/resume story (SURVEY.md §5).
"""

import logging
import os
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp

try:
    import flax.linen as nn
    import optax
    _HAS_FLAX = True
except ImportError:  # pragma: no cover
    _HAS_FLAX = False

logger = logging.getLogger("heimdall.models")

PATCH_SIZE = 32


if _HAS_FLAX:

    class DefectClassifierCNN(nn.Module):
        """3-block CNN for 32x32 grayscale blob patches → defect classes.

        Sized for the MXU: channel counts are multiples of 8/128-friendly
        tiles and all convs run in bfloat16 with float32 accumulation.
        """
        n_classes: int = 2          # ok / contamination (extendable)
        width: int = 32

        @nn.compact
        def __call__(self, x, train: bool = False):
            x = x.astype(jnp.bfloat16) / 255.0
            for mult in (1, 2, 4):
                x = nn.Conv(self.width * mult, (3, 3),
                            dtype=jnp.bfloat16)(x)
                x = nn.relu(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = x.reshape((x.shape[0], -1))
            x = nn.Dense(128, dtype=jnp.bfloat16)(x)
            x = nn.relu(x)
            x = nn.Dense(self.n_classes, dtype=jnp.float32)(x)
            return x
else:  # pragma: no cover
    DefectClassifierCNN = None


def extract_blob_patches(frames: np.ndarray, table,
                         patch: int = PATCH_SIZE) -> np.ndarray:
    """Cut per-blob patches around blob-table bboxes (host side).

    frames: [N, H, W] grayscale (or [N, H, W, C] — averaged).
    table: BlobTable from the detector.
    Returns [N*K_valid, patch, patch, 1] uint8.
    """
    frames = np.asarray(frames)
    if frames.ndim == 4:
        frames = frames.mean(axis=-1).astype(np.uint8)
    N, H, W = frames.shape
    valid = np.asarray(table.valid)
    xs, ys = np.asarray(table.x), np.asarray(table.y)
    ws, hs = np.asarray(table.w), np.asarray(table.h)
    patches = []
    for i in range(N):
        for k in np.nonzero(valid[i])[0]:
            cx = xs[i][k] + ws[i][k] // 2
            cy = ys[i][k] + hs[i][k] // 2
            x0 = int(np.clip(cx - patch // 2, 0, W - patch))
            y0 = int(np.clip(cy - patch // 2, 0, H - patch))
            patches.append(frames[i, y0:y0 + patch, x0:x0 + patch])
    if not patches:
        return np.zeros((0, patch, patch, 1), np.uint8)
    return np.stack(patches)[..., None]


class DefectClassifier:
    """Inference wrapper: score patches → per-patch class probabilities."""

    def __init__(self, n_classes: int = 2, seed: int = 0):
        if not _HAS_FLAX:
            raise ImportError("flax is required for DefectClassifier")
        self.model = DefectClassifierCNN(n_classes=n_classes)
        self.params = self.model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, PATCH_SIZE, PATCH_SIZE, 1), jnp.uint8))
        self._apply = jax.jit(
            lambda params, x: jax.nn.softmax(self.model.apply(params, x)))

    def predict(self, patches: np.ndarray) -> np.ndarray:
        if len(patches) == 0:
            return np.zeros((0, self.model.n_classes), np.float32)
        return np.asarray(self._apply(self.params, jnp.asarray(patches)))

    # -- checkpoint/resume -------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        try:
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.join(os.path.abspath(path), "params"),
                       self.params, force=True)
            ckptr.wait_until_finished()
        except Exception:
            from flax import serialization
            with open(os.path.join(path, "params.msgpack"), "wb") as f:
                f.write(serialization.to_bytes(self.params))

    def load(self, path: str) -> None:
        orbax_path = os.path.join(os.path.abspath(path), "params")
        msgpack_path = os.path.join(path, "params.msgpack")
        if os.path.exists(orbax_path):
            import orbax.checkpoint as ocp
            ckptr = ocp.StandardCheckpointer()
            self.params = ckptr.restore(orbax_path, self.params)
        elif os.path.exists(msgpack_path):
            from flax import serialization
            with open(msgpack_path, "rb") as f:
                self.params = serialization.from_bytes(self.params,
                                                       f.read())
        else:
            raise FileNotFoundError(path)


class ClassifierTrainer:
    """Single-host training loop with a jitted optax step."""

    def __init__(self, classifier: DefectClassifier,
                 learning_rate: float = 1e-3):
        self.classifier = classifier
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(classifier.params)

        def loss_fn(params, x, y):
            logits = classifier.model.apply(params, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        @jax.jit
        def step(params, opt_state, x, y):
            loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = step

    def train_step(self, patches: np.ndarray, labels: np.ndarray) -> float:
        params, self.opt_state, loss = self._step(
            self.classifier.params, self.opt_state,
            jnp.asarray(patches), jnp.asarray(labels))
        self.classifier.params = params
        return float(loss)


def make_sharded_train_step(mesh, n_classes: int = 2,
                            learning_rate: float = 1e-3):
    """Build a data-parallel train step sharded over the inspection mesh.

    Batches shard over ("data", "spatial") flattened (pure dp across every
    chip); parameters replicate; gradients all-reduce via jit's implicit
    psum.  Returns fn(patches_u8 [N,32,32,1], labels [N]) -> loss.
    Used by __graft_entry__.dryrun_multichip.
    """
    if not _HAS_FLAX:
        raise ImportError("flax is required")
    from jax.sharding import NamedSharding, PartitionSpec as P

    model = DefectClassifierCNN(n_classes=n_classes)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, PATCH_SIZE, PATCH_SIZE, 1), jnp.uint8))
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(("data", "spatial")))
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)

    def loss_fn(p, x, y):
        logits = model.apply(p, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    @partial(jax.jit, out_shardings=(repl, repl, repl))
    def step(p, o, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, y)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    state = {"params": params, "opt": opt_state}

    def train(patches, labels):
        x = jax.device_put(jnp.asarray(patches), batch_sh)
        y = jax.device_put(jnp.asarray(labels), batch_sh)
        state["params"], state["opt"], loss = step(
            state["params"], state["opt"], x, y)
        return loss

    train.state = state
    return train
