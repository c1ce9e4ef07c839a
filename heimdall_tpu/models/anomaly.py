"""Unsupervised anomaly detection: a convolutional autoencoder over frames.

Second model family (the classifier covers supervised blob scoring): learn
the appearance of *good* bottles from the live line, then flag frames whose
reconstruction error is anomalous — catching defect types no rule or label
anticipated.  This is the learned complement of the hand-tuned confidence
blend, trained from exactly the data the inspection line already produces
(frames the detector passed).

TPU mapping: bf16 convs on the MXU, f32 losses; training shards
data-parallel over the inspection mesh like the classifier; the scoring
step is one jitted forward returning per-frame error maps that can feed
the blob-table machinery (threshold → CCL → blob stats) for localization.
"""

import logging
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

try:
    import flax.linen as nn
    import optax
    _HAS_FLAX = True
except ImportError:  # pragma: no cover
    _HAS_FLAX = False

logger = logging.getLogger("heimdall.models.anomaly")

PATCH = 64   # frames are scored in 64x64 tiles


if _HAS_FLAX:

    class ConvAutoencoder(nn.Module):
        """Small conv AE for 64x64 grayscale tiles."""
        width: int = 16

        @nn.compact
        def __call__(self, x):
            x = x.astype(jnp.bfloat16) / 255.0
            for mult in (1, 2, 4):
                x = nn.Conv(self.width * mult, (3, 3), strides=(2, 2),
                            dtype=jnp.bfloat16)(x)
                x = nn.relu(x)
            for mult in (2, 1):
                x = nn.ConvTranspose(self.width * mult, (3, 3),
                                     strides=(2, 2),
                                     dtype=jnp.bfloat16)(x)
                x = nn.relu(x)
            x = nn.ConvTranspose(1, (3, 3), strides=(2, 2),
                                 dtype=jnp.float32)(x)
            return nn.sigmoid(x)
else:  # pragma: no cover
    ConvAutoencoder = None


def _tile_frames(frames: np.ndarray) -> np.ndarray:
    """[N, H, W] uint8 → [N*tiles, PATCH, PATCH, 1] (crop to multiples)."""
    frames = np.asarray(frames)
    if frames.ndim == 4:
        frames = frames.mean(axis=-1).astype(np.uint8)
    n, h, w = frames.shape
    th, tw = h // PATCH, w // PATCH
    cropped = frames[:, :th * PATCH, :tw * PATCH]
    tiles = cropped.reshape(n, th, PATCH, tw, PATCH)
    tiles = tiles.transpose(0, 1, 3, 2, 4).reshape(-1, PATCH, PATCH)
    return tiles[..., None]


class AnomalyDetector:
    """Train on good frames; score frames by reconstruction error."""

    def __init__(self, seed: int = 0, learning_rate: float = 1e-3):
        if not _HAS_FLAX:
            raise ImportError("flax is required for AnomalyDetector")
        self.model = ConvAutoencoder()
        self.params = self.model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, PATCH, PATCH, 1), jnp.uint8))
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(self.params)
        self.threshold: Optional[float] = None

        def loss_fn(params, x):
            recon = self.model.apply(params, x)
            target = x.astype(jnp.float32) / 255.0
            return jnp.mean((recon - target) ** 2)

        @jax.jit
        def train_step(params, opt_state, x):
            loss, grads = jax.value_and_grad(loss_fn)(params, x)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def tile_errors(params, x):
            recon = self.model.apply(params, x)
            target = x.astype(jnp.float32) / 255.0
            return jnp.mean((recon - target) ** 2, axis=(1, 2, 3))

        self._train_step = train_step
        self._tile_errors = tile_errors

    # ------------------------------------------------------------------
    def fit(self, good_frames: np.ndarray, epochs: int = 20,
            batch_size: int = 64, calibration_sigma: float = 4.0) -> float:
        """Train on known-good frames and calibrate the anomaly threshold
        (mean + sigma * std of training-tile errors)."""
        tiles = _tile_frames(good_frames)
        rng = np.random.RandomState(0)
        last_loss = 0.0
        for _ in range(epochs):
            order = rng.permutation(len(tiles))
            for start in range(0, len(tiles), batch_size):
                batch = tiles[order[start:start + batch_size]]
                if len(batch) < 2:
                    continue
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, jnp.asarray(batch))
                last_loss = float(loss)
        errors = np.asarray(self._tile_errors(self.params,
                                              jnp.asarray(tiles)))
        self.threshold = float(errors.mean()
                               + calibration_sigma * errors.std())
        logger.info("anomaly AE trained: loss=%.5f threshold=%.5f",
                    last_loss, self.threshold)
        return last_loss

    def score(self, frames: np.ndarray) -> np.ndarray:
        """Max tile reconstruction error per frame (higher = more anomalous)."""
        frames = np.asarray(frames)
        if frames.ndim == 2:
            frames = frames[None]
        n = len(frames)
        tiles = _tile_frames(frames)
        errors = np.asarray(self._tile_errors(self.params,
                                              jnp.asarray(tiles)))
        return errors.reshape(n, -1).max(axis=1)

    def is_anomalous(self, frames: np.ndarray) -> np.ndarray:
        if self.threshold is None:
            raise RuntimeError("call fit() first")
        return self.score(frames) > self.threshold
