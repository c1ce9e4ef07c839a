"""Per-pixel defect segmentation head (flax U-Net) + detector integration.

The reference has no learned models at all (`models/` holds only
.gitkeep); this family extends the framework the TPU-native way: a compact
encoder–decoder CNN predicts a per-pixel defect probability map, and the
existing device-side CCL + blob-table machinery (ops/ccl.py, ops/blobs.py)
turns that map into the same `Defect` records the classical detector
produces — so a learned model drops into every Inspector/Station/PLC path
unchanged.

Training runs on the simulation source's ground truth (the synthetic
defect injector knows exactly which pixels it darkened), or on captured
line data (models/capture.py).  Everything is batched NHWC, bfloat16-safe
matmul-heavy compute for the MXU.
"""

from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

try:
    import flax.linen as nn
    import optax
    HAVE_FLAX = True
except ImportError:  # pragma: no cover - flax is baked into this image
    HAVE_FLAX = False


if HAVE_FLAX:
    class SegmentationUNet(nn.Module):
        """Small U-Net: 2 downsampling stages, skip connections, 1-channel
        logit map at input resolution.  ~90k params — sized for 25+ fps
        lines, not ImageNet."""
        base: int = 16

        @nn.compact
        def __call__(self, x):
            # x: [B, H, W, 1] float32 in [0, 1]
            c1 = nn.relu(nn.Conv(self.base, (3, 3))(x))
            c1 = nn.relu(nn.Conv(self.base, (3, 3))(c1))
            p1 = nn.max_pool(c1, (2, 2), strides=(2, 2))
            c2 = nn.relu(nn.Conv(self.base * 2, (3, 3))(p1))
            c2 = nn.relu(nn.Conv(self.base * 2, (3, 3))(c2))
            p2 = nn.max_pool(c2, (2, 2), strides=(2, 2))
            b = nn.relu(nn.Conv(self.base * 4, (3, 3))(p2))
            u2 = nn.ConvTranspose(self.base * 2, (2, 2), strides=(2, 2))(b)
            u2 = nn.relu(nn.Conv(self.base * 2, (3, 3))(
                jnp.concatenate([u2, c2], axis=-1)))
            u1 = nn.ConvTranspose(self.base, (2, 2), strides=(2, 2))(u2)
            u1 = nn.relu(nn.Conv(self.base, (3, 3))(
                jnp.concatenate([u1, c1], axis=-1)))
            return nn.Conv(1, (1, 1))(u1)          # logits [B, H, W, 1]


def _to_model_input(images: np.ndarray) -> jnp.ndarray:
    """uint8 [N,H,W(,3)] → float32 gray [N,H,W,1] in [0,1]; H/W padded to
    multiples of 4 (two pool stages)."""
    from heimdall_tpu import ops
    x = jnp.asarray(images)
    if x.ndim == 4 and x.shape[-1] == 3:
        x = ops.bgr_to_gray(x)
    x = x.astype(jnp.float32) / 255.0
    H, W = x.shape[-2:]
    ph, pw = (-H) % 4, (-W) % 4
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw)), mode="edge")
    return x[..., None], (H, W)


class DefectSegmenter:
    """Train/predict wrapper around SegmentationUNet."""

    def __init__(self, base: int = 16, seed: int = 0,
                 learning_rate: float = 1e-3):
        if not HAVE_FLAX:
            raise ImportError("flax required for DefectSegmenter")
        self.model = SegmentationUNet(base=base)
        self.params = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 1)))["params"]
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(self.params)

        def loss_fn(params, x, y, w):
            logits = self.model.apply({"params": params}, x)[..., 0]
            bce = optax.sigmoid_binary_cross_entropy(logits, y)
            return (bce * w).sum() / jnp.maximum(w.sum(), 1.0)

        @jax.jit
        def train_step(params, opt_state, x, y, w):
            loss, grads = jax.value_and_grad(loss_fn)(params, x, y, w)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def predict_fn(params, x):
            return jax.nn.sigmoid(
                self.model.apply({"params": params}, x)[..., 0])

        self._train_step = train_step
        self._predict = predict_fn

    # -- training ------------------------------------------------------------
    def train_step(self, images: np.ndarray, masks: np.ndarray,
                   pos_weight: float = 8.0) -> float:
        """One optimizer step.  masks: bool/0-1 [N, H, W] ground truth.
        Defect pixels are rare, so positives are up-weighted."""
        x, (H, W) = _to_model_input(images)
        y = jnp.asarray(masks, jnp.float32)
        ph, pw = x.shape[1] - H, x.shape[2] - W
        if ph or pw:
            y = jnp.pad(y, ((0, 0), (0, ph), (0, pw)))
        w = jnp.where(y > 0, pos_weight, 1.0)
        if ph or pw:  # padded rows carry no gradient
            valid = jnp.zeros(x.shape[1:3], jnp.float32
                              ).at[:H, :W].set(1.0)
            w = w * valid[None]
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, x, y, w)
        return float(loss)

    # -- inference -----------------------------------------------------------
    def predict(self, images: np.ndarray) -> np.ndarray:
        """Per-pixel defect probability [N, H, W] float32."""
        x, (H, W) = _to_model_input(images)
        return np.asarray(self._predict(self.params, x))[:, :H, :W]

    # -- persistence (msgpack via flax serialization) -------------------------
    def save(self, path: str) -> None:
        from flax import serialization
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(self.params))

    def load(self, path: str) -> None:
        from flax import serialization
        with open(path, "rb") as f:
            self.params = serialization.from_bytes(self.params, f.read())


class SegmentationDetector:
    """DefectDetector-compatible adapter: model mask → CCL → blob table →
    Defect records (same contract as ContaminationDetector.detect)."""

    def __init__(self, segmenter: DefectSegmenter,
                 name: str = "segmentation_detector",
                 config: Dict[str, Any] = None):
        from heimdall_tpu.detectors.base import DefectDetector  # noqa: F401
        self.segmenter = segmenter
        self.name = name
        self.config = config or {}
        self.threshold = float(self.config.get("threshold", 0.5))
        self.min_size = float(self.config.get("min_contaminant_size", 3))
        self.max_size = float(self.config.get("max_contaminant_size", 3000))
        self.max_blobs = int(self.config.get("max_blobs", 64))

    def detect(self, image: np.ndarray,
               context: Dict[str, Any] = None) -> List[Any]:
        return self.detect_batch(np.asarray(image)[None], context)[0]

    def detect_batch(self, images: np.ndarray,
                     context: Dict[str, Any] = None) -> List[List[Any]]:
        from heimdall_tpu import ops
        from heimdall_tpu.ops import blobs as blobs_mod
        from heimdall_tpu.detectors.base import Defect

        images = np.asarray(images)
        prob = self.segmenter.predict(images)
        mask = jnp.asarray(prob >= self.threshold)
        gray = ops.bgr_to_gray(jnp.asarray(images))
        labels = ops.connected_components(mask, connectivity=8, sweeps=6)
        table = blobs_mod.blob_stats(labels, mask, gray, None,
                                     max_blobs=self.max_blobs,
                                     use_color=False)
        table = jax.device_get(table)
        out: List[List[Any]] = []
        for i in range(images.shape[0]):
            defects = []
            for k in np.nonzero(np.asarray(table.valid[i]))[0]:
                area = float(table.area[i][k])
                if not (self.min_size <= area <= self.max_size):
                    continue
                # confidence = mean predicted probability over the blob bbox
                x0, y0 = int(table.x[i][k]), int(table.y[i][k])
                w, h = int(table.w[i][k]), int(table.h[i][k])
                conf = float(prob[i, y0:y0 + h, x0:x0 + w].mean())
                defects.append(Defect(
                    defect_type="segmented_defect",
                    position=(int(table.cx[i][k]), int(table.cy[i][k])),
                    size=area, confidence=conf,
                    metadata={"bounding_box": (x0, y0, w, h),
                              "model": "unet"}))
            out.append(defects)
        return out
