"""CCL + blob-statistics parity versus OpenCV primitives."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from heimdall_tpu import ops
from heimdall_tpu.ops import blobs as blobs_mod


def _shapes_mask(h=200, w=240):
    img = np.zeros((h, w), np.uint8)
    cv2.circle(img, (60, 60), 12, 255, -1)
    cv2.circle(img, (140, 100), 5, 255, -1)
    cv2.ellipse(img, (100, 160), (20, 8), 30, 0, 360, 255, -1)
    cv2.rectangle(img, (20, 120), (35, 150), 255, -1)
    cv2.circle(img, (200, 40), 2, 255, -1)
    return img


class TestCCL:
    def test_component_count(self, rng):
        img = _shapes_mask()
        labels = np.asarray(ops.connected_components(jnp.asarray(img > 0)))
        n_cv, _ = cv2.connectedComponents((img > 0).astype(np.uint8), connectivity=8)
        uniq = np.unique(labels[labels < img.size])
        assert len(uniq) == n_cv - 1  # cv2 counts background

    def test_labels_match_cv2_partition(self):
        img = _shapes_mask()
        labels = np.asarray(ops.connected_components(jnp.asarray(img > 0)))
        _, cvlab = cv2.connectedComponents((img > 0).astype(np.uint8), connectivity=8)
        # same partition: bijection between label sets on foreground
        fg = img > 0
        pairs = set(zip(labels[fg].tolist(), cvlab[fg].tolist()))
        assert len(pairs) == len({a for a, _ in pairs})
        assert len(pairs) == len({b for _, b in pairs})

    def test_random_noise_components(self, rng):
        mask = rng.rand(80, 80) > 0.7
        labels = np.asarray(ops.connected_components(jnp.asarray(mask)))
        n_cv, cvlab = cv2.connectedComponents(mask.astype(np.uint8), connectivity=8)
        uniq = np.unique(labels[mask])
        assert len(uniq) == n_cv - 1
        pairs = set(zip(labels[mask].tolist(), cvlab[mask].tolist()))
        assert len(pairs) == n_cv - 1

    def test_connectivity4(self, rng):
        mask = rng.rand(60, 60) > 0.6
        labels = np.asarray(
            ops.connected_components(jnp.asarray(mask), connectivity=4))
        n_cv, cvlab = cv2.connectedComponents(mask.astype(np.uint8), connectivity=4)
        assert len(np.unique(labels[mask])) == n_cv - 1

    def test_batched(self, rng):
        masks = rng.rand(3, 60, 60) > 0.7
        labels = np.asarray(ops.connected_components(jnp.asarray(masks)))
        for i in range(3):
            n_cv, _ = cv2.connectedComponents(masks[i].astype(np.uint8), connectivity=8)
            assert len(np.unique(labels[i][masks[i]])) == n_cv - 1


class TestBlobStats:
    def _table_for(self, img, gray=None, color=None, use_color=False):
        mask = jnp.asarray(img > 0)[None]
        labels = ops.connected_components(mask)
        g = jnp.asarray(gray if gray is not None else img)[None]
        c = jnp.asarray(color)[None] if color is not None else None
        return blobs_mod.blob_stats(labels, mask, g, c, max_blobs=32,
                                    use_color=use_color)

    def test_contour_area_parity(self):
        img = _shapes_mask()
        table = self._table_for(img)
        contours, _ = cv2.findContours(img, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        want = sorted(cv2.contourArea(c) for c in contours)
        got = sorted(np.asarray(table.area)[0][np.asarray(table.valid)[0]])
        np.testing.assert_allclose(got, want, atol=0.51)

    def test_bbox_parity(self):
        img = _shapes_mask()
        table = self._table_for(img)
        contours, _ = cv2.findContours(img, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        want = sorted(cv2.boundingRect(c) for c in contours)
        valid = np.asarray(table.valid)[0]
        got = sorted(zip(np.asarray(table.x)[0][valid].tolist(),
                         np.asarray(table.y)[0][valid].tolist(),
                         np.asarray(table.w)[0][valid].tolist(),
                         np.asarray(table.h)[0][valid].tolist()))
        assert got == want

    def test_centroid_parity(self):
        img = _shapes_mask()
        table = self._table_for(img)
        contours, _ = cv2.findContours(img, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        want = set()
        for c in contours:
            M = cv2.moments(c)
            if M["m00"] > 0:
                want.add((int(M["m10"] / M["m00"]), int(M["m01"] / M["m00"])))
        valid = np.asarray(table.valid)[0]
        got = set(zip(np.asarray(table.cx)[0][valid].tolist(),
                      np.asarray(table.cy)[0][valid].tolist()))
        # pixel centroid vs polygon centroid: within 1 px after truncation
        for gx, gy in got:
            assert any(abs(gx - wx) <= 1 and abs(gy - wy) <= 1
                       for wx, wy in want)

    def test_fg_bg_means(self, rng):
        """Exact fg/bg mean parity with the reference's mask/bbox recipe."""
        img = _shapes_mask()
        gray = rng.randint(0, 256, img.shape, dtype=np.uint8)
        table = self._table_for(img, gray=gray)
        contours, _ = cv2.findContours(img, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        valid = np.asarray(table.valid)[0]
        got = {}
        for k in np.nonzero(valid)[0]:
            key = (int(np.asarray(table.x)[0][k]), int(np.asarray(table.y)[0][k]))
            got[key] = float(np.asarray(table.intensity_diff)[0][k])
        for c in contours:
            x, y, w, h = cv2.boundingRect(c)
            mask = np.zeros_like(gray)
            cv2.drawContours(mask, [c], 0, 255, -1)
            roi = gray[y:y + h, x:x + w]
            roi_mask = mask[y:y + h, x:x + w]
            bg = roi[roi_mask == 0].mean() if np.any(roi_mask == 0) else 127
            fg = roi[roi_mask == 255].mean() if np.any(roi_mask == 255) else 127
            want = abs(bg - fg)
            # filled-contour mask == blob pixels for hole-free blobs → exact
            assert abs(got[(x, y)] - want) < 0.2, (x, y, got[(x, y)], want)
