"""Native host library: geometry + corrupt handling (skips if unbuilt)."""

import io

import numpy as np
import pytest

from lhrs_bot_tpu.data import native


@pytest.fixture(scope="module")
def jpegs():
    from PIL import Image

    rng = np.random.default_rng(0)
    bufs = []
    for i in range(3):
        img = Image.fromarray(
            rng.integers(0, 255, (90 + 10 * i, 70, 3)).astype(np.uint8))
        b = io.BytesIO()
        img.save(b, format="JPEG", quality=92)
        bufs.append(b.getvalue())
    return bufs


class TestDecodeResize:
    def test_shapes_and_corrupt_mask(self, jpegs):
        out, ok = native.decode_resize_batch(jpegs + [b"garbage"], size=48)
        assert out.shape == (4, 48, 48, 3)
        assert ok.tolist() == [True, True, True, False]
        assert out[3].max() == 0  # corrupt slot zero-filled
        assert out[0].std() > 0

    @pytest.mark.skipif(not native.available(),
                        reason="native lib not built")
    def test_native_close_to_pil(self, jpegs):
        from PIL import Image

        from lhrs_bot_tpu.data.transforms import clip_preprocess_uint8

        out, ok = native.decode_resize_batch(jpegs, size=48)
        for i, buf in enumerate(jpegs):
            ref = clip_preprocess_uint8(Image.open(io.BytesIO(buf)), 48)
            diff = np.abs(out[i].astype(int) - ref.astype(int))
            # PIL-parity separable bicubic: ≤1 LSB everywhere
            assert diff.max() <= 1, (i, diff.max())

    @pytest.mark.skipif(not native.available(),
                        reason="native lib not built")
    def test_resize_batch_decoded(self):
        rng = np.random.default_rng(1)
        imgs = [rng.integers(0, 255, (64, 50, 3)).astype(np.uint8),
                rng.integers(0, 255, (40, 80, 3)).astype(np.uint8)]
        out = native.resize_batch(imgs, size=32)
        assert out.shape == (2, 32, 32, 3)
        assert out.std() > 0
