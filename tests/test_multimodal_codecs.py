"""Multimodal codec escape hatch: the real PIL path when the machine has
codecs (skipped here — this container has none), and the stub contract
when it does not."""

import pytest

from mqtt2sql_spark.plans.multimodal import (
    REAL_CODECS_AVAILABLE,
    decode_image_real,
    fake_decode_meta,
    resize_image_real,
)


@pytest.mark.skipif(not REAL_CODECS_AVAILABLE, reason="PIL not installed")
def test_real_decode_roundtrip():
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (640, 480), (10, 20, 30)).save(buf, format="PNG")
    payload = buf.getvalue()
    meta = decode_image_real(payload)
    assert meta["width"] == 640 and meta["height"] == 480
    assert meta["channels"] == 3 and meta["format"] == "PNG"
    assert meta["n_bytes"] == len(payload)

    out = resize_image_real(payload, box=224)
    with Image.open(io.BytesIO(out)) as im:
        # aspect-preserving integer fit, same arithmetic as the plan
        assert (im.width, im.height) == (224, (480 * 224) // 640)


@pytest.mark.skipif(REAL_CODECS_AVAILABLE, reason="PIL installed")
def test_stub_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        resize_image_real(b"\x89PNG")


def test_fake_decode_is_deterministic():
    a = fake_decode_meta(b"hello world")
    assert a == fake_decode_meta(b"hello world")
    n = len(b"hello world")
    assert a == (n, 64 + n % 512, 64 + (n * 7) % 512, 3, b"h"[0])
