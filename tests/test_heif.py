"""Native HEIC decode/encode via libheif ctypes bindings.

The reference handles HEIC only by lossy JPEG transcode
(utils/canvas.js:255-267); we decode it natively.
"""

import numpy as np
import pytest

import imagestitching_tpu as ist
from imagestitching_tpu.config import RuntimeConfig
from imagestitching_tpu.imgio import codec, heif

pytestmark = pytest.mark.skipif(not heif.available(),
                                reason="libheif not available")

rng = np.random.default_rng(55)


def smooth_img(w, h):
    x = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    y = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    return np.clip(np.stack(
        [np.broadcast_to(x, (h, w)), np.broadcast_to(y, (h, w)),
         np.broadcast_to((x + y) / 2, (h, w))], -1), 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def heic_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("heic") / "x.heic"
    heif.encode_to_file(str(p), smooth_img(128, 96), quality=90)
    return p


def test_sniff(heic_file):
    data = heic_file.read_bytes()
    assert heif.is_heif(data)
    assert not heif.is_heif(b"\x89PNG\r\n\x1a\n" + b"x" * 20)


def test_probe_and_info(heic_file):
    data = heic_file.read_bytes()
    assert heif.probe(data) == (128, 96)
    info = codec.get_image_info(heic_file)
    assert (info.raw_w, info.raw_h, info.orientation) == (128, 96, 1)
    assert info.format == "heic"


def test_decode_roundtrip_close(heic_file):
    dec, o = codec.decode(heic_file)
    assert o == 1 and dec.shape == (96, 128, 3)
    want = smooth_img(128, 96)
    # lossy HEVC at q90 on a smooth gradient: small error
    assert np.abs(dec.astype(int) - want.astype(int)).mean() < 8


def test_transcode_passthrough(heic_file):
    # with native heif, no transcode generation is created
    assert codec.transcode_if_needed(heic_file) == str(heic_file)


def test_stitch_heic_end_to_end(tmp_path, heic_file):
    from PIL import Image
    png = tmp_path / "y.png"
    Image.fromarray(smooth_img(128, 96)).save(png)
    out = ist.stitch([heic_file, png], gap=2,
                     config=RuntimeConfig(engine="xla"))
    assert out.shape == (96 * 2 + 2, 128, 3)


def test_corrupt_heic_raises(tmp_path):
    bad = tmp_path / "bad.heic"
    bad.write_bytes(b"\x00\x00\x00\x18ftypheic" + b"garbage" * 10)
    with pytest.raises(Exception):
        codec.decode(bad)


def test_bomb_guard_before_decode(monkeypatch):
    # a few-KB HEIC (e.g. a tile grid) can declare huge dimensions; the
    # guard must refuse BEFORE the HEVC decode allocates (same
    # 178,956,970-px Pillow threshold as every decoder in native/codec.cpp
    # — r4s10, heif was the one gap).  libheif validates single-image ispe
    # against the SPS at read time, so a tampered real file cannot reach
    # the guard — drive it through a stub lib that reports bomb dimensions
    # (the grid-image shape libheif DOES accept).
    class _Ok:
        code = 0
        subcode = 0
        message = b""

    class _StubLib:
        def heif_context_alloc(self):
            return 1

        def heif_context_free(self, ctx):
            pass

        def heif_context_read_from_memory_without_copy(self, *a):
            return _Ok()

        def heif_context_get_primary_image_handle(self, ctx, handle):
            return _Ok()

        def heif_image_handle_get_width(self, h):
            return 65535

        def heif_image_handle_get_height(self, h):
            return 65535

        def heif_image_handle_release(self, h):
            pass

        def heif_image_handle_has_alpha_channel(self, h):
            raise AssertionError("guard must fire before decode setup")

        def heif_decode_image(self, *a):
            raise AssertionError("guard must fire before HEVC decode")

    monkeypatch.setattr(heif, "_load", lambda: _StubLib())
    with pytest.raises(ValueError, match="decompression-bomb"):
        heif.decode(b"\x00" * 32)
