"""Image writer round-trips and HTML report generation."""

import numpy as np
import pytest

from smallvcm_tpu.io import framebuffer as fbio
from smallvcm_tpu.io.html import GREEN, NONE, RED, HtmlWriter


@pytest.fixture
def img():
    g = np.random.default_rng(0)
    return (g.uniform(size=(16, 24, 3)) * 1.5).astype(np.float32)


class TestWriters:
    def test_bmp_roundtrip(self, img, tmp_path):
        p = str(tmp_path / "t.bmp")
        fbio.save_bmp(img, p, gamma=2.2)
        back = fbio.load_bmp(p)
        assert back.shape == img.shape
        # quantized 8-bit round trip after gamma
        expect = np.clip(np.power(np.clip(img, 0, None), 1 / 2.2), 0, 1)
        assert np.abs(back - expect).max() < 1.5 / 255 + 1e-3

    def test_hdr_roundtrip(self, img, tmp_path):
        p = str(tmp_path / "t.hdr")
        fbio.save_hdr(img, p)
        back = fbio.load_hdr(p)
        assert back.shape == img.shape
        # RGBE shares one exponent per pixel: the mantissa step is
        # pixel_max/(mant*256) with mant in [0.5, 1) -> error bounded by
        # pixel_max/128 (truncating encoder, framebuffer.hxx:240-245).
        pixel_max = img.max(axis=2, keepdims=True)
        err = np.abs(back - img)
        assert (err <= pixel_max / 128 + 1e-6).all()

    def test_pfm_bytes(self, img, tmp_path):
        p = str(tmp_path / "t.pfm")
        fbio.save_pfm(img, p)
        raw = open(p, "rb").read()
        assert raw.startswith(b"PF\n24 16\n-1\n")
        data = np.frombuffer(raw[len(b"PF\n24 16\n-1\n"):], np.float32)
        np.testing.assert_array_equal(data, img.ravel())

    def test_ppm_header(self, img, tmp_path):
        p = str(tmp_path / "t.ppm")
        fbio.save_ppm(img, p, gamma=2.2)
        head = open(p).read(20)
        assert head.startswith("P3\n24 16\n255\n")

    def test_save_image_dispatch(self, img, tmp_path):
        for ext in (".bmp", ".hdr", ".pfm", ".ppm"):
            p = str(tmp_path / f"x{ext}")
            fbio.save_image(img, p)
            assert (tmp_path / f"x{ext}").exists()

    def test_total_luminance(self, img):
        lum = float(fbio.total_luminance(img))
        expect = (
            0.212671 * img[..., 0] + 0.715160 * img[..., 1]
            + 0.072169 * img[..., 2]
        ).sum()
        assert abs(lum - expect) < 1e-2


class TestNativeCodec:
    """The C++ codec (native/codec.cpp) must produce the same bytes as the
    numpy writers (the byte-format oracle replicating framebuffer.hxx)."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from smallvcm_tpu.io import native_codec
        if native_codec.load() is None:
            pytest.skip("native codec unavailable (no g++)")

    @pytest.fixture
    def hard_img(self):
        """Values that stress quantization: negatives, zeros, >1, tiny."""
        g = np.random.default_rng(7)
        img = (g.uniform(size=(17, 23, 3)) * 2.0 - 0.2).astype(np.float32)
        img[0, 0] = 0.0
        img[1, 1] = [1e-38, 5e-33, 1e20]
        return img

    def _both(self, img, tmp_path, fmt, **kw):
        import os
        from smallvcm_tpu.io import native_codec
        pn = str(tmp_path / f"n.{fmt}")
        pp = str(tmp_path / f"p.{fmt}")
        ok = getattr(native_codec, f"save_{fmt}")(img, pn, *kw.values())
        assert ok
        os.environ["SMALLVCM_TPU_NO_NATIVE"] = "1"
        try:
            getattr(fbio, f"save_{fmt}")(img, pp, **kw)
        finally:
            del os.environ["SMALLVCM_TPU_NO_NATIVE"]
        return open(pn, "rb").read(), open(pp, "rb").read()

    def test_bmp_bytes_match(self, hard_img, tmp_path):
        a, b = self._both(hard_img, tmp_path, "bmp", gamma=2.2)
        assert a == b

    def test_hdr_bytes_match(self, hard_img, tmp_path):
        a, b = self._both(np.abs(hard_img), tmp_path, "hdr")
        assert a == b

    def test_pfm_bytes_match(self, hard_img, tmp_path):
        a, b = self._both(hard_img, tmp_path, "pfm")
        assert a == b

    def test_ppm_bytes_match(self, hard_img, tmp_path):
        a, b = self._both(np.abs(hard_img), tmp_path, "ppm", gamma=2.2)
        assert a == b


class TestHtmlReport:
    def test_structure(self, tmp_path):
        p = str(tmp_path / "index.html")
        w = HtmlWriter(p)
        w.add_scene("test scene")
        w.add_rendering("vcm", "a.bmp", 1.23, GREEN, "<br/>Iterations: 5")
        w.add_rendering("bpt", "b.bmp", 4.56, RED)
        w.add_rendering("pt", "c.bmp", 7.89, NONE)
        w.add_four_way_split(
            ["a.bmp", "b.bmp", "c.bmp", "d.bmp"],
            ["PPM", "BPM", "BPT", "VCM"], [GREEN, RED, NONE, GREEN], 128,
        )
        w.close()
        html = open(p).read()
        assert "test scene" in html
        assert 'class="good"' in html and 'class="poor"' in html
        assert "cross-compare" in html
        assert html.count("a.bmp") >= 2  # thumbnail + split layer
        assert "(1.23 s)" in html and "Iterations: 5" in html
