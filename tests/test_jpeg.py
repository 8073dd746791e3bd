"""Baseline JPEG codec (codecs/jpeg.py): real entropy coding, spec
interop (decoded by javax.imageio, the JDK's libjpeg-derived decoder),
PSNR gates, and dispatch through decode_image."""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from rp_extract_spark.codecs import decode_image, psnr
from rp_extract_spark.codecs.jpeg import decode_jpeg, encode_jpeg, quant_table

rng = np.random.default_rng(7)


def _test_image(h=96, w=128):
    x = np.linspace(0, 4 * np.pi, w)
    y = np.linspace(0, 3 * np.pi, h)
    img = (np.sin(y)[:, None] * np.cos(x)[None, :] * 0.5 + 0.5) * 200
    return (img + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.uint8)


def test_roundtrip_psnr_gate():
    img = _test_image()
    dec = decode_jpeg(encode_jpeg(img, 97))
    assert dec.shape == img.shape
    assert psnr(img, dec) >= 40.0  # BASELINE.json input_hint gate


def test_quality_monotonic():
    img = _test_image()
    p = [psnr(img, decode_jpeg(encode_jpeg(img, q))) for q in (50, 75, 90, 98)]
    assert p == sorted(p)
    sizes = [len(encode_jpeg(img, q)) for q in (50, 75, 90, 98)]
    assert sizes == sorted(sizes)


def test_worst_case_noise_psnr():
    noise = rng.integers(0, 256, (64, 80), dtype=np.uint8)
    assert psnr(noise, decode_jpeg(encode_jpeg(noise, 97))) >= 40.0


def test_non_multiple_of_8_dims():
    img = rng.integers(0, 256, (33, 41), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, 95))
    assert dec.shape == (33, 41)


def test_flat_image_exact_dc():
    flat = np.full((24, 16), 128, dtype=np.uint8)
    assert psnr(flat, decode_jpeg(encode_jpeg(flat, 50))) == float("inf")


def test_structure_is_jfif():
    data = encode_jpeg(_test_image(16, 16), 90)
    assert data[:4] == b"\xff\xd8\xff\xe0"  # SOI + APP0
    assert data[6:11] == b"JFIF\x00"
    assert data[-2:] == b"\xff\xd9"  # EOI


def test_dispatch_magic_bytes():
    img = _test_image(48, 64)
    dec = decode_image(encode_jpeg(img, 97), "jpeg")
    assert psnr(img, dec) >= 40.0


def test_quant_table_quality_extremes():
    assert (quant_table(100) == 1).all()
    assert (quant_table(1) >= quant_table(50)).all()
    assert quant_table(1).max() <= 255


def test_truncated_stream_raises():
    data = encode_jpeg(_test_image(16, 16), 90)
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 2])


JAVA_HOME = os.environ.get("JAVA_HOME", "")


@pytest.mark.skipif(
    not (JAVA_HOME and os.path.exists(f"{JAVA_HOME}/bin/javac")),
    reason="JDK not available",
)
def test_interop_javax_imageio(tmp_path):
    """Independent-decoder interop: the JDK's ImageIO (libjpeg-derived)
    must decode our stream to within ±1 of our own decoder (IDCT
    rounding differences only)."""
    img = _test_image()
    jpg = tmp_path / "t.jpg"
    jpg.write_bytes(encode_jpeg(img, 95))
    src = tmp_path / "Dec.java"
    src.write_text(
        """
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.io.*;
public class Dec {
  public static void main(String[] a) throws Exception {
    BufferedImage im = ImageIO.read(new File(a[0]));
    int w = im.getWidth(), h = im.getHeight();
    DataOutputStream o = new DataOutputStream(
        new BufferedOutputStream(new FileOutputStream(a[1])));
    o.writeInt(h); o.writeInt(w);
    var r = im.getRaster();
    for (int y=0;y<h;y++) for (int x=0;x<w;x++) o.writeByte(r.getSample(x,y,0));
    o.close();
  }
}
"""
    )
    subprocess.run([f"{JAVA_HOME}/bin/javac", str(src)], check=True,
                   cwd=tmp_path, capture_output=True)
    out = tmp_path / "px.bin"
    subprocess.run(
        [f"{JAVA_HOME}/bin/java", "Dec", str(jpg), str(out)],
        check=True, cwd=tmp_path, capture_output=True,
    )
    raw = out.read_bytes()
    h, w = struct.unpack(">ii", raw[:8])
    java_px = np.frombuffer(raw[8:], dtype=np.uint8).reshape(h, w)
    ours = decode_jpeg(jpg.read_bytes())
    assert java_px.shape == ours.shape
    assert np.abs(java_px.astype(int) - ours.astype(int)).max() <= 1


@pytest.mark.skipif(
    not (JAVA_HOME and os.path.exists(f"{JAVA_HOME}/bin/javac")),
    reason="JDK not available",
)
def test_bmp_interop_javax_imageio(tmp_path):
    """BMP interop: ImageIO must decode our 8-bit paletted BMP to the
    exact pixel values."""
    from rp_extract_spark.codecs.bmp import encode_bmp

    img = rng.integers(0, 256, (24, 31), dtype=np.uint8)
    bmp = tmp_path / "t.bmp"
    bmp.write_bytes(encode_bmp(img))
    src = tmp_path / "DecB.java"
    src.write_text(
        """
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.io.*;
public class DecB {
  public static void main(String[] a) throws Exception {
    BufferedImage im = ImageIO.read(new File(a[0]));
    int w = im.getWidth(), h = im.getHeight();
    DataOutputStream o = new DataOutputStream(
        new BufferedOutputStream(new FileOutputStream(a[1])));
    o.writeInt(h); o.writeInt(w);
    var r = im.getRaster();
    for (int y=0;y<h;y++) for (int x=0;x<w;x++) o.writeByte(r.getSample(x,y,0));
    o.close();
  }
}
"""
    )
    subprocess.run([f"{JAVA_HOME}/bin/javac", str(src)], check=True,
                   cwd=tmp_path, capture_output=True)
    out = tmp_path / "px.bin"
    subprocess.run([f"{JAVA_HOME}/bin/java", "DecB", str(bmp), str(out)],
                   check=True, cwd=tmp_path, capture_output=True)
    raw = out.read_bytes()
    h, w = struct.unpack(">ii", raw[:8])
    java_px = np.frombuffer(raw[8:], dtype=np.uint8).reshape(h, w)
    assert np.array_equal(java_px, img)
