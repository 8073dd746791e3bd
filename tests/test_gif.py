"""GIF codec: uncompressed-LZW encoder roundtrip, real-LZW decode
(stream produced by javax.imageio's GIF writer), interop, robustness."""

import os
import struct
import subprocess

import numpy as np
import pytest

from rp_extract_spark.codecs import decode_image
from rp_extract_spark.codecs.gif import decode_gif, encode_gif

rng = np.random.default_rng(4)
JAVA_HOME = os.environ.get("JAVA_HOME", "")
_HAS_JDK = bool(JAVA_HOME) and os.path.exists(f"{JAVA_HOME}/bin/javac")


def test_roundtrip_exact():
    g = rng.integers(0, 256, (23, 37), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif(g)), g)
    assert np.array_equal(decode_image(encode_gif(g), "gif"), g)


def test_header_and_trailer():
    data = encode_gif(np.zeros((4, 4), dtype=np.uint8))
    assert data[:6] == b"GIF89a" and data[-1:] == b"\x3b"


def test_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    data = encode_gif(rng.integers(0, 256, (16, 16), dtype=np.uint8))
    for cut in (8, 20, len(data) // 2):
        with pytest.raises(ValueError):
            decode_gif(data[:cut])


@pytest.mark.skipif(not _HAS_JDK, reason="JDK not available")
def test_decodes_real_lzw_stream(tmp_path):
    """javax.imageio's GIF writer emits real variable-width LZW with
    dictionary growth — our decoder must reproduce the pixels exactly."""
    y, x = np.mgrid[0:40, 0:56]
    g = ((x // 8 * 32 + y // 8 * 16) % 256).astype(np.uint8)
    raw = tmp_path / "in.raw"
    raw.write_bytes(g.tobytes())
    src = tmp_path / "EncG.java"
    src.write_text(
        """
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.io.*;
public class EncG {
  public static void main(String[] a) throws Exception {
    int h = Integer.parseInt(a[1]), w = Integer.parseInt(a[2]);
    DataInputStream in = new DataInputStream(
        new BufferedInputStream(new FileInputStream(a[0])));
    BufferedImage im = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
    var r = im.getRaster();
    for (int y=0;y<h;y++) for (int x=0;x<w;x++)
      r.setSample(x,y,0,in.readUnsignedByte());
    in.close();
    ImageIO.write(im, "gif", new File(a[3]));
  }
}
"""
    )
    subprocess.run([f"{JAVA_HOME}/bin/javac", str(src)], check=True,
                   cwd=tmp_path, capture_output=True)
    gif = tmp_path / "out.gif"
    subprocess.run(
        [f"{JAVA_HOME}/bin/java", "EncG", str(raw), "40", "56", str(gif)],
        check=True, cwd=tmp_path, capture_output=True,
    )
    out = decode_gif(gif.read_bytes())
    if out.ndim == 3:
        out = out.mean(axis=2).round().astype(np.uint8)
    assert np.array_equal(out, g)


@pytest.mark.skipif(not _HAS_JDK, reason="JDK not available")
def test_imageio_decodes_our_gif(tmp_path):
    g = rng.integers(0, 256, (24, 31), dtype=np.uint8)
    gif = tmp_path / "ours.gif"
    gif.write_bytes(encode_gif(g))
    src = tmp_path / "DecG.java"
    src.write_text(
        """
import javax.imageio.ImageIO;
import java.awt.image.BufferedImage;
import java.io.*;
public class DecG {
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
    subprocess.run([f"{JAVA_HOME}/bin/java", "DecG", str(gif), str(out)],
                   check=True, cwd=tmp_path, capture_output=True)
    rawb = out.read_bytes()
    h, w = struct.unpack(">ii", rawb[:8])
    java_px = np.frombuffer(rawb[8:], dtype=np.uint8).reshape(h, w)
    assert np.array_equal(java_px, g)
