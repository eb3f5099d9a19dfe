"""Round-12 pins: PNG palette (color type 3) decode — the last
non-JPEG codec gap (r11 verdict item 5) — plus the r11 ADVICE
hardening of the chunk walk: bounded inflation (anti-decompression-
bomb), duplicate-IHDR rejection, and consecutive-IDAT enforcement.

The palette fixture shares the SAME closed-form oracle as the PPM and
RGB-PNG fixtures: identical md5-derived gray levels, stored as PLTE
indices under a multiplicative permutation, so the lookup table is
load-bearing in the certified query (hashing raw indices scrambles
the image and flips the value hash).
"""

from __future__ import annotations

import struct
import zlib

import pytest


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(
        ">I", zlib.crc32(ctype + data)
    )


_SIG = b"\x89PNG\r\n\x1a\n"


def _ihdr(w=1, h=1, depth=8, color=0, inter=0) -> bytes:
    return _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, inter))


def _palette_png(w, h, indices, plte, filters=None):
    """Test-side palette-PNG writer independent of the engine encoder:
    explicit per-row filter choices, spec-built chunks."""
    from emdrive_spark.operators.multimodal import _paeth

    filters = filters or [0] * h
    out = bytearray()
    prev = bytes(w)
    for y in range(h):
        row = indices[y * w : (y + 1) * w]
        f = filters[y]
        out.append(f)
        for i in range(w):
            left = row[i - 1] if i >= 1 else 0
            ul = prev[i - 1] if i >= 1 else 0
            pred = (0, left, prev[i], (left + prev[i]) // 2, _paeth(left, prev[i], ul))[f]
            out.append((row[i] - pred) & 255)
        prev = row
    return (
        _SIG
        + _ihdr(w, h, color=3)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


# ================================================ palette decode


def test_palette_lookup_known_values():
    """Indices map through PLTE to arbitrary (non-gray) RGB triples;
    the same index may repeat; entries beyond the used range are
    legal."""
    from emdrive_spark.operators.multimodal import decode_image

    plte = bytes([10, 20, 30, 200, 100, 0, 7, 7, 7])
    w, h, rgb = decode_image(_palette_png(2, 2, bytes([2, 0, 1, 2]), plte))
    assert (w, h) == (2, 2)
    assert rgb == bytes([7, 7, 7, 10, 20, 30, 200, 100, 0, 7, 7, 7])


def test_palette_fixture_parity_with_ppm():
    """The palette fixture must decode to the SAME pixels and hash as
    the PPM fixture — the identity that lets all three container
    fixtures share one closed-form oracle."""
    from emdrive_spark.operators.multimodal import (
        ahash64,
        decode_image,
        encode_png_palette_fixture,
        encode_ppm_fixture,
    )

    for text in ("hello", "", "emdrive ünicøde", "x" * 500):
        for perturb in (False, True):
            ppm = decode_image(encode_ppm_fixture(text, perturb))
            pal = decode_image(encode_png_palette_fixture(text, perturb))
            assert ppm == pal
            assert ahash64(*ppm) == ahash64(*pal)


def test_palette_permutation_is_load_bearing():
    """A decoder that skips the PLTE lookup (treats raster indices as
    gray) must produce a DIFFERENT hash: the multiplicative index
    permutation destroys the global-shift symmetry an additive one
    could leave ahash blind to."""
    from emdrive_spark.operators.multimodal import (
        _png_pack,
        ahash64,
        decode_image,
        encode_png_palette_fixture,
    )
    import hashlib

    text = "permutation probe"
    gray = b"".join(hashlib.md5(f"{text}:{k}".encode()).digest() for k in range(4))
    idx = bytes((g * 37 + 11) % 256 for g in gray)
    identity = bytes(b for i in range(256) for b in (i, i, i))
    skipped = _png_pack(8, 8, 3, idx, palette=identity)  # lookup skipped
    real = encode_png_palette_fixture(text)
    assert ahash64(*decode_image(skipped)) != ahash64(*decode_image(real))


def test_palette_fixture_exercises_all_five_filters():
    """Row y of the palette fixture is filtered with type y % 5, same
    as the other PNG fixtures — all five unfilter paths load-bearing
    in the certified query."""
    from emdrive_spark.operators.multimodal import encode_png_palette_fixture

    payload = encode_png_palette_fixture("filter coverage probe")
    pos = 8
    idat = b""
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        if payload[pos + 4 : pos + 8] == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 8  # one index byte per pixel
    assert [raw[y * (stride + 1)] for y in range(8)] == [0, 1, 2, 3, 4, 0, 1, 2]


def test_palette_roundtrip_property():
    """Hypothesis roundtrip for color type 3: any (dims, palette size,
    indices within range, per-row filters) encodes via the spec-side
    writer and decodes to the palette-expanded RGB."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from emdrive_spark.operators.multimodal import decode_image

    @settings(max_examples=80, deadline=None)
    @given(data=st.data())
    def check(data):
        w = data.draw(st.integers(1, 9))
        h = data.draw(st.integers(1, 9))
        n_entries = data.draw(st.integers(1, 256))
        plte = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=3 * n_entries, max_size=3 * n_entries
                )
            )
        )
        idx = bytes(
            data.draw(
                st.lists(st.integers(0, n_entries - 1), min_size=w * h, max_size=w * h)
            )
        )
        filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
        got = decode_image(_palette_png(w, h, idx, plte, filters))
        want = b"".join(plte[3 * i : 3 * i + 3] for i in idx)
        assert got == (w, h, want)

    check()


# ================================================ error taxonomy (r12)


def test_palette_error_taxonomy():
    """PLTE grammar: mandatory for color 3, at most one, before IDAT,
    length a positive multiple of 3 up to 768, indices in range,
    forbidden for grayscale types — every violation a ValueError,
    never garbage pixels, never a foreign exception."""
    from emdrive_spark.operators.multimodal import decode_image

    raster = zlib.compress(b"\x00\x00")  # 1x1, filter 0, index 0
    plte = _chunk(b"PLTE", b"\x01\x02\x03")
    with pytest.raises(ValueError, match="no PLTE"):
        decode_image(_SIG + _ihdr(color=3) + _chunk(b"IDAT", raster) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="duplicate PLTE"):
        decode_image(
            _SIG + _ihdr(color=3) + plte + plte + _chunk(b"IDAT", raster) + _chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="PLTE chunk after IDAT"):
        decode_image(
            _SIG + _ihdr(color=3) + _chunk(b"IDAT", raster) + plte + _chunk(b"IEND", b"")
        )
    for color in (0, 4):
        bpp = 1 if color == 0 else 2
        r = zlib.compress(b"\x00" + b"\x00" * bpp)
        with pytest.raises(ValueError, match="forbidden for grayscale"):
            decode_image(
                _SIG + _ihdr(color=color) + plte + _chunk(b"IDAT", r) + _chunk(b"IEND", b"")
            )
    for bad in (b"", b"\x01\x02", b"\x01" * 769):
        with pytest.raises(ValueError, match="PLTE"):
            decode_image(
                _SIG
                + _ihdr(color=3)
                + _chunk(b"PLTE", bad)
                + _chunk(b"IDAT", raster)
                + _chunk(b"IEND", b"")
            )
    with pytest.raises(ValueError, match="out of range"):
        decode_image(
            _SIG
            + _ihdr(color=3)
            + plte
            + _chunk(b"IDAT", zlib.compress(b"\x00\x05"))
            + _chunk(b"IEND", b"")
        )
    # PLTE is LEGAL (a suggested-quantization palette, ignored) for
    # truecolor types 2 and 6
    from emdrive_spark.operators.multimodal import decode_image as d

    rgb_raster = zlib.compress(b"\x00\x09\x08\x07")
    assert d(_SIG + _ihdr(color=2) + plte + _chunk(b"IDAT", rgb_raster) + _chunk(b"IEND", b"")) == (
        1,
        1,
        bytes([9, 8, 7]),
    )


def test_chunk_order_taxonomy():
    """r11 ADVICE item 4: a second IHDR and a resumed IDAT run are
    malformed streams, not silently-tolerated ancillary data."""
    from emdrive_spark.operators.multimodal import decode_image

    raster = zlib.compress(b"\x00\x00")
    with pytest.raises(ValueError, match="duplicate IHDR"):
        decode_image(_SIG + _ihdr() + _ihdr() + _chunk(b"IDAT", raster) + _chunk(b"IEND", b""))
    half = zlib.compress(b"\x00\x00\x00")
    with pytest.raises(ValueError, match="non-consecutive IDAT"):
        decode_image(
            _SIG
            + _ihdr(w=2)
            + _chunk(b"IDAT", half[:4])
            + _chunk(b"tEXt", b"interrupting")
            + _chunk(b"IDAT", half[4:])
            + _chunk(b"IEND", b"")
        )
    # split IDAT runs WITHOUT an interrupting chunk stay legal
    assert decode_image(
        _SIG
        + _ihdr(w=2)
        + _chunk(b"IDAT", half[:4])
        + _chunk(b"IDAT", half[4:])
        + _chunk(b"IEND", b"")
    ) == (2, 1, bytes(6))


def test_inflate_bounded_by_declared_raster():
    """r11 ADVICE item 3 (decompression bomb): a 1x1 header with an
    IDAT that inflates to 10 MB must be rejected by the max_length
    bound — quickly, and without materializing the 10 MB buffer."""
    import time

    from emdrive_spark.operators.multimodal import decode_image

    bomb = (
        _SIG
        + _ihdr()
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000))
        + _chunk(b"IEND", b"")
    )
    t0 = time.perf_counter()
    with pytest.raises(ValueError, match="exceeds the declared"):
        decode_image(bomb)
    assert time.perf_counter() - t0 < 2.0
    # an exact-size stream still decodes (no false positive at the
    # boundary, where max_length == produced bytes and the trailer may
    # sit in unconsumed_tail)
    from emdrive_spark.operators.multimodal import decode_image as d

    assert d(_SIG + _ihdr() + _chunk(b"IDAT", zlib.compress(b"\x00\x42")) + _chunk(b"IEND", b"")) == (
        1,
        1,
        bytes([0x42, 0x42, 0x42]),
    )


# ================================================ certified op


def test_mm_decode_phash_palette_known_answer(spark):
    """Same structure pins as the PPM/PNG ops: base+copy rows keep
    their exact twin, corpus triples the base, dims prove the header
    really was parsed — now through the PLTE lookup path."""
    from emdrive_spark import registry
    from emdrive_spark.operators.multimodal import _DP_SHIFT

    rows = (
        registry.queries()["mm_decode_phash_palette"](spark, "/root/testdata/sf0.001")
        .collect()
    )
    n_base = sum(1 for r in rows if r.doc_id < _DP_SHIFT)
    assert len(rows) == 3 * n_base > 0
    assert all((r.width, r.height) == (8, 8) for r in rows)
    for r in rows:
        if r.doc_id < 2 * _DP_SHIFT:
            assert r.dup_cnt >= 1, f"doc {r.doc_id} lost its exact twin"


def test_palette_op_shares_oracle():
    """All three container front-ends (PPM, RGB PNG, palette PNG) must
    carry the IDENTICAL oracle string — the parity that value-checks
    each decode stack against the text-derived closed form."""
    from emdrive_spark import registry

    registry.load_all()
    assert (
        registry.REGISTRY["mm_decode_phash"].oracle
        == registry.REGISTRY["mm_decode_phash_palette"].oracle
        == registry.REGISTRY["mm_decode_phash_png"].oracle
    )


# ================================================ bench gates (r12)


def _load_tool(name, path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cpu_reliable_semantics():
    """cpu_reliable: artifacts since r12 carry the field directly;
    legacy artifacts fall back to the noisy flag; pre-canary artifacts
    (neither field) read reliable. r11 verdict item 3: a flagged run's
    cpu medians measured 1.2-5x inflated on identical code, so cpu is
    only cross-round evidence between quiet runs."""
    bd = _load_tool("bench_diff", "/root/repo/tools/bench_diff.py")
    assert bd.cpu_reliable({"cpu_reliable": True, "noisy": True}) is True  # field wins
    assert bd.cpu_reliable({"cpu_reliable": False}) is False
    assert bd.cpu_reliable({"noisy": True}) is False
    assert bd.cpu_reliable({"noisy": False}) is True
    assert bd.cpu_reliable({}) is True


def test_bench_diff_refuses_noisy_cpu_comparison(tmp_path):
    """--cpu against a flagged run exits 2 with the refusal message;
    --force proceeds; wall mode proceeds with a caveat. Enforcement
    lives in the tool so a future session cannot accidentally build a
    cross-round cpu claim on a contaminated artifact."""
    import subprocess

    quiet = {"queries": {"a": 1.0, "b": 2.0}, "cpu": {"a": 5.0, "b": 6.0}, "noisy": False, "cpu_reliable": True}
    noisy = {"queries": {"a": 1.1, "b": 2.1}, "cpu": {"a": 9.0, "b": 11.0}, "noisy": True, "cpu_reliable": False}
    q, n = tmp_path / "q.json", tmp_path / "n.json"
    q.write_text(__import__("json").dumps(quiet))
    n.write_text(__import__("json").dumps(noisy))
    tool = "/root/repo/tools/bench_diff.py"
    r = subprocess.run(
        ["python", tool, "--cpu", str(q), str(n)], capture_output=True, text=True
    )
    assert r.returncode == 2 and "NOT cross-round evidence" in (r.stderr + r.stdout)
    r = subprocess.run(
        ["python", tool, "--cpu", "--force", str(q), str(n), "99"],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0 and "WARNING" in r.stderr
    r = subprocess.run(
        ["python", tool, str(q), str(n), "99"], capture_output=True, text=True
    )
    assert r.returncode == 0 and "CAVEAT" in r.stderr
    # two quiet runs: cpu diff runs clean
    r = subprocess.run(
        ["python", tool, "--cpu", str(q), str(q), "99"], capture_output=True, text=True
    )
    assert r.returncode == 0 and "WARNING" not in r.stderr


def test_bench_headline_covers_round12_op():
    bench = _load_tool("bench", "/root/repo/bench.py")
    assert "mm_decode_phash_palette" in bench.HEADLINE


# ================================================ 16-bit + Adam7 (r12)


def _filter_sub(px, height, stride, bpp, filters):
    """Test-side spec filtering of one (sub-)image, independent of the
    engine's _filter_scanlines — per-byte predictor arithmetic."""
    from emdrive_spark.operators.multimodal import _paeth

    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = px[y * stride : (y + 1) * stride]
        f = filters[y]
        out.append(f)
        for i in range(stride):
            left = row[i - bpp] if i >= bpp else 0
            ul = prev[i - bpp] if i >= bpp else 0
            pred = (0, left, prev[i], (left + prev[i]) // 2, _paeth(left, prev[i], ul))[f]
            out.append((row[i] - pred) & 255)
        prev = row
    return bytes(out)


def _png_encode_full(w, h, color, depth, interlace, samples, filters, plte=None):
    """Test-side writer covering every supported shape: sub-byte/8/16
    bit, sequential or Adam7, palette or direct color. ``samples`` is
    one int per (pixel, channel) in raster order (palette: one index
    per pixel); ``filters`` is drawn per scanline across all passes.
    Sub-byte rows pack MSB-first with zero padding (spec 7.2)."""
    from emdrive_spark.operators.multimodal import _PNG_CHANNELS, _adam7_passes

    ch = 1 if color == 3 else _PNG_CHANNELS[color]

    def rowbytes(coords):
        if depth >= 8:
            sb = depth // 8
            return b"".join(
                samples[(y * w + x) * ch + c].to_bytes(sb, "big")
                for x, y in coords
                for c in range(ch)
            )
        acc = bytearray((len(coords) * depth + 7) // 8)
        for i, (x, y) in enumerate(coords):
            bit = i * depth
            acc[bit >> 3] |= samples[y * w + x] << (8 - depth - (bit & 7))
        return bytes(acc)

    bpp = max(1, ch * (depth // 8))
    raw = bytearray()
    fi = 0
    if interlace:
        for x0, y0, dx, dy, pw, ph in _adam7_passes(w, h):
            rows = [
                rowbytes([(x0 + i * dx, y0 + j * dy) for i in range(pw)])
                for j in range(ph)
            ]
            raw += _filter_sub(b"".join(rows), ph, len(rows[0]), bpp, filters[fi : fi + ph])
            fi += ph
    else:
        rows = [rowbytes([(x, y) for x in range(w)]) for y in range(h)]
        raw += _filter_sub(b"".join(rows), h, len(rows[0]), bpp, filters)
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace))
    body = _SIG + ihdr
    if color == 3:
        body += _chunk(b"PLTE", plte)
    return body + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


def test_deep_fixture_parity_with_ppm():
    """The 16-bit Adam7 fixture must decode to the SAME pixels and
    hash as the PPM fixture — pass geometry, sample alignment, and the
    MSB reduction all on the path."""
    from emdrive_spark.operators.multimodal import (
        ahash64,
        decode_image,
        encode_png_deep_fixture,
        encode_ppm_fixture,
    )

    for text in ("hello", "", "emdrive ünicøde", "x" * 500):
        for perturb in (False, True):
            ppm = decode_image(encode_ppm_fixture(text, perturb))
            deep = decode_image(encode_png_deep_fixture(text, perturb))
            assert ppm == deep
            assert ahash64(*ppm) == ahash64(*deep)


def test_deep_fixture_low_byte_is_junk():
    """Each 16-bit sample's low byte differs from its high byte (no
    constant offset), so keeping the wrong byte or averaging flips the
    decoded pixels — the reduction is load-bearing, not cosmetic."""
    import hashlib

    from emdrive_spark.operators.multimodal import decode_image, encode_png_deep_fixture

    text = "low byte probe"
    gray = b"".join(hashlib.md5(f"{text}:{k}".encode()).digest() for k in range(4))
    low = bytes((g * 7 + 13) % 256 for g in gray)
    assert low != gray
    w, h, rgb = decode_image(encode_png_deep_fixture(text))
    assert bytes(rgb[0::3]) == gray  # high bytes, not low


def test_deep_fixture_filters_span_all_passes():
    """The running row counter cycles all five filter types across the
    seven passes (15 scanlines at 8x8) — parse the IDAT to prove every
    type appears."""
    from emdrive_spark.operators.multimodal import _adam7_passes, encode_png_deep_fixture

    payload = encode_png_deep_fixture("filter span probe")
    pos = 8
    idat = b""
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        if payload[pos + 4 : pos + 8] == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    seen = []
    off = 0
    bpp = 2
    for _, _, _, _, pw, ph in _adam7_passes(8, 8):
        for j in range(ph):
            seen.append(raw[off])
            off += 1 + pw * bpp
    assert off == len(raw)
    assert seen == [(i % 5) for i in range(len(seen))]
    assert set(seen) == {0, 1, 2, 3, 4}


def test_png_full_shape_roundtrip_property():
    """Hypothesis roundtrip over the COMPLETE supported matrix: every
    legal (color type, depth) pairing x interlace, arbitrary content
    and per-scanline filters, via the independent test-side writer.
    16-bit decodes to the MSB, sub-byte gray scales to 0..255, palette
    indices look up PLTE, Adam7 scatters to position."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from emdrive_spark.operators.multimodal import (
        _PNG_CHANNELS,
        _adam7_passes,
        decode_image,
    )

    @settings(max_examples=150, deadline=None)
    @given(data=st.data())
    def check(data):
        w = data.draw(st.integers(1, 10))
        h = data.draw(st.integers(1, 10))
        color = data.draw(st.sampled_from([0, 2, 3, 4, 6]))
        depth = data.draw(
            st.sampled_from(
                {0: [1, 2, 4, 8, 16], 3: [1, 2, 4, 8]}.get(color, [8, 16])
            )
        )
        interlace = data.draw(st.sampled_from([0, 1]))
        ch = 1 if color == 3 else _PNG_CHANNELS[color]
        plte = None
        if color == 3:
            n_entries = data.draw(st.integers(1, min(256, 1 << depth)))
            plte = bytes(
                data.draw(
                    st.lists(st.integers(0, 255), min_size=3 * n_entries, max_size=3 * n_entries)
                )
            )
            hi = n_entries - 1
        else:
            hi = (1 << depth) - 1
        n = w * h * ch
        samples = data.draw(st.lists(st.integers(0, hi), min_size=n, max_size=n))
        n_rows = (
            sum(ph for *_, ph in _adam7_passes(w, h)) if interlace else h
        )
        filters = data.draw(st.lists(st.integers(0, 4), min_size=n_rows, max_size=n_rows))
        payload = _png_encode_full(w, h, color, depth, interlace, samples, filters, plte)
        got = decode_image(payload)
        # expected: normalize each sample to one byte, then expand
        if color == 3:
            want = b"".join(plte[3 * i : 3 * i + 3] for i in samples)
        else:
            if depth == 16:
                red = [v >> 8 for v in samples]
            elif depth < 8:
                red = [v * (255 // ((1 << depth) - 1)) for v in samples]
            else:
                red = samples
            if color == 0:
                want = bytes(g for g in red for _ in range(3))
            elif color == 2:
                want = bytes(red)
            elif color == 4:
                want = bytes(red[i] for i in range(0, len(red), 2) for _ in range(3))
            else:
                want = bytes(
                    b for i in range(0, len(red), 4) for b in red[i : i + 3]
                )
        assert got == (w, h, want)

    check()


def test_depth_taxonomy():
    """The FULL spec (color, depth) matrix decodes since r12; every
    ILLEGAL pairing is corruption (ValueError) — 16-bit palette,
    sub-byte truecolor/alpha, non-power depths. No NotImplementedError
    remains anywhere in the PNG domain (JPEG is the only codec-gated
    format). Sub-byte grays scale to 0..255 exactly; a PLTE larger
    than the raster depth can address is rejected."""
    from emdrive_spark.operators.multimodal import decode_image

    for depth, color in ((16, 3), (4, 2), (2, 4), (4, 6), (3, 0), (12, 2), (0, 0)):
        with pytest.raises(ValueError, match="bit depth"):
            decode_image(_SIG + _ihdr(color=color, depth=depth))
    # 2-bit gray decodes with exact 0..255 scaling (0,1,2,3 -> x85)
    p = (
        _SIG
        + _ihdr(w=4, h=1, depth=2)
        + _chunk(b"IDAT", zlib.compress(bytes([0, 0b00011011])))
        + _chunk(b"IEND", b"")
    )
    assert decode_image(p)[2][0::3] == bytes([0, 85, 170, 255])
    # 1-bit palette: indices address PLTE, not intensities
    p = (
        _SIG
        + _ihdr(w=2, h=1, depth=1, color=3)
        + _chunk(b"PLTE", bytes([1, 2, 3, 4, 5, 6]))
        + _chunk(b"IDAT", zlib.compress(bytes([0, 0b01000000])))
        + _chunk(b"IEND", b"")
    )
    assert decode_image(p)[2] == bytes([1, 2, 3, 4, 5, 6])
    # a 1-bit raster can address 2 entries; a 3-entry PLTE is invalid
    with pytest.raises(ValueError, match="exceed"):
        decode_image(
            _SIG
            + _ihdr(w=2, h=1, depth=1, color=3)
            + _chunk(b"PLTE", bytes(9))
            + _chunk(b"IDAT", zlib.compress(bytes([0, 0])))
            + _chunk(b"IEND", b"")
        )
    # truncated interlaced stream -> inflated-size ValueError
    short = (
        _SIG
        + _ihdr(w=8, h=8, inter=1)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflated bytes"):
        decode_image(short)


def test_deep_op_shares_oracle_and_headline():
    from emdrive_spark import registry

    registry.load_all()
    assert (
        registry.REGISTRY["mm_decode_phash"].oracle
        == registry.REGISTRY["mm_decode_phash_deep"].oracle
    )
    bench = _load_tool("bench2", "/root/repo/bench.py")
    assert "mm_decode_phash_deep" in bench.HEADLINE


def test_mm_decode_phash_deep_known_answer(spark):
    from emdrive_spark import registry
    from emdrive_spark.operators.multimodal import _DP_SHIFT

    rows = (
        registry.queries()["mm_decode_phash_deep"](spark, "/root/testdata/sf0.001")
        .collect()
    )
    n_base = sum(1 for r in rows if r.doc_id < _DP_SHIFT)
    assert len(rows) == 3 * n_base > 0
    assert all((r.width, r.height) == (8, 8) for r in rows)
    for r in rows:
        if r.doc_id < 2 * _DP_SHIFT:
            assert r.dup_cnt >= 1, f"doc {r.doc_id} lost its exact twin"
