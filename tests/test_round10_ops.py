"""Round-10 pins: the real PNM decoder + decoded-pixel phash dedup.

The oracle gate already value-checks mm_decode_phash end to end; these
tests pin the decoder/hash CONTRACTS independently (header grammar,
error taxonomy, integer threshold math, known-answer dup structure) so
a future refactor can't weaken them while the fixture happens to pass.
"""

from __future__ import annotations

import pytest

from emdrive_spark.operators.multimodal import (
    _DP_SHIFT,
    ahash64,
    decode_image,
    encode_ppm_fixture,
)

SF_SMOKE = "/root/testdata/sf0.001"


# ------------------------------------------------ decoder grammar


def test_decode_p6_roundtrip():
    w, h, rgb = decode_image(b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60]))
    assert (w, h) == (2, 1)
    assert rgb == bytes([10, 20, 30, 40, 50, 60])


def test_decode_p5_expands_gray_to_rgb():
    w, h, rgb = decode_image(b"P5\n1 2\n255\n" + bytes([7, 200]))
    assert (w, h) == (1, 2)
    assert rgb == bytes([7, 7, 7, 200, 200, 200])


def test_decode_header_comments_and_multiline_whitespace():
    # comments between any tokens, tokens split across lines — the PNM
    # grammar a real file in the wild uses.
    payload = b"P6 # magic comment\n# full line\n 2\t1 # dims\n255\n" + bytes(6)
    w, h, rgb = decode_image(payload)
    assert (w, h, rgb) == (2, 1, bytes(6))


def test_decode_error_taxonomy():
    # r11: the PNG signature now routes to the real PNG decoder, so a
    # garbage body behind it is CORRUPTION (ValueError), not an
    # unsupported format; JPEG remains the unsupported-magic case.
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n" + bytes(16))
    with pytest.raises(NotImplementedError, match="unsupported magic"):
        decode_image(b"\xff\xd8\xff\xe0" + bytes(16))  # JPEG/JFIF
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"P6\n2 2\n255\n" + bytes(5))  # need 12
    with pytest.raises(ValueError, match="maxval"):
        decode_image(b"P6\n1 1\n65535\n" + bytes(3))
    with pytest.raises(ValueError, match="expected integer"):
        decode_image(b"P6\nx 1\n255\n" + bytes(3))
    with pytest.raises(ValueError, match="empty or truncated"):
        decode_image(b"")


# ------------------------------------------------ ahash contract


def test_ahash64_known_tiny_case():
    # 8x8 image, pixel (0,0) bright, everything else dark: exactly one
    # cell exceeds the global mean -> single MSB set in hi, lo empty.
    rgb = bytes([255, 255, 255] + [0] * (63 * 3))
    assert ahash64(8, 8, rgb) == (1 << 31, 0)


def test_ahash64_block_mean_downsample():
    # 16x8 image (2x1-pixel cells): left half bright, right half dark —
    # the 8x8 grid sees 4 bright columns -> bits 0-3 of each row.
    row = bytes([200] * 8 * 3 + [0] * 8 * 3)
    hi, lo = ahash64(16, 8, row * 8)
    row_bits = 0b11110000
    expect = 0
    for r in range(4):
        expect = (expect << 8) | row_bits
    assert (hi, lo) == (expect, expect)


def test_ahash64_rejects_non_divisible_dims():
    with pytest.raises(ValueError, match="8-divisible"):
        ahash64(10, 8, bytes(10 * 8 * 3))


def test_ahash_matches_fixture_closed_form():
    # The decode->hash path must equal the oracle's analytic form:
    # gray(idx) = byte idx%16 of md5(f"{text}:{idx//16}").
    import hashlib

    text = "round ten fixture"
    gray = [
        b for k in range(4) for b in hashlib.md5(f"{text}:{k}".encode()).digest()
    ]
    s = sum(gray)
    hi = lo = 0
    for i, v in enumerate(gray):
        bit = 1 if v * 64 > s else 0
        if i < 32:
            hi |= bit << (31 - i)
        else:
            lo |= bit << (63 - i)
    assert ahash64(*decode_image(encode_ppm_fixture(text))) == (hi, lo)


def test_perturbed_fixture_lands_nonzero_hamming():
    text = "perturb me"
    hi, lo = ahash64(*decode_image(encode_ppm_fixture(text)))
    phi, plo = ahash64(*decode_image(encode_ppm_fixture(text, perturb=True)))
    ham = bin((hi ^ phi) | ((lo ^ plo) << 64)).count("1")
    assert ham > 0  # a genuinely different image, not a byte copy


# ------------------------------------------------ op known answer


def test_mm_decode_phash_known_answer(spark):
    """Structure pins on top of the oracle's value hash: every base doc
    has its byte-identical copy at hamming 0 (dup_cnt >= 1 everywhere on
    the base+copy rows), the corpus triples the base, and decoded dims
    are the fixture's 8x8 (i.e. the header really was parsed)."""
    from emdrive_spark import registry

    rows = registry.queries()["mm_decode_phash"](spark, SF_SMOKE).collect()
    n_base = sum(1 for r in rows if r.doc_id < _DP_SHIFT)
    assert len(rows) == 3 * n_base > 0
    assert all((r.width, r.height) == (8, 8) for r in rows)
    for r in rows:
        if r.doc_id < 2 * _DP_SHIFT:  # base or exact copy
            assert r.dup_cnt >= 1, f"doc {r.doc_id} lost its exact twin"


# ------------------------------------------------ decoder properties


@pytest.mark.slow
def test_decode_roundtrip_property():
    """Hypothesis roundtrip across all four PNM variants: any
    (w, h, raster) encodes to a P2/P3/P5/P6 that decodes back exactly;
    gray rasters expand channel-faithfully. Catches off-by-ones in
    header token/raster boundary handling that a fixed fixture can
    miss, and pins binary/ASCII raster equivalence."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        data=st.data(),
        gray=st.booleans(),
        ascii_form=st.booleans(),
    )
    def check(w, h, data, gray, ascii_form):
        ch = 1 if gray else 3
        raster = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
                )
            )
        )
        if ascii_form:
            magic = b"P2" if gray else b"P3"
            body = " ".join(str(s) for s in raster).encode()
        else:
            magic = b"P5" if gray else b"P6"
            body = raster
        payload = magic + f"\n{w} {h}\n255\n".encode() + body
        dw, dh, rgb = decode_image(payload)
        assert (dw, dh) == (w, h)
        if gray:
            assert rgb == bytes(g for g in raster for _ in range(3))
        else:
            assert rgb == raster

    check()


def test_decode_ascii_variants_known_case():
    # P3 with comments inside the raster (legal PNM), P2 gray expansion,
    # over-maxval sample rejection.
    w, h, rgb = decode_image(b"P3\n2 1\n255\n10 20 30 # mid-raster\n40 50 60")
    assert (w, h, rgb) == (2, 1, bytes([10, 20, 30, 40, 50, 60]))
    w, h, rgb = decode_image(b"P2\n1 2\n200\n7\n200")
    assert (w, h, rgb) == (1, 2, bytes([7, 7, 7, 200, 200, 200]))
    with pytest.raises(ValueError, match="exceeds declared maxval"):
        decode_image(b"P2\n1 1\n100\n101")
    with pytest.raises(ValueError, match="expected integer"):
        decode_image(b"P3\n2 1\n255\n10 20 30")  # truncated ASCII raster


def test_decode_junk_never_miscategorizes():
    """Arbitrary bytes must raise NotImplementedError (unknown magic)
    or ValueError (malformed PNM) — never decode garbage into pixels,
    never escape with an unrelated exception type (an IndexError here
    would kill a whole Arrow batch in production)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(payload=st.binary(max_size=200))
    def check(payload):
        try:
            w, h, rgb = decode_image(payload)
        except (NotImplementedError, ValueError):
            return
        # a successful decode of random bytes must be a genuine PNM —
        # any of the four magics (ASCII P2/P3 are legitimately
        # decodable, e.g. b"P2 1 1 1 0"; r10 ADVICE) — and the decoded
        # raster is always packed RGB regardless of source form.
        assert bytes(payload[:2]) in (b"P2", b"P3", b"P5", b"P6")
        assert len(rgb) == w * h * 3

    check()
