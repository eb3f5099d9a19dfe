"""Round-11 pins: steal-invariant bench metering (hostmeter), the
in-run noise canaries, and the paired wall/cpu tail-cap trim.

Context (r10 verdict item 1): two consecutive official bench artifacts
were flagged-noisy and four same-code runs spanned 157-226 s — the
hypervisor steals CPU in patches invisible to in-guest loadavg, so
wall-clock alone can no longer prove or refute a cross-round perf
claim. The fix is instrumentation: per-query executor CPU time (steal
cannot inflate it) and the guest's paravirt steal counter itself.
"""

from __future__ import annotations

import importlib.util
import json
import time


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def test_hostmeter_counters_monotonic_and_busy_moves():
    """snapshot() returns cumulative counters that (a) exist on this
    host, (b) never decrease, and (c) busy/cpu advance when the guest
    burns CPU — the property every per-rep delta in bench.py rests on."""
    from emdrive_spark.functions import hostmeter

    a = hostmeter.snapshot()
    assert a["busy_s"] is not None and a["steal_s"] is not None
    assert a["cpu_s"] is not None
    # burn ~0.15 s of CPU in-process
    t0 = time.process_time()
    x = 0
    while time.process_time() - t0 < 0.15:
        x += 1
    b = hostmeter.snapshot()
    d = hostmeter.delta(a, b)
    assert d["busy_s"] >= 0 and d["steal_s"] >= 0 and d["cpu_s"] >= 0
    # jiffy resolution is 10 ms; 150 ms of burn must register on both
    # the /proc/stat busy counter and the cgroup ns counter
    assert d["busy_s"] >= 0.05, d
    assert d["cpu_s"] >= 0.05, d


def test_hostmeter_steal_share_algebra():
    from emdrive_spark.functions import hostmeter

    assert hostmeter.steal_share({"busy_s": 95.0, "steal_s": 5.0}) == 0.05
    assert hostmeter.steal_share({"busy_s": 0.0, "steal_s": 0.0}) is None
    assert hostmeter.steal_share({"busy_s": None, "steal_s": 5.0}) is None
    assert hostmeter.steal_share({"busy_s": 5.0, "steal_s": None}) is None
    d = hostmeter.delta(
        {"busy_s": 10.0, "steal_s": 1.0, "cpu_s": 12.0},
        {"busy_s": 16.0, "steal_s": 3.0, "cpu_s": 20.0},
    )
    assert d == {"busy_s": 6.0, "steal_s": 2.0, "cpu_s": 8.0}
    # None propagates per-field, never raises
    d = hostmeter.delta(
        {"busy_s": None, "steal_s": 1.0, "cpu_s": None},
        {"busy_s": 16.0, "steal_s": 3.0, "cpu_s": 20.0},
    )
    assert d["busy_s"] is None and d["steal_s"] == 2.0 and d["cpu_s"] is None


def test_bench_canary_ratio_contract():
    """canary_ratio: FLEET-MEDIAN this-run/committed wall ratio over
    the intersection; None below 5 comparable rows (first run, renames,
    missing record) so a missing record can never flag a run. Fleet
    median, not a pinned subset: the r11 calibration found a pinned
    5-op set reading 1.006 under 16 hog processes (narrow-parallelism
    ops dodge in-guest contention via the scheduler) while the total
    inflated 3x."""
    bench = _load_bench()
    names = [f"op_{i}" for i in range(9)]
    timings = {n: 2.0 for n in names}
    base = {n: 1.0 for n in names}
    assert bench._canary_ratio(timings, base) == 2.0
    # a minority of genuine engine changes cannot flag the run: 4 of 9
    # rows 10x faster in baseline -> median still reads the majority
    mixed = dict(base, **{n: 0.2 for n in names[:4]})
    assert bench._canary_ratio(timings, mixed) == 2.0
    assert bench._canary_ratio(timings, {}) is None
    assert bench._canary_ratio(timings, dict(list(base.items())[:4])) is None
    # zero/garbage baselines are excluded, not divided by
    assert bench._canary_ratio(timings, {n: 0.0 for n in names}) is None
    # intersection only: extra baseline rows are ignored
    assert bench._canary_ratio(timings, dict(base, extra=9.9)) == 2.0


def test_bench_committed_record_covers_headline():
    """The committed quiet record must cover enough of HEADLINE that
    the fleet-median canary is live (>= 5 comparable rows by contract;
    in practice nearly all of them)."""
    bench = _load_bench()
    rec = json.load(open("/root/repo/BENCH_LOCAL.json"))
    common = [n for n in bench.HEADLINE if isinstance(rec["queries"].get(n), (int, float))]
    assert len(common) >= 5
    assert len(common) >= len(bench.HEADLINE) - 5  # only brand-new ops may lack rows


def test_fit_tail_cap_trims_wall_and_cpu_in_tandem():
    """The stdout line now carries two per-query dicts; a trimmed row
    must leave BOTH (aligned dicts), the per-query steal dict never
    rides on stdout, and the full payload is never mutated."""
    bench = _load_bench()
    qs = {f"op_with_a_realistic_name_{i:03d}": round(0.2 + i * 0.13, 3) for i in range(90)}
    cpu = {k: round(v * 7.3, 3) for k, v in qs.items()}
    steal = {k: 0.01 for k in qs}
    payload = {
        "metric": "headline_queries_total",
        "value": 123.456,
        "unit": "sec",
        "queries": qs,
        "cpu": cpu,
        "steal": steal,
        "cpu_total": 900.1,
        "steal_total": 1.23,
        "steal_share": 0.004,
        "canary_ratio": 1.02,
        "reps": 5,
        "load_avg": [8.1, 8.39, 6.77],
        "load_at_start": 0.28,
        "noisy": False,
        "sf": 0.1,
    }
    slim = bench._fit_tail_cap(payload)
    line = json.dumps(slim, separators=(",", ":"))
    assert len(line) <= 2000 - 1
    assert "steal" not in slim and slim["steal_total"] == 1.23
    assert set(slim["cpu"]) == set(slim["queries"])
    assert slim["queries_elided"] == 90 - len(slim["queries"])
    kept_min = min(slim["queries"].values())
    elided_max = max(v for k, v in qs.items() if k not in slim["queries"])
    assert elided_max <= kept_min
    # scalar signal fields survive trimming
    parsed = json.loads(line)
    assert parsed["steal_share"] == 0.004 and parsed["canary_ratio"] == 1.02
    assert len(payload["queries"]) == 90 and len(payload["cpu"]) == 90


# ================================================ PNG decoder (r11)
# Mirrors the r10 PNM taxonomy (r10 verdict item 3): grammar,
# error taxonomy, filter coverage, hypothesis roundtrip, and the
# known-answer structure of the certified op.

import pytest


def _png_encode_raw(width, height, color, rows, filters):
    """Test-side PNG writer independent of the engine's encoder: build
    a PNG from explicit per-row filter choices so the decoder is
    checked against the SPEC, not against its sibling encoder."""
    import struct
    import zlib

    from emdrive_spark.operators.multimodal import _PNG_CHANNELS, _paeth

    bpp = _PNG_CHANNELS[color]
    stride = width * bpp
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = rows[y * stride : (y + 1) * stride]
        f = filters[y]
        out.append(f)
        for i in range(stride):
            left = row[i - bpp] if i >= bpp else 0
            ul = prev[i - bpp] if i >= bpp else 0
            pred = (0, left, prev[i], (left + prev[i]) // 2, _paeth(left, prev[i], ul))[f]
            out.append((row[i] - pred) & 255)
        prev = row

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", zlib.crc32(ctype + data)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def _expected_rgb(color, px):
    if color == 0:
        return bytes(g for g in px for _ in range(3))
    if color == 2:
        return bytes(px)
    if color == 4:
        return bytes(px[i] for i in range(0, len(px), 2) for _ in range(3))
    return bytes(b for i in range(0, len(px), 4) for b in px[i : i + 3])


def test_png_fixture_parity_with_ppm():
    """The PNG fixture must decode to the SAME pixels and hash as the
    PPM fixture — that identity is what lets both ops share one
    closed-form oracle."""
    from emdrive_spark.operators.multimodal import (
        ahash64,
        decode_image,
        encode_png_fixture,
        encode_ppm_fixture,
    )

    for text in ("hello", "", "emdrive ünicøde", "x" * 500):
        for perturb in (False, True):
            ppm = decode_image(encode_ppm_fixture(text, perturb))
            png = decode_image(encode_png_fixture(text, perturb))
            assert ppm == png
            assert ahash64(*ppm) == ahash64(*png)


def test_png_fixture_exercises_all_five_filters():
    """Row y of the fixture is filtered with type y % 5 — all five
    unfilter paths are load-bearing in the certified op. Parse the
    actual IDAT stream to prove it (a future 'optimization' that
    switches to all-type-0 would silently stop testing Sub/Up/Avg/
    Paeth)."""
    import struct
    import zlib

    from emdrive_spark.operators.multimodal import encode_png_fixture

    payload = encode_png_fixture("filter coverage probe")
    pos = 8
    idat = b""
    while pos + 12 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 8 * 3
    seen = [raw[y * (stride + 1)] for y in range(8)]
    assert seen == [0, 1, 2, 3, 4, 0, 1, 2]


def test_png_color_type_semantics():
    """Gray expands to RGB; gray+alpha and RGBA drop alpha (hash runs
    on color content, alpha is opacity not content)."""
    from emdrive_spark.operators.multimodal import decode_image

    w, h, rgb = decode_image(_png_encode_raw(2, 1, 0, bytes([9, 250]), [0]))
    assert (w, h, rgb) == (2, 1, bytes([9, 9, 9, 250, 250, 250]))
    w, h, rgb = decode_image(_png_encode_raw(1, 1, 4, bytes([77, 5]), [0]))
    assert rgb == bytes([77, 77, 77])
    w, h, rgb = decode_image(_png_encode_raw(1, 1, 6, bytes([1, 2, 3, 200]), [0]))
    assert rgb == bytes([1, 2, 3])


def test_png_error_taxonomy():
    """Spec-valid-but-unsupported -> NotImplementedError; corruption ->
    ValueError; never garbage pixels, never a foreign exception type."""
    import struct
    import zlib

    from emdrive_spark.operators.multimodal import decode_image, encode_png_fixture

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", zlib.crc32(ctype + data)
        )

    sig = b"\x89PNG\r\n\x1a\n"

    def with_ihdr(w=1, h=1, depth=8, color=0, comp=0, filt=0, inter=0):
        return sig + chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, comp, filt, inter)
        )

    with pytest.raises(ValueError, match="interlace"):
        decode_image(with_ihdr(inter=2))  # 0/1 are the only methods
    # since r12 the FULL spec matrix decodes (palette, 16-bit,
    # sub-byte, Adam7) — taxonomy pinned in tests/test_round12_ops.py;
    # an ILLEGAL (color, depth) pairing is corruption, and for PNG no
    # NotImplementedError remains (JPEG is the only codec-gated format)
    with pytest.raises(ValueError, match="bit depth"):
        decode_image(with_ihdr(depth=4, color=2))  # truecolor is 8/16 only
    with pytest.raises(ValueError, match="color type"):
        decode_image(with_ihdr(color=7))
    with pytest.raises(ValueError, match="dimensions"):
        decode_image(with_ihdr(w=0))
    with pytest.raises(ValueError, match="first chunk must be IHDR"):
        decode_image(sig + chunk(b"IDAT", b"x"))
    with pytest.raises(ValueError, match="no IEND"):
        decode_image(with_ihdr())  # valid IHDR, stream just stops
    with pytest.raises(ValueError, match="no IDAT"):
        decode_image(with_ihdr() + chunk(b"IEND", b""))
    # flipped bit anywhere in a chunk body -> CRC mismatch
    good = encode_png_fixture("crc probe")
    bad = bytearray(good)
    bad[40] ^= 1
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_image(bytes(bad))
    # inflate garbage behind a correct CRC -> inflate failure
    broken = with_ihdr() + chunk(b"IDAT", b"not zlib") + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="inflate failed"):
        decode_image(broken)
    # wrong inflated length (1x1 gray needs 2 bytes: filter + sample)
    short = with_ihdr() + chunk(b"IDAT", zlib.compress(b"\x00")) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="inflated bytes"):
        decode_image(short)
    # unknown filter type in an otherwise valid stream
    uf = with_ihdr() + chunk(b"IDAT", zlib.compress(b"\x07\x00")) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unknown filter"):
        decode_image(uf)


def test_png_roundtrip_property():
    """Hypothesis roundtrip: any (w, h, color type, pixels, per-row
    filter choices) encodes via the spec-side writer and decodes back
    to the exact expected RGB — Sub/Up/Average/Paeth reconstruction is
    exact for arbitrary content, not just the fixture's."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from emdrive_spark.operators.multimodal import _PNG_CHANNELS, decode_image

    @settings(max_examples=120, deadline=None)
    @given(data=st.data())
    def check(data):
        w = data.draw(st.integers(1, 9))
        h = data.draw(st.integers(1, 9))
        color = data.draw(st.sampled_from([0, 2, 4, 6]))
        n = w * h * _PNG_CHANNELS[color]
        px = bytes(data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n)))
        filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
        got = decode_image(_png_encode_raw(w, h, color, px, filters))
        assert got == (w, h, _expected_rgb(color, px))

    check()


def test_png_junk_body_property():
    """Arbitrary bytes behind the PNG signature must raise ValueError
    or NotImplementedError — never decode, never escape with a foreign
    exception (an IndexError would kill a whole Arrow batch)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from emdrive_spark.operators.multimodal import decode_image

    @settings(max_examples=300, deadline=None)
    @given(body=st.binary(max_size=120))
    def check(body):
        with pytest.raises((ValueError, NotImplementedError)):
            decode_image(b"\x89PNG\r\n\x1a\n" + body)

    check()


def test_mm_decode_phash_png_known_answer(spark):
    """Same structure pins as the PPM op (r10): base+copy rows keep
    their exact twin, corpus triples the base, dims prove the header
    really was parsed — now through the PNG chunk/CRC/inflate/unfilter
    stack."""
    from emdrive_spark import registry
    from emdrive_spark.operators.multimodal import _DP_SHIFT

    rows = registry.queries()["mm_decode_phash_png"](spark, "/root/testdata/sf0.001").collect()
    n_base = sum(1 for r in rows if r.doc_id < _DP_SHIFT)
    assert len(rows) == 3 * n_base > 0
    assert all((r.width, r.height) == (8, 8) for r in rows)
    for r in rows:
        if r.doc_id < 2 * _DP_SHIFT:
            assert r.dup_cnt >= 1, f"doc {r.doc_id} lost its exact twin"


def test_png_and_ppm_ops_share_oracle():
    """The two certified ops must carry the IDENTICAL oracle string —
    the parity that makes the PNG decode stack value-checked against
    the text-derived closed form."""
    from emdrive_spark import registry

    registry.load_all()
    assert (
        registry.REGISTRY["mm_decode_phash"].oracle
        == registry.REGISTRY["mm_decode_phash_png"].oracle
    )


# ================================================ real resize (r11)


def test_resize_block_mean_known_values():
    from emdrive_spark.operators.multimodal import resize_block_mean

    # 2x2 -> 1x1: floor mean per channel, channels independent
    rgb = bytes(
        [10, 0, 255, 20, 0, 255,
         30, 1, 255, 43, 1, 255]
    )
    nw, nh, out = resize_block_mean(2, 2, rgb, 2)
    assert (nw, nh) == (1, 1)
    assert out == bytes([(10 + 20 + 30 + 43) // 4, (0 + 0 + 1 + 1) // 4, 255])
    # factor 1 is the identity
    assert resize_block_mean(2, 2, rgb, 1) == (2, 2, rgb)
    # non-divisible dims refuse (the fixture contract)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divisible"):
        resize_block_mean(3, 2, bytes(3 * 2 * 3), 2)
    with _pytest.raises(ValueError, match="divisible"):
        resize_block_mean(2, 2, rgb, 0)


def test_resize_block_mean_block_geometry():
    """4x2 -> 2x1 with distinct quadrants: each output pixel must mean
    ITS OWN 2x2 block (catches x/y transposition and stride bugs)."""
    from emdrive_spark.operators.multimodal import resize_block_mean

    # rows: [A A B B] / [A A B B] with A=100, B=200 (gray)
    row = [100] * 6 + [200] * 6
    rgb = bytes(row * 2)
    nw, nh, out = resize_block_mean(4, 2, rgb, 2)
    assert (nw, nh) == (2, 1)
    assert out == bytes([100, 100, 100, 200, 200, 200])


def test_gray16_fixture_matches_closed_form_through_resize():
    """The certified op's exact math, end to end in-process: decode the
    16x16 grayscale PNG fixture, block-mean 2x, hash — must equal the
    oracle's closed form (md5 bytes -> sum//4 cells -> threshold)."""
    import hashlib

    from emdrive_spark.operators.multimodal import (
        ahash64,
        decode_image,
        encode_png_gray16_fixture,
        resize_block_mean,
    )

    for text, perturb in (("round eleven", False), ("round eleven", True)):
        w, h, rgb = decode_image(encode_png_gray16_fixture(text, perturb))
        assert (w, h) == (16, 16)
        got = ahash64(*resize_block_mean(w, h, rgb, 2))
        gray = [
            b for k in range(16) for b in hashlib.md5(f"{text}:{k}".encode()).digest()
        ]
        if perturb:
            gray[0] = (gray[0] + 128) % 256
        cells = [0] * 64
        for idx, g in enumerate(gray):
            cells[((idx // 16) // 2) * 8 + ((idx % 16) // 2)] += g
        cells = [v // 4 for v in cells]
        s = sum(cells)
        hi = lo = 0
        for i, v in enumerate(cells):
            bit = 1 if v * 64 > s else 0
            if i < 32:
                hi |= bit << (31 - i)
            else:
                lo |= bit << (63 - i)
        assert got == (hi, lo)


def test_resize_then_hash_is_not_direct_hash():
    """The floor division makes the resample load-bearing: pin a
    concrete fixture where hashing the resized grid differs from
    ahash64's own exact-sum block mean over the full 16x16 — i.e. the
    op certifies the RESIZE, not a no-op reshuffle of the same bits."""
    from emdrive_spark.operators.multimodal import (
        ahash64,
        decode_image,
        encode_png_gray16_fixture,
        resize_block_mean,
    )

    w, h, rgb = decode_image(encode_png_gray16_fixture("probe8"))
    assert ahash64(16, 16, rgb) != ahash64(*resize_block_mean(16, 16, rgb, 2))


def test_mm_decode_resize_phash_known_answer(spark):
    """Structure pins on top of the oracle's value hash: metadata
    reports the DECODED dims (16x16 — the resize is internal), the
    corpus triples the base, and base+copy rows keep their exact twin."""
    from emdrive_spark import registry
    from emdrive_spark.operators.multimodal import _DP_SHIFT

    rows = registry.queries()["mm_decode_resize_phash"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    n_base = sum(1 for r in rows if r.doc_id < _DP_SHIFT)
    assert len(rows) == 3 * n_base > 0
    assert all((r.width, r.height) == (16, 16) for r in rows)
    for r in rows:
        if r.doc_id < 2 * _DP_SHIFT:
            assert r.dup_cnt >= 1, f"doc {r.doc_id} lost its exact twin"


def test_noisy_verdict_measurements_supersede_heuristic():
    """With both in-run meters live, the start-loadavg heuristic cannot
    flag a run by itself (it twice cost the repo its fastest quiet
    record via a previous JVM's teardown load); it still decides alone
    when either meter is missing. Gates flag strictly-above."""
    bench = _load_bench()
    v = bench._noisy_verdict
    # meters live + clean -> heuristic overruled
    assert v(True, 0.008, 0.74, 0.02, 1.2) is False
    # meters live + either gate tripped -> noisy regardless of load
    assert v(False, 0.044, 0.9, 0.02, 1.2) is True
    assert v(False, 0.001, 1.71, 0.02, 1.2) is True
    # at-gate is not above-gate
    assert v(False, 0.02, 1.2, 0.02, 1.2) is False
    # a meter missing -> heuristic decides alone
    assert v(True, None, 0.9, 0.02, 1.2) is True
    assert v(True, 0.008, None, 0.02, 1.2) is True
    assert v(False, None, None, 0.02, 1.2) is False
    # missing meter never blocks the other live gate
    assert v(False, None, 1.71, 0.02, 1.2) is True
    assert v(False, 0.044, None, 0.02, 1.2) is True
