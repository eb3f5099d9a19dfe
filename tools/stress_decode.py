"""CPU-per-image profile of the stdlib PNG decode path vs image size
(r11 verdict item 6): the per-byte Python unfilter is documented as
fixture-scale — this measures WHERE it stops being acceptable, the
number a deployment needs to decide when to swap a codec library in
behind decode_image (the boundary is clean: same signature, payloads
never shuffle, one Python stage).

Method: for each size, build a deterministic 8-bit RGB PNG (md5-stream
pixels, rows cycling through all five filter types — the worst-case
unfilter mix, zlib-deflated like a real encoder since the fixture
writer's stored-block path caps at 64 KiB rasters), then measure
process-CPU per decode_image call and per ahash64 call over enough
reps to integrate ~seconds. Pure-Python, no Spark: the certified ops
run exactly this code inside mapInPandas, so cpu/image here is
cpu/image there.

Usage: python tools/stress_decode.py [sizes...]   (default 8 64 256)
Prints one JSON line — copy the numbers into SCALING.md.
"""

from __future__ import annotations

import hashlib
import json
import struct
import sys
import time
import zlib

sys.path.insert(0, "/root/repo")

from emdrive_spark.operators.multimodal import (  # noqa: E402
    _paeth,
    ahash64,
    decode_image,
)


def make_png(size: int) -> bytes:
    """Deterministic size x size 8-bit RGB PNG, row y filtered with
    type y % 5, deflate-compressed (not stored blocks) so the inflate
    path also runs at realistic compression."""
    n = size * size * 3
    px = bytearray()
    k = 0
    while len(px) < n:
        px += hashlib.md5(f"stress:{size}:{k}".encode()).digest()
        k += 1
    px = bytes(px[:n])
    stride = size * 3
    filtered = bytearray()
    prev = bytes(stride)
    pad = bytes(3)
    for y in range(size):
        row = px[y * stride : (y + 1) * stride]
        f = y % 5
        filtered.append(f)
        if f == 0:
            filtered += row
        elif f == 1:
            filtered += bytes((x - l) & 255 for x, l in zip(row, pad + row[:-3]))
        elif f == 2:
            filtered += bytes((x - u) & 255 for x, u in zip(row, prev))
        elif f == 3:
            filtered += bytes(
                (x - (l + u) // 2) & 255 for x, l, u in zip(row, pad + row[:-3], prev)
            )
        else:
            filtered += bytes(
                (x - _paeth(l, u, c)) & 255
                for x, l, u, c in zip(row, pad + row[:-3], prev, pad + prev[:-3])
            )
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", size, size, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )


def cpu_per_call(fn, reps: int) -> float:
    t0 = time.process_time()
    for _ in range(reps):
        fn()
    return (time.process_time() - t0) / reps


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [8, 64, 256]
    out = {"op": "png_decode_cpu_profile", "rows": []}
    for size in sizes:
        payload = make_png(size)
        # integrate >= ~1 s of CPU per measurement
        probe = cpu_per_call(lambda: decode_image(payload), 3)
        reps = max(3, int(1.0 / max(probe, 1e-6)))
        decode_cpu = cpu_per_call(lambda: decode_image(payload), reps)
        w, h, rgb = decode_image(payload)
        probe_h = cpu_per_call(lambda: ahash64(w, h, rgb), 3)
        reps_h = max(3, int(1.0 / max(probe_h, 1e-6)))
        hash_cpu = cpu_per_call(lambda: ahash64(w, h, rgb), reps_h)
        out["rows"].append(
            {
                "size": size,
                "png_bytes": len(payload),
                "decode_cpu_ms": round(decode_cpu * 1e3, 3),
                "hash_cpu_ms": round(hash_cpu * 1e3, 3),
                "decode_us_per_px": round(decode_cpu / (size * size) * 1e6, 3),
            }
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
