#!/usr/bin/env python3
"""Generate fixtures/jpeg_assets.parquet: small REAL JPEG files (valid
SOI, APPn/DQT/SOF/DHT/SOS marker segments, EOI) with the ground-truth
frame-header fields stored alongside as ordinary columns.

The Spark side walks the marker segments and parses width / height /
precision / component-count OUT OF THE BYTES (MultiModal.jpegMeta); the
oracle simply selects the stored truth — construction and parsing are
independent code paths, so agreement is a genuine decode check.

Adversarial constructions on purpose:
  - most rows carry an APP1 (Exif-like) segment whose PAYLOAD contains
    the byte pair FF C0 — a naive "find first FFC0" scan mis-parses
    these; only a real segment walk survives;
  - a random number of DQT segments before the SOF, so the SOF offset
    varies row to row;
  - a mix of baseline (SOF0) and progressive (SOF2) frames;
  - dimensions above 255 so the 16-bit big-endian reads are multi-byte.

Deterministic: seed 1337.
"""
import random
import struct

import pyarrow as pa
import pyarrow.parquet as pq


def seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def jpeg(w: int, h: int, ncomp: int, progressive: bool,
         rnd: random.Random) -> bytes:
    app0 = seg(0xE0, b"JFIF\x00\x01\x02" + struct.pack(">BHHBB", 1, 72, 72, 0, 0))
    parts = [b"\xFF\xD8", app0]
    if rnd.random() < 0.8:
        # Exif-like payload deliberately containing FF C0 + plausible
        # length bytes: marker-like bytes INSIDE a segment payload
        trap = b"Exif\x00\x00" + bytes([0xFF, 0xC0, 0x00, 0x11]) + bytes(
            rnd.randrange(256) for _ in range(rnd.randrange(4, 48)))
        parts.append(seg(0xE1, trap))
    for _ in range(rnd.randrange(1, 4)):  # 1-3 quantization tables
        parts.append(seg(0xDB, bytes([rnd.randrange(2)]) + bytes(
            rnd.randrange(1, 256) for _ in range(64))))
    comps = b"".join(struct.pack(">BBB", i + 1, 0x11, 0) for i in range(ncomp))
    parts.append(seg(0xC2 if progressive else 0xC0,
                     struct.pack(">BHHB", 8, h, w, ncomp) + comps))
    parts.append(seg(0xC4, bytes([0x00]) + bytes(16) + b"\x00"))  # minimal DHT
    parts.append(seg(0xDA, struct.pack(">B", ncomp) + b"".join(
        struct.pack(">BB", i + 1, 0) for i in range(ncomp)) + b"\x00\x3f\x00"))
    # entropy-coded bytes (content irrelevant: the walker stops at SOF)
    parts.append(bytes(rnd.choice([0x00, 0x12, 0x34, 0xAB])
                       for _ in range(rnd.randrange(10, 200))))
    parts.append(b"\xFF\xD9")
    return b"".join(parts)


def main():
    rnd = random.Random(1337)
    rows = {k: [] for k in ("asset_id", "content", "true_width",
                            "true_height", "true_n_components",
                            "true_progressive", "true_n_bytes")}
    for i in range(300):
        w = rnd.choice([1, 8, 13, 64, 160, 255, 256, 640, 1920, 4032])
        h = rnd.choice([1, 6, 17, 48, 255, 300, 480, 1080, 3024])
        ncomp = rnd.choice([1, 3, 3, 3])  # grayscale / YCbCr
        progressive = rnd.random() < 0.4
        content = jpeg(w, h, ncomp, progressive, rnd)
        rows["asset_id"].append(2000000 + i)
        rows["content"].append(content)
        rows["true_width"].append(w)
        rows["true_height"].append(h)
        rows["true_n_components"].append(ncomp)
        rows["true_progressive"].append(progressive)
        rows["true_n_bytes"].append(len(content))
    table = pa.table({
        "asset_id": pa.array(rows["asset_id"], pa.int64()),
        "content": pa.array(rows["content"], pa.binary()),
        "true_width": pa.array(rows["true_width"], pa.int64()),
        "true_height": pa.array(rows["true_height"], pa.int64()),
        "true_n_components": pa.array(rows["true_n_components"], pa.int64()),
        "true_progressive": pa.array(rows["true_progressive"], pa.bool_()),
        "true_n_bytes": pa.array(rows["true_n_bytes"], pa.int64()),
    })
    pq.write_table(table, "fixtures/jpeg_assets.parquet")
    print("wrote fixtures/jpeg_assets.parquet:", table.num_rows, "rows")


if __name__ == "__main__":
    main()
