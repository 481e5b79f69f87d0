#!/usr/bin/env python3
"""Generate fixtures/png_assets.parquet: small REAL PNG files (valid
signature, IHDR/IDAT/IEND chunks, CRCs, zlib-compressed scanlines) with
the ground-truth header fields stored alongside as ordinary columns.

The Spark side parses width/height/bit-depth OUT OF THE BYTES
(MultiModal.decodeMeta); the oracle simply selects the stored truth —
construction and parsing are independent code paths, so agreement is a
genuine decode check. Deterministic: seed 42.
"""
import random
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq


def chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def png(w: int, h: int, rnd: random.Random) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(
        b"\x00" + bytes(rnd.randrange(256) for _ in range(3 * w))
        for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def main():
    rnd = random.Random(42)
    rows = {k: [] for k in ("asset_id", "content", "true_width",
                            "true_height", "true_bit_depth", "true_n_bytes",
                            "true_byte_sum", "true_byte_max")}
    for i in range(300):
        # spread of shapes incl. 1-pixel edge and >255 dims (multi-byte BE)
        w = rnd.choice([1, 2, 7, 16, 33, 64, 120, 257, 300])
        h = rnd.choice([1, 3, 8, 20, 48, 90, 256])
        content = png(w, h, rnd)
        rows["asset_id"].append(1000000 + i)
        rows["content"].append(content)
        rows["true_width"].append(w)
        rows["true_height"].append(h)
        rows["true_bit_depth"].append(8)
        rows["true_n_bytes"].append(len(content))
        rows["true_byte_sum"].append(sum(content))
        rows["true_byte_max"].append(max(content))
    table = pa.table({
        "asset_id": pa.array(rows["asset_id"], pa.int64()),
        "content": pa.array(rows["content"], pa.binary()),
        "true_width": pa.array(rows["true_width"], pa.int64()),
        "true_height": pa.array(rows["true_height"], pa.int64()),
        "true_bit_depth": pa.array(rows["true_bit_depth"], pa.int64()),
        "true_n_bytes": pa.array(rows["true_n_bytes"], pa.int64()),
        "true_byte_sum": pa.array(rows["true_byte_sum"], pa.int64()),
        "true_byte_max": pa.array(rows["true_byte_max"], pa.int64()),
    })
    pq.write_table(table, "fixtures/png_assets.parquet")
    print("wrote fixtures/png_assets.parquet:", table.num_rows, "rows")


if __name__ == "__main__":
    main()
