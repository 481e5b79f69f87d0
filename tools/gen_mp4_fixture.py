#!/usr/bin/env python3
"""Generate fixtures/mp4_assets.parquet: small REAL ISO-BMFF (MP4)
files (ftyp / free / mdat / moov box tree with mvhd, trak, tkhd, mdia
stubs) with the ground-truth header fields stored alongside as ordinary
columns.

The Spark side walks the box tree and parses timescale / duration /
track-id / width / height OUT OF THE BYTES (MultiModal.mp4Meta); the
oracle simply selects the stored truth — construction and parsing are
independent code paths, so agreement is a genuine decode check.

Adversarial constructions on purpose:
  - 'free' box payloads BEFORE moov deliberately contain the ASCII
    bytes "moov" and "tkhd" — a naive byte-position scan finds the
    decoys; only a real box-size walk survives;
  - ~half the rows put mdat before moov (progressive layout) and the
    rest after (fast-start), so moov's offset varies widely;
  - inside moov, a random number of free boxes around mvhd, and for
    some rows trak precedes mvhd (box order is not mandated);
  - inside trak, sometimes a free box before tkhd;
  - tkhd width/height are 16.16 fixed point, some with a nonzero
    fractional part — the truth stores the integer part the reader
    must extract;
  - durations over timescales 600/1000/44100/90000 so the ms
    conversion exercises exact floor division.

Deterministic: seed 4242.
"""
import random
import struct

import pyarrow as pa
import pyarrow.parquet as pq


def box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + fourcc + payload


def free(rnd: random.Random, decoy: bool) -> bytes:
    filler = bytes(rnd.randrange(256) for _ in range(rnd.randrange(4, 40)))
    if decoy:
        filler = b"moov" + filler + b"tkhd" + struct.pack(">I", 108)
    return box(b"free", filler)


def mvhd(timescale: int, duration: int) -> bytes:
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    p = (struct.pack(">I", 0)            # version 0 + flags
         + struct.pack(">II", 3600, 3600)  # ctime, mtime
         + struct.pack(">II", timescale, duration)
         + struct.pack(">i", 0x10000)    # rate 1.0
         + struct.pack(">h", 0x0100)     # volume 1.0
         + bytes(10)                     # reserved
         + matrix + bytes(24)            # pre_defined
         + struct.pack(">I", 2))         # next_track_ID
    return box(b"mvhd", p)


def tkhd(track_id: int, duration: int, w16: int, h16: int) -> bytes:
    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    p = (struct.pack(">I", 7)            # version 0 + flags (enabled|in movie)
         + struct.pack(">II", 3600, 3600)
         + struct.pack(">I", track_id) + bytes(4)
         + struct.pack(">I", duration) + bytes(8)
         + struct.pack(">hhh", 0, 0, 0) + bytes(2)
         + matrix
         + struct.pack(">II", w16, h16))  # 16.16 fixed point
    return box(b"tkhd", p)


def mp4(rnd: random.Random, timescale: int, duration: int, track_id: int,
        w16: int, h16: int) -> bytes:
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = box(b"mdat", bytes(rnd.randrange(256)
                              for _ in range(rnd.randrange(16, 200))))
    trak_children = [tkhd(track_id, duration, w16, h16),
                     box(b"mdia", free(rnd, False))]
    if rnd.random() < 0.3:
        trak_children.insert(0, free(rnd, False))
    trak = box(b"trak", b"".join(trak_children))
    moov_children = [mvhd(timescale, duration), trak]
    if rnd.random() < 0.4:
        moov_children.reverse()          # trak before mvhd
    if rnd.random() < 0.5:
        moov_children.insert(rnd.randrange(len(moov_children) + 1),
                             free(rnd, False))
    moov = box(b"moov", b"".join(moov_children))
    parts = [ftyp]
    for _ in range(rnd.randrange(0, 3)):
        parts.append(free(rnd, True))    # decoy 'moov'/'tkhd' bytes
    if rnd.random() < 0.5:
        parts += [mdat, moov]            # progressive layout
    else:
        parts += [moov, mdat]            # fast-start layout
    return b"".join(parts)


def main():
    rnd = random.Random(4242)
    cols = {k: [] for k in ("asset_id", "content", "true_timescale",
                            "true_duration_ms", "true_track_id",
                            "true_width", "true_height", "true_n_bytes")}
    for i in range(300):
        timescale = rnd.choice([600, 1000, 44100, 90000])
        duration = rnd.randrange(1, 10 * timescale)
        track_id = rnd.randrange(1, 100)
        w = rnd.choice([1, 120, 255, 256, 640, 1280, 1920, 3840])
        h = rnd.choice([1, 90, 240, 255, 480, 720, 1080, 2160])
        wfrac = rnd.choice([0, 0, 0, 0x8000])
        hfrac = rnd.choice([0, 0, 0, 0x4000])
        content = mp4(rnd, timescale, duration, track_id,
                      (w << 16) | wfrac, (h << 16) | hfrac)
        cols["asset_id"].append(3000000 + i)
        cols["content"].append(content)
        cols["true_timescale"].append(timescale)
        cols["true_duration_ms"].append(duration * 1000 // timescale)
        cols["true_track_id"].append(track_id)
        cols["true_width"].append(w)
        cols["true_height"].append(h)
        cols["true_n_bytes"].append(len(content))
    table = pa.table({
        "asset_id": pa.array(cols["asset_id"], pa.int64()),
        "content": pa.array(cols["content"], pa.binary()),
        "true_timescale": pa.array(cols["true_timescale"], pa.int64()),
        "true_duration_ms": pa.array(cols["true_duration_ms"], pa.int64()),
        "true_track_id": pa.array(cols["true_track_id"], pa.int64()),
        "true_width": pa.array(cols["true_width"], pa.int64()),
        "true_height": pa.array(cols["true_height"], pa.int64()),
        "true_n_bytes": pa.array(cols["true_n_bytes"], pa.int64()),
    })
    pq.write_table(table, "fixtures/mp4_assets.parquet")
    print("wrote fixtures/mp4_assets.parquet:", table.num_rows, "rows")


if __name__ == "__main__":
    main()
