#!/usr/bin/env python3
"""Generate fixtures/wav_assets.parquet: small REAL canonical-header
PCM WAV files (RIFF/WAVE/fmt/data chunks, little-endian fields) with
ground-truth header fields stored alongside. The Spark side parses
sample-rate/channels/bits/duration OUT OF THE BYTES
(MultiModal.decodeMeta); the oracle selects the stored truth.
true_width/true_height replicate the md5-stub arm (WAV has no
spatial dims — those columns stay on the documented stub path).
Deterministic: seed 11."""
import hashlib
import random
import struct

import pyarrow as pa
import pyarrow.parquet as pq


def wav(n_frames: int, rate: int, ch: int, bits: int, rnd: random.Random) -> bytes:
    bytes_per_sample = bits // 8
    block_align = ch * bytes_per_sample
    byte_rate = rate * block_align
    data = bytes(rnd.randrange(256) for _ in range(n_frames * block_align))
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate, byte_rate,
                                   block_align, bits)
           + b"data" + struct.pack("<I", len(data)))
    assert len(hdr) == 44
    return hdr + data


def stub_dim(content: bytes, lo: int, hi: int) -> int:
    h = hashlib.md5(content).hexdigest()
    return int(h[lo:hi], 16) % 240 + 16


def pcm_samples(data: bytes, bits: int):
    """Decode the data chunk's PCM samples: 16-bit signed LE frames, or
    8-bit unsigned centered at 128 (the WAV conventions). Ground truth
    for the Spark-side byte-level sample decode (q123)."""
    if bits == 16:
        return list(struct.unpack("<%dh" % (len(data) // 2), data))
    return [b - 128 for b in data]


def main():
    rnd = random.Random(11)
    cols = {k: [] for k in ("asset_id", "content", "true_sample_rate",
                            "true_channels", "true_bits", "true_duration_ms",
                            "true_n_bytes", "true_byte_sum", "true_byte_max",
                            "true_width", "true_height", "true_n_samples",
                            "true_sample_sum", "true_sample_peak")}
    for i in range(200):
        rate = rnd.choice([8000, 16000, 22050, 44100, 48000])
        ch = rnd.choice([1, 2])
        bits = rnd.choice([8, 16])
        n_frames = rnd.randrange(50, 2000)
        content = wav(n_frames, rate, ch, bits, rnd)
        data_len = len(content) - 44
        byte_rate = rate * ch * bits // 8
        samples = pcm_samples(content[44:], bits)
        cols["asset_id"].append(2000000 + i)
        cols["content"].append(content)
        cols["true_sample_rate"].append(rate)
        cols["true_channels"].append(ch)
        cols["true_bits"].append(bits)
        cols["true_duration_ms"].append(data_len * 1000 // byte_rate)
        cols["true_n_bytes"].append(len(content))
        cols["true_byte_sum"].append(sum(content))
        cols["true_byte_max"].append(max(content))
        cols["true_width"].append(stub_dim(content, 0, 7))
        cols["true_height"].append(stub_dim(content, 7, 14))
        cols["true_n_samples"].append(len(samples))
        cols["true_sample_sum"].append(sum(samples))
        cols["true_sample_peak"].append(max(abs(s) for s in samples))
    table = pa.table({k: pa.array(v, pa.binary() if k == "content" else pa.int64())
                      for k, v in cols.items()})
    pq.write_table(table, "fixtures/wav_assets.parquet")
    print("wrote fixtures/wav_assets.parquet:", table.num_rows, "rows")


if __name__ == "__main__":
    main()
