"""Generate the BMP-feature oracle fixture WITHOUT decoding any BMP bytes.

The synth encoder (mopper_spark.textops.multimodal.synth_bmp_payload)
writes pixels from the closed-form formula ``synth_bmp_pixel`` through the
real on-disk BMP layout (bottom-up rows, BGR order, 4-byte row padding).
This oracle re-derives the expected features **from the formula alone** —
it never touches headers, padding, or row order — so the Spark kernel
(`multimodal_bmp_features`) only matches if its decoder genuinely
round-trips the encoder output.

The width/height parameters are restated here from the synth docstring
rather than imported, keeping the derivation independent of the encoder's
code path.

Usage: python scripts/gen_bmp_oracle.py [n]
"""

import sys

import pyarrow as pa
import pyarrow.parquet as pq

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
SEED = 11


def pixel(media_id, x, y, c):
    return (x * 11 + y * 17 + c * 23 + media_id * 37 + SEED * 19) % 256


rows = {k: [] for k in ("media_id", "width", "height", "bpp",
                        "n_px", "sum_b", "sum_g", "sum_r")}
for m in range(N):
    w = 5 + m % 6
    h = 3 + (m * 3) % 5
    sums = [0, 0, 0]
    for y in range(h):
        for x in range(w):
            for c in range(3):
                sums[c] += pixel(m, x, y, c)
    rows["media_id"].append(m)
    rows["width"].append(w)
    rows["height"].append(h)
    rows["bpp"].append(24)
    rows["n_px"].append(w * h)
    rows["sum_b"].append(sums[0])
    rows["sum_g"].append(sums[1])
    rows["sum_r"].append(sums[2])

table = pa.table(
    {
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "width": pa.array(rows["width"], pa.int32()),
        "height": pa.array(rows["height"], pa.int32()),
        "bpp": pa.array(rows["bpp"], pa.int32()),
        "n_px": pa.array(rows["n_px"], pa.int64()),
        "sum_b": pa.array(rows["sum_b"], pa.int64()),
        "sum_g": pa.array(rows["sum_g"], pa.int64()),
        "sum_r": pa.array(rows["sum_r"], pa.int64()),
    }
)
pq.write_table(table, "fixtures/bmp_features.parquet")
print(f"wrote fixtures/bmp_features.parquet ({N} rows)")
