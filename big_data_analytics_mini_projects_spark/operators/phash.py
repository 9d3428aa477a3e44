"""Perceptual image hashing (dHash) over binary image payloads — the
multimodal leg of the dedup suite (round-9 verdict item 2).

The kernel is a genuine byte-level computation: parse the 24-bit BMP
(BITMAPINFOHEADER, bottom-up BGR rows, 4-byte padding — the same container
operators/multimodal.synth_bmp_payloads writes and decode_bmp_stats reads),
sample a fixed gray grid with the floor nearest-neighbor map (the
operators/multimodal_resize convention), and emit the difference hash:
bit(x, y) = gray(x+1, y) > gray(x, y).

Geometry: a ``grid_w x grid_h`` gray grid gives ``(grid_w-1) * grid_h``
bits. The default 7x10 grid yields 60 bits — deliberately 60, not the
classic 9x8=64: 60-bit values stay exact in a signed BIGINT in BOTH
engines (the operators/similarity.BIT_POWERS rationale) and split into
the same 4x15-bit blocks the SimHash index uses, so the Hamming blocking
downstream is shared machinery (pairs within Hamming <= 3 must share a
block by pigeonhole; the verify gate is bit_count(xor)).

Gray is the channel sum r+g+b (order-free, exact integer) — monotone in
luminance for the synthetic gradient payloads and closed-form mirrorable
in SQL, which is what makes the REAL byte path differentially testable.

Lives in its own module (not multimodal.py / similarity.py) so adding it
cannot re-stale their driver-green consumers.

Scale notes: mapInPandas streams Arrow batches — per-row work is bounded
by the grid (70 samples), payloads never round-trip through Python rows,
zero shuffle. The downstream dedup (plans/round16q.dedup_image_phash)
collapses exact hash classes FIRST (one groupBy) and Hamming-joins only
the distinct-hash roster — the production order for a 100 TB image corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

#: Default dHash grid: 7 gray columns x 10 rows -> 6*10 = 60 bits.
PH_GRID_W = 7
PH_GRID_H = 10
PH_BITS = (PH_GRID_W - 1) * PH_GRID_H
PH_BLOCK_BITS = 15
PH_N_BLOCKS = PH_BITS // PH_BLOCK_BITS


def dhash_bmp(df: DataFrame, grid_w: int = PH_GRID_W, grid_h: int = PH_GRID_H) -> DataFrame:
    """(doc_id, payload) -> (doc_id, dhash): difference hash of a 24-bit
    uncompressed BMP. Gray grid sampled at (x*w // grid_w, y*h // grid_h)
    in image coordinates (floor NN map); bit index y*(grid_w-1) + x set
    when gray(x+1, y) > gray(x, y)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            hashes = []
            for p in pdf["payload"]:
                raw = bytes(p)
                assert raw[:2] == b"BM"
                off = struct.unpack_from("<I", raw, 10)[0]
                w, h = struct.unpack_from("<ii", raw, 18)
                bpp = struct.unpack_from("<H", raw, 28)[0]
                assert bpp == 24 and w > 0 and h > 0
                row_len = (w * 3 + 3) & ~3
                hsh = 0
                for yr in range(grid_h):
                    sy = yr * h // grid_h
                    base = off + (h - 1 - sy) * row_len  # file rows bottom-up
                    prev = -1
                    for xc in range(grid_w):
                        sx3 = (xc * w // grid_w) * 3
                        g = raw[base + sx3] + raw[base + sx3 + 1] + raw[base + sx3 + 2]
                        if xc and g > prev:
                            hsh |= 1 << (yr * (grid_w - 1) + (xc - 1))
                        prev = g
                hashes.append(hsh)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "dhash": pd.array(hashes, dtype="int64")}
            )

    return df.select("doc_id", "payload").mapInPandas(kernel, "doc_id long, dhash long")
