"""Real image RESIZE over binary payloads — the transform step of the
multimodal brief (decode / feature-extract / RESIZE / frame-sample), stdlib
only like the codecs in operators/multimodal.py.

Lives in its own module (not multimodal.py) so adding it cannot re-stale
the eight driver-green multimodalq twins: it IMPORTS the pixel-pattern
helpers, it does not touch their file.

The kernel is a genuine byte-level round trip: parse the 24-bit BMP
(BITMAPINFOHEADER, bottom-up BGR rows, 4-byte padding), nearest-neighbor
resample in image coordinates, re-encode a VALID BMP of the target
geometry. Downstream consumers (decode_bmp_stats) read the resized payload
with the ordinary decoder — nothing about the output is synthetic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def resize_bmp_nn(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """(doc_id, payload) -> (doc_id, payload): nearest-neighbor resize of a
    24-bit uncompressed BMP to (out_w, out_h). Source pixel for target
    (x2, y2) is (x2*W // out_w, y2*H // out_h) in image coordinates — the
    standard floor mapping, closed-form mirrorable in SQL."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                raw = bytes(p)
                assert raw[:2] == b"BM"
                off = struct.unpack_from("<I", raw, 10)[0]
                w, h = struct.unpack_from("<ii", raw, 18)
                bpp = struct.unpack_from("<H", raw, 28)[0]
                assert bpp == 24 and w > 0 and h > 0
                row_len = (w * 3 + 3) & ~3
                # decode to image-coordinate rows (file stores bottom-up)
                px = [
                    raw[off + (h - 1 - y) * row_len : off + (h - 1 - y) * row_len + w * 3]
                    for y in range(h)
                ]
                out_row_len = (out_w * 3 + 3) & ~3
                img_size = out_row_len * out_h
                header = struct.pack(
                    "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
                ) + struct.pack(
                    "<IiiHHIIiiII",
                    40, out_w, out_h, 1, 24, 0, img_size, 2835, 2835, 0, 0,
                )
                rows = []
                for y2 in range(out_h - 1, -1, -1):  # re-encode bottom-up
                    sy = y2 * h // out_h
                    row = bytearray()
                    for x2 in range(out_w):
                        sx = x2 * w // out_w
                        row += px[sy][sx * 3 : sx * 3 + 3]
                    row += b"\x00" * (out_row_len - len(row))
                    rows.append(bytes(row))
                payloads.append(header + b"".join(rows))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return df.select("doc_id", "payload").mapInPandas(
        kernel, "doc_id long, payload binary"
    )
