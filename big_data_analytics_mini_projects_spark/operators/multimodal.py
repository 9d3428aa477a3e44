"""Multimodal column plumbing (beyond-reference suite).

Images/audio/video are opaque ``binary`` columns with typed metadata; decode
and feature-extraction run as Arrow-batched pandas UDFs over ``mapInPandas``.
The actual codec libraries (PIL/soundfile/av) are NOT in this container, so
the decode kernels are stubbed behind import guards with clearly marked
NotImplementedError — but the Spark-side plumbing (schemas, binary payloads,
batch iteration, one-to-many expansion) is real and differentially tested via
a deterministic fake decoder whose outputs are reproducible in SQL.

Scale notes: mapInPandas streams Arrow batches — memory is bounded by batch
size (spark.sql.execution.arrow.maxRecordsPerBatch), not partition size;
binary payloads never round-trip through Python rows. Partition by storage
locality before decode so each task reads contiguous blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

META_SCHEMA = "doc_id long, byte_len long, sig string, fake_width long, fake_height long"
FRAMES_SCHEMA = "doc_id long, frame_idx long, frame_sig string"

try:  # real decoders need libs absent from this container
    import PIL.Image  # type: ignore  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def decode_image(payload: bytes):
    """Real image decode — STUB: PIL is not available in this environment."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL, which is not installed in this "
            "container; the pipeline plumbing is exercised via the "
            "deterministic fake decoder (extract_binary_meta)."
        )
    raise NotImplementedError("real decode path reserved for environments with PIL")


def decode_audio(payload: bytes):
    """Real audio decode — STUB (soundfile/librosa not installed)."""
    raise NotImplementedError(
        "audio decoding requires soundfile, not installed here; "
        "plumbing exercised via extract_binary_meta."
    )


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque binary column (here: utf-8 bytes of text standing in
    for an image payload)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_binary_meta(df: DataFrame) -> DataFrame:
    """Deterministic fake 'decode': byte length, md5 signature, fake
    dimensions derived from the signature — the exact shape a real
    image-metadata extractor has (bytes in, typed struct out)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            digests = [hashlib.md5(p).hexdigest() for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": [len(p) for p in payloads],
                    "sig": [d[:8] for d in digests],
                    "fake_width": [int(d[8:12], 16) % 1024 for d in digests],
                    "fake_height": [int(d[12:16], 16) % 1024 for d in digests],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(kernel, META_SCHEMA)


def sample_frames(df: DataFrame) -> DataFrame:
    """One-to-many frame sampling (video-style UDTF shape): each payload
    yields (byte_len % 3) + 1 deterministic fake frames."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(p)
                n = (len(payload) % 3) + 1
                for i in range(n):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    sigs.append(
                        hashlib.md5(payload + f":{i}".encode()).hexdigest()[:8]
                    )
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_sig": sigs})

    return df.select("doc_id", "payload").mapInPandas(kernel, FRAMES_SCHEMA)
