"""Multimodal column plumbing (north-star extension; BASELINE.json).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The decode step runs as Arrow-batched ``mapInPandas`` — the
only correct place for per-record Python in this engine — with the
schema, partitioning, UDF signature and batch shape all real.

The actual pixel/sample decode is STUBBED: this container ships no
image/audio libraries, so ``decode_image_real`` raises
NotImplementedError unless PIL is importable, and the tested path uses
``fake_decode_dims`` — a deterministic function of the bytes that the
DuckDB oracle reproduces, which is exactly what lets the gate verify
the Spark-side plumbing end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

try:  # real codec, absent in this container — import-gated by design
    from PIL import Image  # type: ignore
except ImportError:  # pragma: no cover
    Image = None

IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes int, sha256 string, magic string, "
    "width int, height int, channels int"
)


def fake_decode_dims(data: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for image dimension decode:
    width  = n_bytes % 640 + 1
    height = (n_bytes * 7) % 480 + 1
    channels = 3
    (pure arithmetic on the byte length — reproducible in ANSI SQL)."""
    n = len(data)
    return n % 640 + 1, (n * 7) % 480 + 1, 3


def decode_image_real(data: bytes) -> tuple[int, int, int]:  # pragma: no cover
    """Real decode path: requires an image library at deploy time."""
    if Image is None:
        raise NotImplementedError(
            "image decode requires PIL/pillow on the executors; "
            "this environment ships none (stub: fake_decode_dims)"
        )
    import io

    with Image.open(io.BytesIO(data)) as im:
        return im.width, im.height, len(im.getbands())


def _magic(data: bytes) -> str:
    """Cheap content sniff on leading bytes (jpeg/png/else)."""
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    return "bin"


def decode_image_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, content: bytes) → image metadata.
    One output row per input row, vectorized per Arrow batch; executors
    never hold more than one batch (spark.sql.execution.arrow
    maxRecordsPerBatch bounds memory at any scale)."""
    for pdf in batches:
        content = pdf["content"]
        dims = content.map(fake_decode_dims)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": content.map(len).astype("int32"),
                "sha256": content.map(lambda b: hashlib.sha256(b).hexdigest()),
                "magic": content.map(_magic),
                "width": dims.map(lambda t: t[0]).astype("int32"),
                "height": dims.map(lambda t: t[1]).astype("int32"),
                "channels": dims.map(lambda t: t[2]).astype("int32"),
            }
        )
