"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched pandas
UDFs over ``mapInPandas``. Decoders resolve at call time via optional
imports: where Pillow (images) or PyAV (video) is installed,
``decoder=None`` picks the real library-backed decoder automatically;
where neither exists (this container), it raises a clearly-marked
NotImplementedError and tests inject a deterministic fake decoder.
Everything Spark-side — schema, batch iteration, partitioning, UDF
signatures — is real and tested either way.

Scale: payload bytes never hit the driver; ``mapInPandas`` streams Arrow
batches through the Python workers, and metadata-only queries prune the
binary column out of the parquet scan entirely.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# metadata struct carried next to every payload column
MEDIA_META_SCHEMA = (
    "media_type string, n_bytes long, content_md5 string"
)

FEATURE_SCHEMA = "doc_id long, width int, height int, n_frames int, feature array<float>"

# decoder: payload bytes -> dict(width, height, n_frames, feature list[float])
Decoder = Callable[[bytes], dict]


def with_media_metadata(
    df: DataFrame, payload_col: str = "payload", media_type: str = "application/octet-stream"
) -> DataFrame:
    """Attach the typed metadata struct (computed JVM-side, no UDF)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(payload_col).alias("n_bytes"),
            F.md5(payload_col).alias("content_md5"),
        ),
    )


def extract_features(
    df: DataFrame,
    decoder: Decoder | None = None,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    batch_note: str = "decode",
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    ``decoder`` is pluggable; when None, :func:`pillow_image_decoder` is
    used if Pillow is importable, else NotImplementedError (clearly
    marked) — pass your own Decoder for other media libraries.
    """
    if decoder is None:
        decoder = _optional_pillow_decoder()
    if decoder is None:
        raise NotImplementedError(
            f"media {batch_note} requires a decoder and Pillow is not "
            "installed in this environment — inject a Decoder (bytes -> "
            "dict) or use deterministic_fake_decoder for plumbing tests"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "n_frames": [], "feature": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = decoder(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["width"].append(int(d.get("width", 0)))
                out["height"].append(int(d.get("height", 0)))
                out["n_frames"].append(int(d.get("n_frames", 1)))
                out["feature"].append([float(x) for x in d.get("feature", [])])
            yield pd.DataFrame(out)

    # NULL payloads and NULL ids are excluded JVM-side before the Arrow
    # boundary (same policy as similarity.valid_vectors): a 100 TB lake
    # contains both, and bytes(None) / int(None) would crash the whole
    # batch inside the UDF
    return (
        df.select(id_col, payload_col)
        .filter(F.col(payload_col).isNotNull() & F.col(id_col).isNotNull())
        .mapInPandas(run, FEATURE_SCHEMA)
    )


def _optional_pillow_decoder() -> Decoder | None:
    """Return the Pillow-backed image decoder if Pillow imports, else None.

    The import try lives in a factory (not module top-level) so the check
    happens on the executor-side code path only when a decode is actually
    requested, and the module stays importable everywhere.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return None
    return pillow_image_decoder


def pillow_image_decoder(payload: bytes) -> dict:
    """Real image decoder (requires Pillow): dimensions + frame count +
    an 8-bin grayscale-intensity histogram (mass-normalized) as the
    feature vector — deterministic for a given payload, cheap enough to
    run per row inside the Arrow batch loop."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        width, height = img.size
        n_frames = int(getattr(img, "n_frames", 1))
        hist = img.convert("L").histogram()  # 256 luminance bins
    total = float(sum(hist)) or 1.0
    feature = [sum(hist[i * 32 : (i + 1) * 32]) / total for i in range(8)]
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "feature": feature,
    }


def deterministic_fake_decoder(payload: bytes) -> dict:
    """Stand-in decoder: derives stable pseudo-features from the bytes.

    Lets the full pipeline (schema, batching, downstream similarity) run and
    be asserted on without any media library.
    """
    n = len(payload)
    head = payload[:8].ljust(8, b"\0")
    return {
        "width": 1 + head[0] % 64,
        "height": 1 + head[1] % 64,
        "n_frames": 1 + head[2] % 8,
        "feature": [((b % 16) - 8) / 8.0 for b in head],
    }


# -- video frame sampling ----------------------------------------------------

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string, feature array<float>"

# frame decoder: payload bytes -> list of dict(frame_idx, frame_md5, feature)
FrameDecoder = Callable[[bytes], list]


def sample_frames(
    df: DataFrame,
    frame_decoder: FrameDecoder | None = None,
    every: int = 2,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode a video payload into frames and keep every ``every``-th one.

    The 1->N fan-out shape of video pipelines: one binary row yields
    multiple frame rows (index, content hash, feature vector), Arrow-batched
    through mapInPandas. ``frame_decoder`` is pluggable; when None,
    :func:`pyav_frame_decoder` is used if PyAV is importable, else
    NotImplementedError. Frames are sampled inside the UDF, so dropped
    frames never cross the Arrow boundary.
    """
    if frame_decoder is None:
        frame_decoder = _optional_pyav_frame_decoder()
    if frame_decoder is None:
        raise NotImplementedError(
            "frame sampling requires a frame decoder and PyAV is not "
            "installed in this environment — inject a FrameDecoder "
            "(bytes -> list[dict]) or use "
            "deterministic_fake_frame_decoder for plumbing tests"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_md5": [], "feature": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for fr in frame_decoder(bytes(payload))[::every]:
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(int(fr["frame_idx"]))
                    out["frame_md5"].append(str(fr["frame_md5"]))
                    out["feature"].append([float(x) for x in fr["feature"]])
            yield pd.DataFrame(out)

    # NULL payloads / ids excluded JVM-side — see extract_features
    return (
        df.select(id_col, payload_col)
        .filter(F.col(payload_col).isNotNull() & F.col(id_col).isNotNull())
        .mapInPandas(run, FRAME_SCHEMA)
    )


def _optional_pyav_frame_decoder() -> FrameDecoder | None:
    """Return the PyAV-backed frame decoder if PyAV imports, else None."""
    try:
        import av  # noqa: F401
    except ImportError:
        return None
    return pyav_frame_decoder


def pyav_frame_decoder(payload: bytes) -> list:
    """Real video frame decoder (requires PyAV/ffmpeg): one row per frame
    with the frame bytes' md5 and an 8-bin luminance histogram feature —
    the same row shape as the deterministic fake."""
    import hashlib
    import io

    import av

    import numpy as np

    frames = []
    with av.open(io.BytesIO(payload)) as container:
        for i, frame in enumerate(container.decode(video=0)):
            gray = frame.reformat(format="gray").to_ndarray()
            hist = np.bincount((gray >> 5).ravel(), minlength=8)
            total = float(gray.size) or 1.0
            frames.append(
                {
                    "frame_idx": i,
                    "frame_md5": hashlib.md5(gray.tobytes()).hexdigest(),
                    "feature": [float(h) / total for h in hist],
                }
            )
    return frames


def deterministic_fake_frame_decoder(payload: bytes) -> list:
    """Stand-in frame decoder: md5-derived pseudo-frames.

    Every quantity is a pure function of the payload bytes through md5, so
    the DuckDB oracle can compute identical frames from the same payload
    (md5 -> frame count, per-frame md5 -> feature eighths, all exact in
    float). A real decoder returns the same row shape from actual frames.
    """
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    n_frames = 1 + int(h[0], 16) % 8
    frames = []
    for i in range(n_frames):
        fh = hashlib.md5(payload + str(i).encode()).hexdigest()
        frames.append(
            {
                "frame_idx": i,
                "frame_md5": fh,
                "feature": [(int(c, 16) - 8) / 8.0 for c in fh[:8]],
            }
        )
    return frames
