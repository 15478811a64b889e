"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched pandas
UDFs over ``mapInPandas``. The media libraries are not present in this
container, so the decode step is STUBBED: ``decoder=None`` raises
NotImplementedError at call time, and tests inject a deterministic fake
decoder. Everything Spark-side — schema, batch iteration, partitioning,
UDF signatures — is real and tested.

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

    ``decoder`` is the pluggable media stub — pass a real one where PIL /
    ffmpeg exist. Raises NotImplementedError (clearly marked) when missing.
    """
    if decoder is None:
        raise NotImplementedError(
            f"media {batch_note} requires a decoder; none is available in this "
            "environment — inject a Decoder (bytes -> dict) or use "
            "deterministic_fake_decoder for plumbing tests"
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

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


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
    through mapInPandas. ``frame_decoder`` is the pluggable stub — inject a
    real ffmpeg-backed one where available; raises NotImplementedError here
    (no media libs in this environment). Frames are sampled inside the UDF,
    so dropped frames never cross the Arrow boundary.
    """
    if frame_decoder is None:
        raise NotImplementedError(
            "frame sampling requires a frame decoder; none is available in "
            "this environment — inject a FrameDecoder (bytes -> list[dict]) "
            "or use deterministic_fake_frame_decoder for plumbing tests"
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

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)


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
