"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not in this container, so the
decode step is STUBBED (deterministic fake features behind a flag /
NotImplementedError for real decode) — but the Spark-side plumbing is
real and tested: binary columns flow through Arrow into `mapInPandas`
batches, metadata extraction is vectorized, partitioning by media type
keeps decode batches homogeneous.

The corpus `html` binary column stands in for the media payload (the
plumbing is payload-agnostic: bytes in, features out).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tesserae_ng_spark.operators import register
from tesserae_ng_spark.sources.corpus import synthesize_corpus

REAL_DECODE = False  # no image/audio libs in this container

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("magic", T.StringType(), True),
        # driver-facing: the feature vector crosses as a rounded CSV string
        # (flat scalar) — the correctness gate's canonicalizer sorts/hashes
        # rows and cannot factorize list cells. Real pipelines would keep
        # array<float>; the plumbing (Arrow batch in/out) is identical.
        T.StructField("feature", T.StringType(), True),
    ]
)


def _feature_csv(vec: np.ndarray) -> str:
    return ",".join(f"{x:.6f}" for x in vec)


def decode_and_featurize(payload: bytes) -> np.ndarray:
    """Decode a media payload and extract a feature vector.

    STUB: real decode (PIL/libav/...) is unavailable here. The fake is
    deterministic — an 8-dim byte-histogram sketch — so tests pin exact
    outputs while the batch shape / schema / partitioning stay real.
    """
    if REAL_DECODE:  # pragma: no cover
        raise NotImplementedError("media decode libs not present in this container")
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist = np.bincount(arr >> 5, minlength=8).astype(np.float32)
    total = float(hist.sum()) or 1.0
    return hist / total


@register("media_feature_extract", None)  # binary plumbing → rows-only check
def media_feature_extract(spark, sf):
    """binary column → metadata + feature vector via mapInPandas.

    mapInPandas (not a scalar UDF) because real decoders want batch-level
    control (shared decoder state, per-batch model init) and may change
    row cardinality (e.g. video frame sampling emits N rows per input).
    """
    corpus = synthesize_corpus(spark, sf).select("url", "html")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["html"]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "n_bytes": payloads.map(lambda b: len(b or b"")).astype("int64"),
                    "magic": payloads.map(
                        lambda b: bytes(b[:4]).hex() if b is not None else None
                    ),
                    "feature": payloads.map(
                        lambda b: _feature_csv(decode_and_featurize(bytes(b)))
                    ),
                }
            )

    return corpus.mapInPandas(extract, FEATURE_SCHEMA)


@register("media_frame_sample", None)  # cardinality-changing decode → rows-only
def media_frame_sample(spark, sf):
    """Frame-sampling shape: one input row → K output rows (video analog).

    Deterministic fake: K = min(3, n_bytes // 1000) 'frames' per payload,
    each a slice-sketch. Real implementation would decode + sample frames.
    """
    corpus = synthesize_corpus(spark, sf).select("url", "html")
    out_schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("feature", T.StringType(), True),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs, feats = [], [], []
            for url, payload in zip(pdf["url"], pdf["html"]):
                data = bytes(payload or b"")
                k = min(3, max(1, len(data) // 1000))
                step = max(1, len(data) // k)
                for i in range(k):
                    urls.append(url)
                    idxs.append(i)
                    feats.append(
                        _feature_csv(decode_and_featurize(data[i * step : (i + 1) * step]))
                    )
            yield pd.DataFrame({"url": urls, "frame_idx": idxs, "feature": feats})

    return corpus.mapInPandas(sample, out_schema)
