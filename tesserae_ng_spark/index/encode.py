"""Stage A block encoding: per-shard postings → compressed block rows.

Runs inside one shard's build job (index/builder.py): the shard's
(term, doc_id, tf, dl, positions) postings are grouped by term and encoded
into 128-doc blocks (delta+varint; index/codec.py) via ``applyInPandas``
— the Arrow-grouped-map path, no per-row Python.

Shard blocks carry tf/dl but NO scores: idf needs global df, which only
exists after all shards are built — stage B (index/merge.py) attaches
scores and block-max metadata during the merge.

Scale note: within one shard, a head term's group is bounded by the shard's
doc count (corpus_partitions >> 1 at 10^12 docs keeps groups in memory);
the global head-term problem is handled by the salted merge, not here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tesserae_ng_spark.index.codec import delta_encode_ids, varint_encode
from tesserae_ng_spark.schemas import BLOCK_SIZE

SHARD_BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("tf_sum", T.LongType(), False),
        T.StructField("block_first_doc", T.LongType(), False),
        T.StructField("block_last_doc", T.LongType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
        T.StructField("positions", T.BinaryType(), True),
    ]
)


def encode_term_group(pdf: pd.DataFrame, block_size: int = BLOCK_SIZE) -> pd.DataFrame:
    """One term's shard postings → block rows. Pure function (testable).

    ``positions`` arrives as per-posting varint byte slices (already in the
    final stream layout — build.py sliced them JVM-side), so a block's
    positions column is a plain byte join: no numeric re-encode.
    """
    pdf = pdf.sort_values("doc_id", kind="mergesort")
    term = pdf["term"].iloc[0]
    doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)
    pos_col = pdf["positions"]
    has_pos = pos_col.iloc[0] is not None if len(pdf) else False
    pos_chunks = pos_col.tolist() if has_pos else None
    rows = []
    for b, start in enumerate(range(0, len(pdf), block_size)):
        sl = slice(start, min(start + block_size, len(pdf)))
        ids, tf_b, dl_b = doc_ids[sl], tfs[sl], dls[sl]
        rows.append(
            {
                "term": term,
                "block_id": b,
                "n_docs": len(ids),
                "tf_sum": int(tf_b.sum()),
                "block_first_doc": int(ids[0]),
                "block_last_doc": int(ids[-1]),
                "doc_ids": delta_encode_ids(ids),
                "tfs": varint_encode(tf_b.astype(np.uint64)),
                "dls": varint_encode(dl_b.astype(np.uint64)),
                "positions": (
                    b"".join(bytes(c) for c in pos_chunks[sl.start : sl.stop])
                    if has_pos
                    else None
                ),
            }
        )
    return pd.DataFrame(rows)


def encode_shard_blocks(term_doc_dl: DataFrame, block_size: int = BLOCK_SIZE) -> DataFrame:
    """(term, doc_id, tf, dl, positions) → shard block rows.

    One exchange keyed by term, then partition-sorted grouped encoding
    (index/grouped.py): Arrow cost is per batch, not per term group —
    per-group applyInPandas plumbing dominated the stage on realistic
    (10k+ term) dictionaries."""
    from tesserae_ng_spark.index.grouped import grouped_map_sorted

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return encode_term_group(pdf, block_size)

    return grouped_map_sorted(
        term_doc_dl, ["term"], fn, SHARD_BLOCK_SCHEMA
    )
