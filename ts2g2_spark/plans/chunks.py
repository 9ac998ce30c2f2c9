"""Compressed chunk stage: tokens -> (ts_dod, val_gorilla) binary columns.

Arrow-batched mapInPandas over the row-local series (no shuffle); decode is
the exact inverse, giving the pinned per-row token-array-equality invariant
(BASELINE.json input_hint).  Chunking: one chunk per (doc, chunk window) so
a chunk's byte size stays bounded regardless of series length.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ts2g2_spark.functions import codecs
from ts2g2_spark.plans.points import BASE_EPOCH

CHUNK_SCHEMA = (
    "doc_id string, source string, chunk_id int, chunk_ts timestamp, "
    "n int, ts_dod binary, val_gorilla binary"
)
DECODE_SCHEMA = "doc_id string, tokens array<int>, n_tok int"


def compress_chunks(
    df: DataFrame,
    step_seconds: int = 1,
    base_epoch: int = BASE_EPOCH,
    chunk_points: int = 4096,
    positions_col: str | None = None,
) -> DataFrame:
    has_pos = positions_col is not None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                toks = np.asarray(row.tokens, dtype=np.int64)
                pos = (np.asarray(getattr(row, positions_col), dtype=np.int64)
                       if has_pos else np.arange(len(toks), dtype=np.int64))
                ts = base_epoch + pos * step_seconds
                for ci in range(0, max(len(toks), 1), chunk_points):
                    t = toks[ci: ci + chunk_points]
                    s = ts[ci: ci + chunk_points]
                    rows.append({
                        "doc_id": row.doc_id,
                        "source": row.source,
                        "chunk_id": ci // chunk_points,
                        "chunk_ts": pd.to_datetime(
                            s[0] if len(s) else base_epoch, unit="s"),
                        "n": len(t),
                        "ts_dod": codecs.dod_encode(s),
                        "val_gorilla": codecs.gorilla_encode(
                            t.astype(np.float64)),
                    })
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, schema=CHUNK_SCHEMA)


def decompress_chunks(chunks: DataFrame) -> DataFrame:
    """Inverse: chunks -> (doc_id, tokens, n_tok). Exact reconstruction.

    applyInPandas (not mapInPandas): a doc's chunks must be reassembled
    whole, and grouped-UDF semantics guarantee the full group per call even
    when a stored chunk table was split across files/batches."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("chunk_id")
        toks = (
            np.concatenate(
                [codecs.gorilla_decode(b).astype(np.int32)
                 for b in g["val_gorilla"]]
            )
            if len(g)
            else np.empty(0, np.int32)
        )
        return pd.DataFrame(
            {"doc_id": [g["doc_id"].iloc[0]], "tokens": [toks],
             "n_tok": [len(toks)]}
        )

    return chunks.groupBy("doc_id").applyInPandas(
        kernel, schema=DECODE_SCHEMA)
