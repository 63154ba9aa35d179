"""Unicode normalization over text columns — Arrow-batched mapInPandas.

Corpus text arrives in mixed normalization forms (decomposed combining
sequences from OCR/legacy encoders vs composed NFC); tokenizers and
exact-dedup hashes treat "café" (e + U+0301) and "café" (U+00E9) as
different strings unless the pipeline canonicalizes first, silently
splitting counts and missing duplicates. NFC is the standard canonical
form (Unicode TR15).

Spark has no normalization builtin, so this is the honest Arrow path:
one ``mapInPandas`` pass batching rows through Python's ``unicodedata``
(the same tier as functions/multimodal.py codecs — vectorized Arrow
transfer, never a row-at-a-time F.udf). Shuffle-free: rides the scan
stage. Cross-engine contract: Python's unicodedata NFC and DuckDB's
``nfc_normalize`` implement the same Unicode algorithm — the paired
oracle compares every normalized byte via md5 folds.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

__all__ = ["normalize_nfc"]


def normalize_nfc(df: DataFrame, text_col: str, out_col: str) -> DataFrame:
    """Append ``out_col`` = NFC(text_col). One mapInPandas over Arrow
    record batches; all other columns pass through untouched."""
    # fresh StructType — StructType.add MUTATES in place, and mutating
    # df.schema makes the plan claim a column it cannot resolve
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, StringType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import unicodedata

        for pdf in it:
            pdf[out_col] = [
                unicodedata.normalize("NFC", s) if s is not None else None
                for s in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(batches, schema=schema)
