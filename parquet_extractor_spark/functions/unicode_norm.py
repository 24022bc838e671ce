"""Unicode NFC normalization (extension beyond the reference's ASCII
scrub, functions/text.py F9 — real multilingual corpora arrive with
mixed composed/decomposed forms, and every dedup/hash tier upstream
assumes one canonical byte encoding per grapheme).

No Spark builtin exists; like the HTML unescape kernel this is an
Arrow-vectorized pandas_udf over Python's unicodedata (the reference
NFC implementation). DuckDB's ``nfc_normalize`` implements the same
Unicode algorithm, so normalized output — and therefore its md5 — is
byte-identical across engines and oracle-checkable, PROVIDED both
runtimes carry comparable Unicode data versions: a codepoint assigned
(or given a combining class) in one version but not the other
normalizes differently, so an engine upgrade that moves only one
side's Unicode tables can break hash parity on text containing such
codepoints. The oracle gate would surface it as an nfc_md5 mismatch.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _nfc_batch(texts: pd.Series) -> pd.Series:
    return texts.map(
        lambda t: unicodedata.normalize("NFC", t) if t is not None else None
    )


nfc_normalize = pandas_udf(_nfc_batch, returnType=StringType())
