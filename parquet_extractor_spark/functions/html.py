"""HTML entity unescape (SURVEY §2.8 F8; api.py:312-317).

No Spark builtin exists; this is the canonical "small Python kernel"
case — an Arrow-vectorized pandas_udf, NOT a row-at-a-time F.udf.
"""

from __future__ import annotations

import html

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _unescape_batch(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: html.unescape(t) if t is not None else None)


unescape_html = pandas_udf(_unescape_batch, returnType=StringType())
