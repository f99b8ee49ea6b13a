"""Pseudo-embedding pandas UDF — the deterministic stand-in for the
reference's two Azure OpenAI calls per page (AzureSearchIndexer.cs:185-191).
Input is truncated to 8,000 chars inside the kernel (the reference embeds
the truncated text but stores full content — same here)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from ..core.embed import DEFAULT_DIM, pseudo_embed


def make_embed_udf(dim: int = DEFAULT_DIM):
    @F.pandas_udf(ArrayType(FloatType(), containsNull=False))
    def embed_udf(text: pd.Series) -> pd.Series:
        return pd.Series([pseudo_embed(t, dim).tolist() for t in text])

    return embed_udf
