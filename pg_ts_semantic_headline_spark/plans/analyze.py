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
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

from ..functions.lexize import analyze_document, is_supported_config

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
        cfg = cfg if is_supported_config(cfg) else "simple"
        toks, lexs = analyze_document(text, cfg)
        toks_out.append(toks)
        lex_out.append(lexs)
    return pd.DataFrame({"tokens": toks_out, "lexemes": lex_out})


analyze_udf = F.pandas_udf(_analyze_batch, returnType=ANALYSIS_SCHEMA)

DOC_POSTINGS_SCHEMA = ArrayType(StructType([
    StructField("term", StringType(), False),
    StructField("tf", IntegerType(), False),
    StructField("positions", ArrayType(IntegerType()), False),
]))


def _doc_postings_batch(lexemes: pd.Series) -> pd.Series:
    """Per-document posting rows computed doc-locally (map-side combine):
    the (term, doc) aggregation never shuffles raw position streams — the
    shuffle downstream moves one compact row per (term, doc) instead of one
    row per token occurrence."""
    out = []
    for lexs in lexemes:
        if lexs is None:
            out.append(None)
            continue
        d: dict = {}
        for i, lx in enumerate(lexs):
            if lx is not None:
                d.setdefault(lx, []).append(i + 1)
        out.append([{"term": t, "tf": len(ps), "positions": ps}
                    for t, ps in d.items()])
    return pd.Series(out)


doc_postings_udf = F.pandas_udf(_doc_postings_batch,
                                returnType=DOC_POSTINGS_SCHEMA)

INDEX_ANALYSIS_SCHEMA = StructType([
    StructField("tokens", ArrayType(StringType()), True),
    StructField("dl", IntegerType(), True),
    StructField("postings", DOC_POSTINGS_SCHEMA, True),
])


def _analyze_index_batch(content: pd.Series, config: pd.Series) -> pd.DataFrame:
    """Single-pass index analysis: tokens + doc length + doc-local postings
    in ONE Arrow roundtrip. The lexeme stream never crosses the
    Python↔JVM boundary — only its aggregate (the per-doc postings) does,
    which halves the UDF traffic of the build's hottest stage."""
    toks_out, dl_out, post_out = [], [], []
    for text, cfg in zip(content, config):
        if text is None:
            toks_out.append(None)
            dl_out.append(None)
            post_out.append(None)
            continue
        cfg = cfg if is_supported_config(cfg) else "simple"
        toks, lexs = analyze_document(text, cfg)
        d: dict = {}
        dl = 0
        for i, lx in enumerate(lexs):
            if lx is not None:
                dl += 1
                d.setdefault(lx, []).append(i + 1)
        toks_out.append(toks)
        dl_out.append(dl)
        post_out.append([{"term": t, "tf": len(ps), "positions": ps}
                         for t, ps in d.items()])
    return pd.DataFrame(
        {"tokens": toks_out, "dl": dl_out, "postings": post_out})


analyze_index_udf = F.pandas_udf(_analyze_index_batch,
                                 returnType=INDEX_ANALYSIS_SCHEMA)


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
