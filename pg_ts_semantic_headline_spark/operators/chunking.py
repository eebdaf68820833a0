"""Training-data chunking and token-budget sampling — the two steps between
a cleaned corpus (operators/pipeline.py) and an actual training mix.

Both are pure column algebra (whole-stage codegen, no Python, no UDFs), and
both are deterministic so they carry DuckDB oracles.

Chunking contract (`chunk_documents`): whitespace tokens (the same `\\s+`
split `token_counts` uses), sliding windows of `chunk_tokens` with
`overlap` tokens shared between consecutive chunks (stride = chunk −
overlap). Window starts are 0, stride, 2·stride, …; a start is emitted iff
it is 0 or begins before `n_tokens − overlap`, which covers every token
exactly once past the overlap and never emits a tail chunk wholly contained
in its predecessor. The final chunk truncates at the document end.

Sampling contract (`sample_token_budget`): per-stratum expected-size
sampling to a token budget with NO sort and NO window — the 100 TB shape.
One small aggregation computes each stratum's total token count; each row
keeps with probability `min(1, budget / total)` decided by a uniform drawn
from `md5(id)` (md5 because both Spark and DuckDB ship it bit-identically;
the draw is a pure function of the row id, so the sample is reproducible
and join-stable across engines and runs). `sample_token_budget_exact` is
the exact-prefix variant — cumulative token counts over the same md5 order
— costing a per-stratum sort; use it when strata are modest (it is also
the oracle shape for pinning the approximate variant's math in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import _tok


def chunk_documents(df: DataFrame, chunk_tokens: int = 512,
                    overlap: int = 0, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, chunk_id, start_token, n_tokens, chunk_text) — one row per
    sliding window. chunk_id is the 0-based window ordinal; start_token is
    its 0-based first-token offset. Empty/NULL docs emit nothing."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # empty tokens are filtered: Spark's trim strips ' ' only, so a
    # whitespace-only doc would otherwise split into ['', ''] and emit
    # garbage chunks of empty strings
    toks = F.filter(_tok(F.col(text_col)), lambda t: t != "")
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(F.size("_toks") - 1, F.lit(0)),
                   F.lit(stride)),
        lambda s: (s == 0) | (s < F.size("_toks") - overlap))
    return (df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
            .where(F.size("_toks") > 0)
            .select("doc_id", "_toks",
                    F.posexplode(starts).alias("chunk_id", "start_token"))
            .select(
                "doc_id",
                F.col("chunk_id").cast("long"),
                F.col("start_token").cast("long"),
                F.least(F.lit(chunk_tokens),
                        F.size("_toks") - F.col("start_token"))
                .cast("long").alias("n_tokens"),
                F.array_join(F.slice("_toks", F.col("start_token") + 1,
                                     chunk_tokens), " ").alias("chunk_text")))


def _uniform_from_id(id_col) -> F.Column:
    """Deterministic uniform in [0, 1): the first 8 hex digits of
    md5(cast(id as string)) over 16^8. Bit-identical in Spark and DuckDB."""
    return (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                   16, 10).cast("double") / F.lit(float(16 ** 8)))


def sample_token_budget(df: DataFrame, budget_tokens: int,
                        stratify_by: str | None = None,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Expected-budget sample: keeps each row of a stratum with probability
    min(1, budget / stratum_total_tokens), so the kept token count has
    expectation ≈ budget per stratum. Two jobs: a tiny per-stratum totals
    aggregate (broadcast back), then a shuffle-free filter — no sort, no
    window, executor-parallel at any scale. Adds `n_tokens`."""
    strata = [stratify_by] if stratify_by else []
    with_n = (df.withColumn("n_tokens",
                            F.size(_tok(F.col(text_col))).cast("long"))
              .where(F.col("n_tokens").isNotNull()))
    totals = (with_n.groupBy(*strata)
              .agg(F.sum("n_tokens").alias("_stratum_tokens")))
    joined = (with_n.join(F.broadcast(totals), on=strata)
              if strata else with_n.crossJoin(F.broadcast(totals)))
    frac = F.least(F.lit(1.0),
                   F.lit(float(budget_tokens)) / F.col("_stratum_tokens"))
    return (joined.where(_uniform_from_id(id_col) < frac)
            .drop("_stratum_tokens"))


def sample_token_budget_exact(df: DataFrame, budget_tokens: int,
                              stratify_by: str | None = None,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """Exact-prefix variant: walk each stratum in md5(id) order and keep
    rows while the running token total stays ≤ budget (the first row of a
    stratum is always kept so a budget below the smallest doc still yields
    data). Costs a per-stratum sort — fine for bounded strata, wrong for a
    single 100 TB stratum; use `sample_token_budget` there."""
    strata = [stratify_by] if stratify_by else []
    with_n = (df.withColumn("n_tokens",
                            F.size(_tok(F.col(text_col))).cast("long"))
              .where(F.col("n_tokens").isNotNull()))
    w = (Window.partitionBy(*strata) if strata else Window.partitionBy()) \
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col)) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (with_n
            .withColumn("_cum", F.sum("n_tokens").over(w))
            .where((F.col("_cum") <= budget_tokens)
                   | (F.col("_cum") == F.col("n_tokens")))
            .drop("_cum"))


def source_mix_weights(df: DataFrame, alpha: float = 0.7,
                       by: str = "source",
                       text_col: str = "text") -> DataFrame:
    """(source, n_docs, n_tokens, scaled_e6, weight): temperature-scaled
    sampling weights for multi-source training mixes — weight ∝
    n_tokens^alpha, normalized to sum 1 (the published recipe behind
    multilingual / multi-corpus temperature sampling: alpha=1 is
    proportional, alpha→0 approaches uniform, upweighting small sources).
    One aggregation over the corpus; the normalization window runs over
    the source-count-sized result, not the data. Pair with
    `sample_token_budget(stratify_by=by, budget = weight·total_budget)`
    to realize the mix.

    Determinism contract: the one transcendental (`pow`, which is NOT
    correctly rounded by IEEE-754 and so may differ by an ulp between
    libm implementations) is quantized to an e6 BIGINT (`scaled_e6`)
    immediately, and `weight` is the ratio of those integers — IEEE
    division IS correctly rounded, so downstream consumers quantizing
    `weight` (e.g. to e4 for a cross-engine gate) see bit-identical
    values whenever `scaled_e6` agrees. The e6 quantization loses ~1e-6
    relative accuracy, irrelevant for sampling weights, and shrinks the
    residual pow-ulp boundary surface ~100× vs rounding a normalized e4
    weight directly (the round-4 driver flake class)."""
    from pyspark.sql import Window

    agg = (df.groupBy(by)
           .agg(F.count("*").alias("n_docs"),
                F.sum(F.size(_tok(F.col(text_col)))).alias("n_tokens")))
    scaled_e6 = F.round(
        F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
        * F.lit(1e6)).cast("long")
    agg = agg.withColumn("scaled_e6", scaled_e6)
    total = F.sum("scaled_e6").over(Window.partitionBy())
    return (agg.withColumn(
                "weight",
                F.col("scaled_e6").cast("double") / total.cast("double"))
            .select(F.col(by).alias("source"), "n_docs", "n_tokens",
                    "scaled_e6", "weight"))


def pack_sequences(df: DataFrame, max_tokens: int,
                   text_col: str = "text", id_col: str = "doc_id",
                   n_shards: int = 64,
                   shard_col: str | None = None) -> DataFrame:
    """Greedy doc-boundary sequence packing — the pretraining batch-prep
    step that concatenates whole documents into fixed-budget training
    sequences (no document is ever split; `chunk_documents` is the
    splitting counterpart). Within each shard, documents are taken in
    doc_id order and appended first-fit-in-order: a doc that would
    overflow `max_tokens` starts the next sequence; a single doc LONGER
    than the budget gets a sequence of its own, flagged `oversize`
    (route those through chunk_documents first if that matters).

    Returns (doc_id, shard, seq_id, n_tokens, oversize) — seq_id is the
    0-based sequence ordinal within its shard; (shard, seq_id) is the
    training-sequence key.

    Determinism contract: shard = pmod(doc_id, n_shards) by default (or
    pass `shard_col` to route by tenant/source), order within a shard is
    doc_id ascending — the packing is a pure function of (ids, token
    counts), reproducible across runs, partitionings, and engines (the
    DuckDB oracle replays it with a recursive CTE).

    Scale shape: packing is inherently sequential PER SHARD (each
    output sequence depends on everything packed before it), so the
    sequential state is confined to an `applyInPandas` group whose size
    the caller controls with `n_shards` — at corpus scale pick shards
    so one shard's (doc_id, n_tokens) rows fit a worker (two longs per
    doc; 10M docs/shard ≈ 160 MB), and the loop itself is O(rows) with
    O(1) state. Token counting is the engine's whitespace contract
    (`token_counts.ws_tokens`)."""
    import pandas as pd

    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if shard_col is None:
        shard = F.pmod(F.col(id_col).cast("long"),
                       F.lit(int(n_shards))).cast("int")
    else:
        shard = F.col(shard_col).cast("int")
    base = df.select(F.col(id_col).cast("long").alias("doc_id"),
                     shard.alias("shard"),
                     F.size(_tok(F.col(text_col))).cast("int")
                     .alias("n_tokens"))
    cap = int(max_tokens)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq_ids = []
        seq, fill = 0, 0
        for n in pdf["n_tokens"]:
            if fill > 0 and fill + int(n) > cap:
                seq += 1
                fill = 0
            seq_ids.append(seq)
            fill += int(n)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["oversize"] = pdf["n_tokens"] > cap
        return pdf[["doc_id", "shard", "seq_id", "n_tokens", "oversize"]]

    return (base.groupBy("shard").applyInPandas(
        pack,
        "doc_id long, shard int, seq_id long, n_tokens int, "
        "oversize boolean"))
