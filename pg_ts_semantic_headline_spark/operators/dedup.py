"""Deduplication operators for large-scale text corpora.

All hashing is MD5/xxhash-based and engine-portable (the DuckDB oracle
computes identical values), and every operator is pure DataFrame algebra:
shingling is an array transform, minhash is a groupBy with string-min
aggregates (min over md5 hex strings is a valid uniform minhash), LSH
banding is a groupBy on band signatures, and verification joins only the
candidate pairs. No driver-side loops, no per-row Python.

Scale notes: the shingle inverted join (`ngram_jaccard_pairs`) is quadratic
in the worst case per shingle bucket — that is inherent to all-pairs exact
Jaccard; the MinHash+LSH path is the 100 TB route (candidates only), with
exact verification as a second stage over the (tiny) candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("_toks", F.split(F.col(text_col), r"\s+"))


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint, cluster_size, canonical_id, is_duplicate):
    hash-groupBy exact dedup; canonical = lowest doc_id per content hash."""
    h = df.select(F.col(id_col).alias("doc_id"),
                  F.md5(F.col(text_col)).alias("fingerprint"))
    clusters = (h.groupBy("fingerprint")
                .agg(F.count("*").alias("cluster_size"),
                     F.min("doc_id").alias("canonical_id")))
    return (h.join(clusters, on="fingerprint")
            .select("doc_id", "fingerprint", "cluster_size", "canonical_id",
                    (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate")))


def shingle_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-gram shingles per document.
    Docs with fewer than n tokens emit nothing (guarded explicitly:
    Spark's sequence(1, 0) DESCENDS to [1, 0] rather than being empty,
    which would feed slice() an invalid start)."""
    toks = with_tokens(df, text_col)
    sh = toks.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.when(
            F.size("_toks") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
                lambda i: F.array_join(F.slice("_toks", i, n), " "),
            )).otherwise(F.array().cast("array<string>"))).alias("shingle"))
    return sh.distinct()


def minhash_signatures(shingles: DataFrame, num_hashes: int = 16) -> DataFrame:
    """(doc_id, h0..h{n-1}) — minhash over seeded md5 of each shingle.
    String-min over md5(seed|shingle) hex is a uniform permutation minhash."""
    aggs = [F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"h{j}")
            for j in range(num_hashes)]
    return shingles.groupBy("doc_id").agg(*aggs)


class _ObservedDrops:
    """drop_stats["observation"] handle: `.get` normally reads the Spark
    Observation riding the main plan (free), but when EVERY bucket was
    dropped the candidate result is empty and AQE's empty-relation
    propagation elides the CollectMetrics node — Observation.get then
    raises a JVM AssertionError precisely in the case the stat exists
    for. Fall back to recomputing the same counts with one small
    aggregate job over the pre-cap band rows."""

    def __init__(self, obs, recount):
        self._obs = obs
        self._recount = recount

    @property
    def get(self) -> dict:
        try:
            return dict(self._obs.get)
        except Exception:
            return self._recount()


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 4,
                        rows_per_band: int = 4,
                        max_band_size: int | None = None,
                        drop_stats: dict | None = None) -> DataFrame:
    """(a, b) candidate pairs sharing at least one LSH band signature.

    `max_band_size` guards the self-join against degenerate band buckets:
    a band signature shared by B documents (boilerplate headers, empty
    files — guaranteed at corpus scale) emits B² pairs. Buckets larger
    than the cap are dropped from candidate generation, bounding the pair
    count at O(N·cap). The drop is observable, never silent: pass a
    `drop_stats` dict and after the first action on the result,
    `drop_stats["observation"].get` yields {"dropped_buckets": …,
    "dropped_rows": …} (a Spark Observation riding the main plan — no
    extra job). Docs in a dropped bucket can still pair through their
    other, non-degenerate bands."""
    num_hashes = bands * rows_per_band
    band_rows = None
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        part = signatures.select(
            F.col("doc_id"),
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *cols)).alias("band_sig"))
        band_rows = part if band_rows is None else band_rows.unionByName(part)
    if max_band_size is not None:
        # bucket sizes via ONE window over (band, band_sig) — the same
        # shuffle key the candidate self-join needs, so the exchange is
        # reused; no separate count-aggregate + semi-join pass
        from pyspark.sql import Window
        w = Window.partitionBy("band", "band_sig")
        band_rows = (band_rows
                     .withColumn("_n", F.count("*").over(w))
                     .withColumn("_rn", F.row_number().over(
                         w.orderBy("doc_id"))))
        if drop_stats is not None:
            from pyspark.sql import Observation
            obs = Observation("lsh_band_drops")
            pre_cap = band_rows
            band_rows = band_rows.observe(
                obs,
                F.sum(F.when((F.col("_n") > max_band_size)
                             & (F.col("_rn") == 1), 1)
                      .otherwise(0)).alias("dropped_buckets"),
                F.sum(F.when(F.col("_n") > max_band_size, 1)
                      .otherwise(0)).alias("dropped_rows"))

            def _recount(pre=pre_cap, cap=max_band_size):
                r = (pre.where(F.col("_n") > cap)
                     .agg(F.count_distinct("band", "band_sig")
                          .alias("dropped_buckets"),
                          F.count("*").alias("dropped_rows")).first())
                return {"dropped_buckets": int(r["dropped_buckets"]),
                        "dropped_rows": int(r["dropped_rows"])}

            drop_stats["observation"] = _ObservedDrops(obs, _recount)
        band_rows = (band_rows.where(F.col("_n") <= max_band_size)
                     .drop("_n", "_rn"))
    left = band_rows.select("band", "band_sig", F.col("doc_id").alias("a"))
    right = band_rows.select("band", "band_sig", F.col("doc_id").alias("b"))
    return (left.join(right, on=["band", "band_sig"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def _pair_intersections(pairs: DataFrame, shingles: DataFrame) -> DataFrame:
    """(a, b, inter): distinct-shingle intersection size per candidate
    pair."""
    sa = shingles.select(F.col("doc_id").alias("a"), "shingle")
    sb = shingles.select(F.col("doc_id").alias("b"), "shingle")
    return (pairs.join(sa, on="a").join(sb, on=["b", "shingle"])
            .groupBy("a", "b").agg(F.count("*").alias("inter")))


def _allpairs_intersections(shingles: DataFrame) -> DataFrame:
    """(a, b, inter) for EVERY doc pair sharing a shingle, via the
    inverted self-join (a < b) — the quadratic-exact candidate set."""
    return (shingles.alias("x").join(shingles.alias("y"), on="shingle")
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("a"),
                    F.col("y.doc_id").alias("b"))
            .groupBy("a", "b").agg(F.count("*").alias("inter")))


def _with_pair_sizes(inter: DataFrame, shingles: DataFrame) -> DataFrame:
    """Attach sz_a / sz_b (each side's distinct-shingle count) to an
    (a, b, inter) frame — the shared scaffolding of every pair score."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("sz"))
    return (inter
            .join(sizes.select(F.col("doc_id").alias("a"),
                               F.col("sz").alias("sz_a")), on="a")
            .join(sizes.select(F.col("doc_id").alias("b"),
                               F.col("sz").alias("sz_b")), on="b"))


def _jaccard_expr() -> F.Column:
    return F.col("inter") / (F.col("sz_a") + F.col("sz_b")
                             - F.col("inter"))


def _containment_expr() -> F.Column:
    return F.col("inter") / F.least("sz_a", "sz_b")


def jaccard_for_pairs(pairs: DataFrame, shingles: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs: |A∩B| / (|A|+|B|-|A∩B|)."""
    return (_with_pair_sizes(_pair_intersections(pairs, shingles), shingles)
            .select("a", "b", _jaccard_expr().alias("jaccard")))


def containment_for_pairs(pairs: DataFrame,
                          shingles: DataFrame) -> DataFrame:
    """Exact containment for candidate pairs: |A∩B| / min(|A|, |B|) —
    the doc-in-doc signal Jaccard misses when sizes differ (a page
    quoting another scores near 1.0 containment but low Jaccard).
    RECALL CAVEAT: candidate pairs from minhash LSH are recalled by
    Jaccard, so small-in-big containment pairs may never become
    candidates; for guaranteed containment recall pair this with the
    exact `ngram_containment_pairs` baseline or an asymmetric candidate
    scheme."""
    return (_with_pair_sizes(_pair_intersections(pairs, shingles), shingles)
            .select("a", "b", _containment_expr().alias("containment")))


def ngram_containment_pairs(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", n: int = 3,
                            threshold: float = 0.9) -> DataFrame:
    """All-pairs exact n-gram containment >= threshold via the shingle
    inverted join — the quadratic-exact baseline (same cost shape as
    `ngram_jaccard_pairs`; the inverted join only pairs docs sharing a
    shingle, so disjoint docs never meet)."""
    sh = shingle_df(df, text_col, id_col, n)
    return (_with_pair_sizes(_allpairs_intersections(sh), sh)
            .withColumn("containment", _containment_expr())
            .where(F.col("containment") >= threshold)
            .select("a", "b",
                    F.round("containment", 6).alias("containment")))


def minhash_lsh_dedup(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      num_hashes: int = 16, bands: int = 4,
                      threshold: float = 0.5,
                      max_band_size: int | None = 1000,
                      drop_stats: dict | None = None) -> DataFrame:
    """Near-duplicate pairs (a, b, jaccard) via MinHash LSH + exact verify.

    `max_band_size` (default 1000) bounds degenerate band buckets — see
    `lsh_candidate_pairs`; pass None to disable the cap, `drop_stats` to
    observe how much the cap dropped."""
    sh = shingle_df(df, text_col, id_col, n)
    sigs = minhash_signatures(sh, num_hashes)
    cands = lsh_candidate_pairs(sigs, bands, num_hashes // bands,
                                max_band_size=max_band_size,
                                drop_stats=drop_stats)
    return (jaccard_for_pairs(cands, sh)
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


def duplicate_components(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
    checkpoint: str = "local",
) -> DataFrame:
    """(doc_id, component_id, is_canonical) — connected components over a
    near-duplicate pair stream (e.g. `minhash_lsh_dedup` output), the
    cluster-then-keep-canonical step of a real dedup pipeline.

    Iterative min-label propagation WITH pointer jumping: every node
    starts labeled with its own id; each round takes the min over itself,
    its neighbors' labels, AND its label's label (path halving) — so long
    chains converge in O(log diameter) rounds, not O(diameter). Each
    round is TWO joins + ONE aggregation; the label frame is
    checkpointed so lineage stays flat and the convergence check is an
    O(1)-row action. Driver loops over ITERATIONS, never over rows.

    `checkpoint`: "local" (localCheckpoint — fast, but blocks are not
    replicated, so an executor loss mid-run fails the job; right for
    interactive/single-node) or "reliable" (`DataFrame.checkpoint` —
    persists to `spark.sparkContext.setCheckpointDir(...)` storage and
    survives executor loss; use on real clusters).

    Raises RuntimeError if labels have not converged after `max_iter`
    rounds (never silently returns split components)."""
    if checkpoint not in ("local", "reliable"):
        raise ValueError(f"checkpoint must be 'local' or 'reliable', "
                         f"got {checkpoint!r}")

    def ckpt(df: DataFrame, eager: bool) -> DataFrame:
        if checkpoint == "reliable":
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    edges = ckpt(edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct(), eager=False)

    labels = docs.select(F.col(id_col).alias("node"),
                         F.col(id_col).alias("label"))
    changed = 1
    for _ in range(max_iter):
        nbr_min = (edges
                   .join(labels.withColumnRenamed("node", "dst"), on="dst")
                   .groupBy("src").agg(F.min("label").alias("nbr_label"))
                   .withColumnRenamed("src", "node"))
        # pointer jumping: label-of-label, computed from the same frame
        lbl2 = labels.select(F.col("node").alias("label"),
                             F.col("label").alias("jump_label"))
        new_labels = (labels
                      .join(nbr_min, on="node", how="left")
                      .join(lbl2, on="label", how="left")
                      .select("node",
                              F.least("label",
                                      F.coalesce("nbr_label", "label"),
                                      F.coalesce("jump_label", "label"))
                              .alias("label")))
        new_labels = ckpt(new_labels, eager=True)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), on="node")
                   .where(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"duplicate_components did not converge in {max_iter} rounds; "
            f"raise max_iter (components would otherwise silently split)")
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("component_id"),
        (F.col("node") == F.col("label")).alias("is_canonical"))


def pick_canonicals(components: DataFrame, scores: DataFrame,
                    score_col: str = "score") -> DataFrame:
    """Quality-aware canonical election per duplicate component — the
    keep-BEST step of a real dedup pipeline (`duplicate_components`
    defaults to keep-min-id, but production dedup keeps the longest /
    highest-quality cluster member and drops the rest).

    `components`: (doc_id, component_id) — `duplicate_components` output.
    `scores`:     (doc_id, <score_col>) — any per-doc quality signal
    (token count, `quality_score` composite, `bigram_lm_score`, ...).

    Returns (doc_id, component_id, canonical_id, is_canonical) where the
    canonical is the member with the highest score, ties broken to the
    smallest doc_id; docs missing a score row rank below every scored
    member. ONE left join + ONE max-struct aggregate on component_id —
    the shuffle key is the cluster id, so cost is bounded by cluster
    count, never quadratic in cluster size."""
    j = (components.select("doc_id", "component_id")
         .join(scores.select("doc_id",
                             F.col(score_col).cast("double").alias("_s")),
               on="doc_id", how="left"))
    best = (j.groupBy("component_id")
            .agg(F.max(F.struct(
                F.coalesce(F.col("_s"), F.lit(float("-inf"))).alias("s"),
                (-F.col("doc_id")).alias("negid"))).alias("_w")))
    return (j.join(best, on="component_id")
            .select("doc_id", "component_id",
                    (-F.col("_w.negid")).alias("canonical_id"),
                    (F.col("doc_id") == -F.col("_w.negid"))
                    .alias("is_canonical")))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """All-pairs exact n-gram Jaccard ≥ threshold via shingle inverted join
    (the exact baseline the LSH path approximates)."""
    sh = shingle_df(df, text_col, id_col, n)
    return (_with_pair_sizes(_allpairs_intersections(sh), sh)
            .withColumn("jaccard", _jaccard_expr())
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


def _hex_bit(hash_col, bit: int):
    """Bit `bit` of an md5 hex string, via portable string arithmetic
    (identical in Spark SQL and the DuckDB oracle — no hex casts needed)."""
    nibble = F.substring(hash_col, 1 + bit // 4, 1)
    digit = F.conv(nibble, 16, 10).cast("int")
    return F.shiftright(digit, bit % 4) % 2


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """(doc_id, simhash) — per-token md5, majority vote per bit position."""
    toks = (with_tokens(df, text_col)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode("_toks").alias("tok"))
            .withColumn("th", F.md5("tok")))
    votes = [F.sum(_hex_bit(F.col("th"), b) * 2 - 1).alias(f"v{b}")
             for b in range(bits)]
    agg = toks.groupBy("doc_id").agg(*votes)
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")
                           * (2 ** b)).otherwise(0)
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", bits: int = 32,
                       max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, COMPLETE pigeonhole
    blocking: the fingerprint is split into `max_hamming + 1` equal-width
    chunks; ≤ max_hamming differing bits spread over max_hamming + 1
    chunks leave at least one chunk with ZERO differing bits, so blocking
    on exact-equal chunks (one equi-join per chunk, unioned) misses no
    qualifying pair — no cross join. (Two-half blocking is only complete
    for hamming ≤ 1; completeness vs brute force is pinned in
    tests/test_operators.py.) Exact hamming then filters candidates."""
    n_chunks = max_hamming + 1
    # near-equal chunk widths (pigeonhole needs any partition into
    # max_hamming+1 chunks, not equal ones)
    base, rem = divmod(bits, n_chunks)
    widths = [base + (1 if j < rem else 0) for j in range(n_chunks)]
    offsets = [sum(widths[:j]) for j in range(n_chunks)]
    s = simhash(df, text_col, id_col, bits)
    for j in range(n_chunks):
        mask = (1 << widths[j]) - 1
        s = s.withColumn(
            f"c{j}",
            F.shiftright(F.col("simhash"), offsets[j])
            .bitwiseAND(F.lit(mask)))
    cands = None
    for j in range(n_chunks):
        a = s.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"),
                     F.col(f"c{j}").alias("k"))
        b = s.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"),
                     F.col(f"c{j}").alias("k"))
        part = (a.join(b, on="k").where(F.col("a") < F.col("b"))
                .select("a", "b", "sa", "sb"))
        cands = part if cands is None else cands.unionByName(part)
    cands = cands.distinct()
    cands = cands.withColumn("a_xor_b", F.col("sa").bitwiseXOR(F.col("sb")))
    ham = F.bit_count(F.col("a_xor_b"))
    return (cands.withColumn("hamming", ham)
            .where(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming"))


def lsh_params(threshold: float, target_recall: float = 0.95,
               max_hashes: int = 256) -> tuple[int, int]:
    """(bands, rows_per_band) sized so MinHash-LSH recalls pairs at
    `threshold` Jaccard with >= `target_recall` probability, using the
    standard S-curve: P(candidate | jaccard=s) = 1 - (1 - s^rows)^bands.
    Searches the smallest total hash count (bands*rows <= max_hashes)
    meeting the target, preferring more rows per band (fewer false
    positives) among equals; raises if no configuration fits — raise
    max_hashes rather than silently under-recalling."""
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    best = None
    for total in range(1, max_hashes + 1):
        for rows in range(total, 0, -1):
            if total % rows:
                continue
            bands = total // rows
            recall = 1.0 - (1.0 - threshold ** rows) ** bands
            if recall >= target_recall:
                best = (bands, rows)
                break
        if best:
            return best
    raise ValueError(
        f"no (bands, rows) with <= {max_hashes} hashes reaches recall "
        f"{target_recall} at jaccard {threshold}; raise max_hashes")


def dedup_substrings(df: DataFrame, n: int = 50,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Corpus-global EXACT-substring dedup at n-token-window granularity,
    keep-first occurrence — the ExactSubstr recipe of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better", §4.1,
    published default n=50): any n-token window occurring more than once
    in the corpus keeps ONLY its first occurrence (smallest (doc_id,
    start)); every later occurrence's token span is cut out of its
    document, including repeats WITHIN one document. Overlapping
    duplicated windows (a shared passage of m > n tokens duplicates
    m−n+1 windows) coalesce into one removed span. Returns (doc_id,
    text_dedup, n_tokens_removed); documents shorter than n tokens pass
    through untouched (text whitespace-normalized to single spaces, the
    token-level-op convention).

    Scale shape (Lee et al. use a suffix array — a single-machine
    structure; this is the shuffle formulation):
    1. one pass emits (md5(window), doc_id, start) per window — the key
       is a 128-bit fingerprint, so the shuffle moves ~48 bytes per
       corpus token regardless of n, and false merges are ~(windows²)/2^128
       ≈ zero at 10^13 windows (keying on the window text itself would
       be exact but ships n×token bytes);
    2. winner per key = min(struct(doc_id, start)) — partial-aggregated
       map-side; keys seen once are DROPPED before the rejoin, so the
       dup join's build side is only the duplicated tail;
    3. later occurrences become intervals [start, start+n), merged per
       doc by the classic sorted running-max grouping (one window over
       the interval rows — interval count ≤ dup windows, far smaller
       than the corpus);
    4. each doc rebuilds by concatenating the ≤ |intervals|+1 uncovered
       slices with ONE F.aggregate fold over its sorted interval array —
       no per-token work, no UDF anywhere.
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.split(F.col(text_col), " ").alias("toks"))
    wins = substr_windows(base, n)
    winners = (wins.groupBy("key")
               .agg(F.min(F.struct("doc_id", F.col("s").alias("start")))
                    .alias("w"),
                    F.count("*").alias("c"))
               .where(F.col("c") > 1)
               .select("key", "w"))
    dups = (wins.join(winners, on="key")
            .where(~((F.col("doc_id") == F.col("w.doc_id"))
                     & (F.col("s") == F.col("w.start"))))
            .select("doc_id", "s"))
    return cut_spans(base, dups, n)


def substr_windows(base: DataFrame, n: int) -> DataFrame:
    """(doc_id, s, key) — one md5 fingerprint per n-token window of each
    `(doc_id, toks)` row; docs shorter than n emit nothing."""
    m = F.size("toks")
    return (base.where(m >= n)
            .select("doc_id",
                    F.posexplode(F.transform(
                        F.sequence(F.lit(0), m - n),
                        lambda s: F.md5(F.array_join(
                            F.slice("toks", s + 1, n), " "))))
                    .alias("s", "key")))


def cut_spans(base: DataFrame, dups: DataFrame, n: int) -> DataFrame:
    """Remove the n-token span starting at every (doc_id, s) of `dups`
    from `base` (doc_id, toks): merge overlapping/adjacent spans per doc
    with one running-max window, then rebuild each doc by folding the
    uncovered slices. Returns (doc_id, text_dedup, n_tokens_removed)."""
    from pyspark.sql import Window

    dups = dups.select("doc_id", "s", (F.col("s") + n).alias("e"))
    # merge overlapping/adjacent intervals: a row starts a new group iff
    # it begins strictly after everything seen so far ends
    w_doc = Window.partitionBy("doc_id").orderBy("s")
    prev_e = F.max("e").over(w_doc.rowsBetween(Window.unboundedPreceding, -1))
    grouped = (dups
               .withColumn("_new", F.when(prev_e.isNull()
                                          | (F.col("s") > prev_e), 1)
                           .otherwise(0))
               .withColumn("_gid", F.sum("_new").over(
                   w_doc.rowsBetween(Window.unboundedPreceding, 0)))
               .groupBy("doc_id", "_gid")
               .agg(F.min("s").alias("s"), F.max("e").alias("e")))
    ivs = (grouped.groupBy("doc_id")
           .agg(F.array_sort(F.collect_list(F.struct("s", "e")))
                .alias("ivs"),
                F.sum(F.col("e") - F.col("s")).alias("n_tokens_removed")))

    # rebuild: fold the sorted disjoint intervals, keeping the gaps
    joined = base.join(ivs, on="doc_id", how="left")
    acc0 = F.struct(F.lit(0).alias("p"),
                    F.array().cast("array<string>").alias("parts"))
    fold = F.aggregate(
        "ivs", acc0,
        lambda acc, iv: F.struct(
            iv["e"].alias("p"),
            F.concat(acc["parts"],
                     F.slice("toks", acc["p"] + 1, iv["s"] - acc["p"]))
            .alias("parts")),
        lambda acc: F.array_join(
            F.concat(acc["parts"],
                     F.slice("toks", acc["p"] + 1, F.size("toks") - acc["p"])),
            " "))
    return joined.select(
        "doc_id",
        F.when(F.col("ivs").isNull(), F.array_join("toks", " "))
         .otherwise(fold).alias("text_dedup"),
        F.coalesce("n_tokens_removed", F.lit(0)).cast("long")
         .alias("n_tokens_removed"))
