"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Designed for 100 TB corpora:
  - exact_dedup: one hash-shuffle on a 128-bit fingerprint; map-side
    partial aggregation; no sort.
  - ngram-Jaccard: shingle -> explode -> self-join on shingle -> per-pair
    intersection counts. The shingle join is the scalable formulation of
    all-pairs similarity (only pairs sharing >=1 shingle are materialized,
    never the full n^2).
  - MinHash+LSH: signatures via deterministic per-band hash functions
    (xxhash64 with band seed), banding -> bucket join -> candidate pairs.
    Collision probability per band = s^rows_per_band; unioned over bands.
  - SimHash: 64-bit weighted-bit signature; near-dups = signatures within
    Hamming distance k, found by pigeonhole banding (4 x 16-bit keys).

MinHash/SimHash use Spark's xxhash64 (JVM, codegen'd) — engine-specific,
hence checked by structural tests + rows-only driver checks rather than a
value-level DuckDB oracle. The Jaccard and exact paths are fully
oracle-checked (plans/queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_cdc_spark.operators.text import tokens
from stream_cdc_spark.operators.util import ensure_parallelism

# Version id of the MinHash signature scheme: how shingles are hashed
# (xxhash64(shingle, seed=i) per signature position) and how band keys are
# derived (xxhash64 over the band's signature slice). A persisted band
# index is only probe-compatible with the scheme that built it — signatures
# under a different scheme share no band keys, so a probe would silently
# return zero candidates and admit every near-dup. The id rides the index
# parameter stamp (minhash_band_index) and is validated next to k /
# num_hashes / bands (incremental_verified_dedup). Bump it whenever the
# hash function, seeding, or band-key derivation changes.
LSH_SCHEME = "minhash-xxhash64-seeded/bandkey-xxhash64/v1"


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups by normalized-text fingerprint: keeps the
    minimum id as the canonical representative, counts members."""
    # No ensure_parallelism here: the groupBy's own shuffle redistributes,
    # and the map-side md5 is cheap — a pre-shuffle repartition would be a
    # second, pure-overhead exchange.
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    return (
        df.select(F.md5(norm).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_members"))
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Distinct word k-shingles per document: (id, shingle).

    The explode is the fan-out hot spot — ensure_parallelism first so a
    single-row-group input doesn't serialize the whole corpus onto one core.

    Dedup happens NARROWLY with array_distinct before the explode: ids
    already differ across documents, so per-row array dedup yields the
    same (id, shingle) set as a global .distinct() (equality verified at
    sf0.1) without shuffling the corpus-sized shingle relation — one
    exchange removed from every consumer (q24/q39/q64/q110/q111 and the
    MinHash verify path), measured ~30% off the q24 pair pipeline.

    Gram build (r15, guide §4.1 built-ins-first): k-grams come from
    ``arrays_zip`` of k shifted ``slice``s — whole-stage-codegen
    expressions — with the string concat deferred PAST the explode, so
    the per-element interpreted ``transform`` lambda (the q103-class
    fold VERDICT r14 item 5 flags) is gone entirely. Values are
    identical: tokens are space-split and thus space-free, so
    ``concat_ws(" ", t1..tk)`` is injective for fixed k and
    array_distinct over the gram STRUCTS equals distinct over the
    concatenated strings (A/B: byte-equal output, pair pipeline ~25%
    faster at sf0.1; an Arrow tier was considered and rejected — string
    tokens would pay JVM->Python serialization for work codegen does in
    place).
    """
    df = ensure_parallelism(df)
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    empty_t = "array<struct<" + ",".join(
        f"`{j}`:string" for j in range(k)
    ) + ">>"
    zipped = F.when(
        n >= k,
        F.arrays_zip(*[F.slice(toks, j + 1, n - F.lit(k - 1)) for j in range(k)]),
    ).otherwise(F.array().cast(empty_t))
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(zipped)).alias("__g"),
    ).select(
        "id",
        F.concat_ws(" ", *[F.col("__g")[str(j)] for j in range(k)]).alias(
            "shingle"
        ),
    )


def stop_shingle_filter(
    sh: DataFrame,
    max_df: int,
    detect_rate_4096: int | None = None,
    materialize_hot: bool = False,
) -> DataFrame:
    """Drop shingles whose document frequency exceeds `max_df` (standard
    stop-shingle filter, cf. stop-word removal in MinHash pipelines).

    The shingle self-join groups rows by shingle value, so a shingle shared
    by d documents materializes d^2/2 candidate rows *before* the pair
    aggregate: one trigram in 10^6 docs of a 100 TB corpus is ~5*10^11 join
    rows on a single key. Shingles that common carry no near-dup signal
    (they cannot push a pair over any useful Jaccard threshold on their
    own), so capping df bounds every join group at max_df^2 with negligible
    recall loss. The hot-shingle list is tiny by construction (only values
    with df > max_df), so the removal is a broadcast anti-join — no extra
    shuffle on the big side.

    `detect_rate_4096`: optionally detect hot shingles on a deterministic
    content-hash sample (operators/sampling.py) instead of an exact
    full-shuffle count. A shingle at the cap appears ~max_df*rate/4096
    times in the sample, so with the safety factor 2 the detector flags
    (approximately) shingles with df > max_df/2 — fine, since anything
    near the cap is already uninformative. This replaces a full shuffle of
    the exploded shingle set with a narrow sampled scan + tiny aggregate:
    at 100 TB the exact detector's shuffle is itself corpus-sized, the
    sampled one is 1/128th of it (rate 32). The hash sample is partition-
    order independent, so detection stays deterministic run-to-run.
    """
    counted = sh
    threshold = max_df
    if detect_rate_4096 is not None:
        from stream_cdc_spark.operators.sampling import RATE_DENOM, sample_mark

        counted = sh.filter(
            sample_mark(
                F.concat_ws("|", "id", "shingle"), detect_rate_4096, "hot-df"
            )
        )
        threshold = max(2, (max_df * detect_rate_4096) // RATE_DENOM // 2)
    hot = (
        counted.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > threshold)
        .select("shingle")
    )
    if materialize_hot:
        # The filtered output is referenced from several plan branches
        # (sizes aggregate + both self-join sides); without materialization
        # each branch re-runs the detector scan. The hot list is tiny by
        # construction, so an eager localCheckpoint pays one detector pass
        # total. Trade-off: plan construction triggers a job (keep the
        # default lazy for operator composition / Spark Connect).
        hot = hot.localCheckpoint(eager=True)
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = 1000,
    hot_detect_rate_4096: int | None = None,
    storage_level=None,
) -> DataFrame:
    """Near-duplicate pairs by word-k-gram Jaccard similarity.

    shingle join -> count shared -> |A ∪ B| = |A| + |B| - shared.
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6dp
    for cross-engine determinism. Only co-shingled pairs are scored.

    `max_shingle_df` caps the per-shingle join-group size (see
    stop_shingle_filter); sizes are computed on the capped set so the
    Jaccard stays internally consistent (hot shingles leave both the
    intersection and the union). Pass None to disable.

    `storage_level` optionally persists the shingle set between the sizes
    aggregate and the self-join. Off by default: caching the exploded
    shingles of a 100 TB corpus is an executor-memory hazard, and the
    recompute is a narrow re-scan Catalyst pipelines with the join.
    """
    sh = shingles(df, text_col, id_col, k)
    if max_shingle_df is not None:
        sh = stop_shingle_filter(sh, max_shingle_df, hot_detect_rate_4096)
    if storage_level is not None:
        sh = sh.persist(storage_level)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if max_shingle_df is not None:
        shared = shared_pair_counts(sh)
    else:
        # Uncapped groups make shared_pair_counts' per-group pair ARRAY
        # unbounded (one hot shingle in d docs -> d^2/2 structs in ONE
        # row); the self-join produces the same pairs but STREAMS them
        # through the (spillable) hash aggregate — slower, but the only
        # safe shape without the df cap (code-review r9 finding).
        a, b = sh.alias("a"), sh.alias("b")
        shared = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("shared"))
        )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        shared.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("shared").cast("double")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def shared_pair_counts(sh: DataFrame) -> DataFrame:
    """(id_a, id_b, shared) per co-shingled doc pair (id_a < id_b) from a
    distinct (id, shingle) relation — the shared block of every shingle-
    Jaccard consumer (ngram_jaccard_pairs, q24/q39/q64/q114/q117/q122).

    Group-and-combine instead of a shingle self-join: ONE exchange
    groups the shingle rows, the sorted id list of each group expands to
    its ordered pairs MAP-SIDE (array expressions, codegen), and only
    (pair, count) rows reach the second exchange with partial
    aggregation. Same single corpus-sized shuffle as the self-join
    formulation (whose second scan AQE reused), but no join build/probe
    and no raw pair stream into the aggregate — measured 30% off q24 at
    sf0.1 (2.45 s -> 1.73 s), value-identical.

    PRECONDITION: the input must be df-capped (stop_shingle_filter or
    an equivalent group-size bound). The per-group pair array
    materializes in ONE row — cap^2/2 structs (~8 MB at the default
    1000) is bounded memory per task at any corpus size, but an
    UNCAPPED hot shingle would build its whole d^2/2 pair set in a
    single array (executor OOM), where a self-join streams the same
    pairs through a spillable aggregate. Uncapped callers
    (ngram_jaccard_pairs with max_shingle_df=None) use the self-join
    formulation instead."""
    grp = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pairs = grp.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.size("ids") - F.lit(2)),
                    lambda i: F.transform(
                        F.slice(
                            F.col("ids"),
                            i + F.lit(2),
                            F.size("ids") - i - F.lit(1),
                        ),
                        lambda j: F.struct(
                            F.get(F.col("ids"), i).alias("id_a"),
                            j.alias("id_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    return pairs.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("shared")
    )


def shingle_array(text_col: str, k: int = 3) -> "F.Column":
    """Word k-shingles of a text column as an array expression (no explode)."""
    toks = tokens(F.col(text_col))
    return F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + F.lit(j)) for j in range(k)]
            ),
        ),
    ).otherwise(F.array())


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    shingle_rel: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures: sig[i] = min over shingles of xxhash64(shingle, i).

    One shuffle, no UDFs: explode raw shingles (duplicates kept — min over
    a multiset equals min over its set, so the distinct() shuffle of
    `shingles()` is skipped) and aggregate `num_hashes` mins with map-side
    combine: per-doc partial state is num_hashes longs regardless of
    document length. (A fully-narrow array_min(transform(...)) variant
    benchmarks slower: Catalyst's projection collapse re-inlines the
    shingle-building expression into all 64 hash positions.)

    ``shingle_rel``: an existing (id, shingle) relation to aggregate
    instead of re-exploding the corpus. Only worth passing when that
    relation is already MATERIALIZED (persisted/bucketed table): feeding
    an unmaterialized distinct() subtree here routes the signature
    aggregate through a full shingle-row shuffle, which measured 25-60%
    slower at sf0.1 than a second scan with map-side-combined mins —
    re-scanning beats re-shuffling raw rows.
    """
    if shingle_rel is not None:
        sh = shingle_rel
    else:
        df = ensure_parallelism(df)
        sh = df.select(
            F.col(id_col).alias("id"),
            F.explode(shingle_array(text_col, k)).alias("shingle"),
        )
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def band_buckets(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """LSH band keys for a (id, signature) relation: (id, band, key).

    key = xxhash64 over the band's signature slice. This relation IS the
    persistent dedup index: written as a (band, key)-bucketed table it
    lets later batches probe for near-dup candidates without touching the
    corpus (see incremental_verified_dedup)."""
    rows_per_band = num_hashes // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[
                    F.col("signature").getItem(b * rows_per_band + r)
                    for r in range(rows_per_band)
                ]
            ).alias("key"),
        )
        for b in range(bands)
    ]
    return sig.select("id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def minhash_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Build the (id, band, key) MinHash-LSH index for a corpus. In
    production this is materialized once (bucketed by (band, key)) and
    maintained incrementally as batches are admitted.

    The ``band`` column carries (k, num_hashes, bands) as column metadata
    so a persisted index is self-describing: probing it with mismatched
    LSH parameters silently yields zero candidates (every near-dup of the
    corpus would be admitted), so consumers validate the stamp — see
    incremental_verified_dedup. Column metadata survives parquet
    round-trips and unions, so update_band_index keeps the stamp.
    """
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes)
    out = band_buckets(sig, num_hashes, bands)
    stamp = {
        "lsh_k": k,
        "lsh_num_hashes": num_hashes,
        "lsh_bands": bands,
        "lsh_scheme": LSH_SCHEME,
    }
    return out.withColumn("band", F.col("band").alias("band", metadata=stamp))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_rel: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding over MinHash signatures.

    bands=16 x rows=4 over 64 hashes -> candidate threshold ~ (1/16)^(1/4)
    ≈ 0.5 Jaccard. Band key = hash of the band slice; bucket join on
    (band, key) only compares docs sharing a bucket — linear in corpus
    size, never n^2. Returns distinct (id_a, id_b, est_jaccard) where
    est_jaccard = fraction of matching signature positions.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes, shingle_rel)
    # Slim banding join: only (id, band, key) rides the bucket self-join and
    # the dropDuplicates shuffle — the 64-long signature array (~0.5 KB/row)
    # stays out of both exchanges and is re-attached once per *surviving*
    # candidate pair from the slim signature relation (candidates << corpus,
    # so AQE typically broadcasts them into the rejoin).
    buckets = band_buckets(sig, num_hashes, bands)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand_ids = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sig.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b"))
    cand = cand_ids.join(sa, "id_a").join(sb, "id_b")
    matches = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda m: m,
        )
    )
    return cand.select(
        "id_a",
        "id_b",
        (matches.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
    )


def minhash_lsh_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold_ppm: int = 800_000,
) -> DataFrame:
    """Candidate-then-verify near-dup detection: MinHash+LSH proposes
    candidate pairs (linear in corpus size), then each candidate is
    verified with its EXACT word-k-gram Jaccard — the production dedup
    shape (sketch for recall, exact check for precision).

    Verification cost is proportional to the candidate set, not the
    corpus: candidate pairs expand back to their shingle sets via two
    id-joins and one shared-shingle aggregate. Returns
    (id_a, id_b, jaccard_ppm BIGINT) for verified pairs with exact
    Jaccard >= threshold_ppm/1e6. FLOOR-ppm quantization makes the output
    engine-independent: unlike raw MinHash estimates (xxhash64-specific),
    this is value-checkable against a SQL oracle computing the same exact
    Jaccard — the driver check then *proves* LSH candidate recall is 100%
    on the tested corpus (a missed true pair would be a missing row).
    """
    # Candidate generation and verification each scan the corpus once with
    # map-side-combined aggregates. (Sharing one distinct shingle relation
    # between them was measured and rejected — see minhash_signatures'
    # shingle_rel note: it trades a cheap re-scan for a corpus-sized
    # raw-row shuffle.)
    cand = minhash_lsh_pairs(df, text_col, id_col, k, num_hashes, bands).select(
        "id_a", "id_b"
    )
    sh = shingles(df, text_col, id_col, k)
    # n_sh per doc is a PER-ROW expression (size of the distinct-shingle
    # array — no df cap on this path), not a count over the exploded
    # relation: removes a corpus-sized explode + hash aggregate +
    # Exchange (guide §2.4). The expression is evaluated inside a
    # codegen'd Project; there is no Generate here, so the heavy-alias
    # filter-pushdown trap (see plans/queries._shingle_pair_stats) does
    # not arise. coalesce makes n_sh PROVABLY non-null: the verify
    # join's ratio condition otherwise makes Catalyst infer
    # isnotnull(n_sh) and push it below the repartition with the whole
    # shingle expression substituted — an interpreted (non-codegen)
    # Filter evaluating the grams build a second time per row, measured
    # 2x on q27. The expression is never null (the CASE always yields an
    # array), so the coalesce is value-free; it only kills the inferred
    # filter.
    sizes = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.coalesce(
            F.size(F.array_distinct(shingle_array(text_col, k))).cast("bigint"),
            F.lit(-1).cast("bigint"),
        ).alias("n_sh"),
    )
    shared = (
        cand.join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.lit(1_000_000.0) * F.col("shared") / (
        F.col("n_a") + F.col("n_b") - F.col("shared")
    )
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= F.lit(float(threshold_ppm)))
        .select(
            "id_a", "id_b", F.floor(jac).cast("bigint").alias("jaccard_ppm")
        )
    )


def incremental_verified_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    index: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold_ppm: int = 800_000,
    broadcast_batch: bool = True,
    pin: bool = False,
) -> DataFrame:
    """Admit a new batch against an already-deduped, LSH-indexed corpus —
    the production incremental shape: as batches stream in (the CDC feed
    this engine ingests), each is deduped against the accumulated corpus
    WITHOUT reprocessing the corpus.

    Cost model at 100 TB: the corpus contributes (a) its band index — one
    streamed probe join, never shuffled when ``broadcast_batch`` holds the
    batch's (id, band, key) relation on every executor (batch << corpus,
    the steady state) — and (b) text for only the candidate-matched corpus
    docs (semi-join pushdown before shingling). Everything else is
    proportional to the batch.

    Decision rule (matches q39's non-chained min-id convention): a new doc
    is dropped iff its exact word-k-gram Jaccard is >= threshold against
    any corpus doc or any batch doc with a smaller id; ``dup_of`` is the
    least such id. Candidate generation is MinHash-LSH (bands x rows over
    num_hashes), verification is exact — sketch for recall, exact check
    for precision, so the output is engine-independent and oracle-checkable.

    Returns one row per batch doc: (id_col, keep BOOLEAN, dup_of BIGINT
    nullable).
    """
    new_buckets = minhash_band_index(new_df, text_col, id_col, k, num_hashes, bands)
    if broadcast_batch:
        new_buckets = F.broadcast(new_buckets)
    if index is None:
        index = minhash_band_index(corpus_df, text_col, id_col, k, num_hashes, bands)
    else:
        # A prebuilt index built with different (k, num_hashes, bands)
        # produces zero corpus candidates — every near-dup would be
        # silently admitted. Indexes built by minhash_band_index carry
        # their parameters as column metadata; reject a mismatched stamp.
        # An unstamped index (hand-built relation) is accepted but the
        # parameter invariant is the caller's responsibility.
        try:
            stamp = dict(index.schema["band"].metadata or {})
        except (KeyError, TypeError):
            stamp = {}
        want = {"lsh_k": k, "lsh_num_hashes": num_hashes, "lsh_bands": bands}
        got = {kk: stamp[kk] for kk in want if kk in stamp}
        if got and got != want:
            raise ValueError(
                f"prebuilt LSH index parameter mismatch: index has {got}, "
                f"probe requested {want} — rebuild the index or pass "
                f"matching k/num_hashes/bands"
            )
        # Scheme drift is worse than parameter drift: same (k, hashes,
        # bands) under a different hash scheme shares zero band keys, so
        # the probe would silently return no corpus candidates. A stamp
        # without lsh_scheme predates versioning and is accepted (only
        # one scheme has ever existed); a PRESENT-but-different scheme
        # must refuse with migration guidance.
        got_scheme = stamp.get("lsh_scheme")
        if got_scheme is not None and got_scheme != LSH_SCHEME:
            raise ValueError(
                f"prebuilt LSH index signature-scheme mismatch: index was "
                f"built under {got_scheme!r}, this build computes "
                f"{LSH_SCHEME!r}. Persisted signatures/band keys are not "
                f"comparable across schemes (a probe would silently admit "
                f"every near-dup). Migrate by rebuilding the index from "
                f"the corpus with minhash_band_index under the current "
                f"scheme, then resume update_band_index maintenance."
            )

    nb = new_buckets.select(
        F.col("id").alias("new_id"), "band", "key"
    )
    # batch x corpus: probe the index; batch x batch: bucket self-join.
    cand_corpus = (
        index.join(nb, ["band", "key"])
        .select("new_id", F.col("id").alias("other_id"))
        .dropDuplicates(["new_id", "other_id"])
    )
    nb2 = new_buckets.select(F.col("id").alias("other_id"), "band", "key")
    cand_batch = (
        nb.join(nb2, ["band", "key"])
        .filter(F.col("other_id") < F.col("new_id"))
        .select("new_id", "other_id")
        .dropDuplicates(["new_id", "other_id"])
    )
    cand = cand_corpus.unionByName(cand_batch).dropDuplicates(["new_id", "other_id"])
    if pin:
        # The candidate relation feeds the corpus semi-join, both
        # verification joins, and the final outer join; lazily it is
        # re-derived (index probe + bucket self-join) once per consumer —
        # measured 4 duplicated subtrees in the executed plan. Callers in
        # an eager context (the curation/drain sinks, which run this per
        # micro-batch) pass pin=True to materialize it once; the default
        # stays lazy so registry queries remain composable plans.
        cand = cand.localCheckpoint(eager=True)

    # Exact verification: shingle only the batch plus the candidate-matched
    # corpus docs (semi-join prunes the corpus scan to candidates). The
    # candidate-id side is batch-bounded and MUST broadcast: unhinted,
    # this planned as a SortMergeJoin that sorts the CORPUS every batch.
    touched = corpus_df.join(
        F.broadcast(
            cand.select(F.col("other_id").alias(id_col)).dropDuplicates()
        ),
        id_col,
        "left_semi",
    )
    sh = shingles(new_df.unionByName(touched), text_col, id_col, k)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    shared = (
        cand.join(sh.select(F.col("id").alias("new_id"), "shingle"), "new_id")
        .join(sh.select(F.col("id").alias("other_id"), "shingle"), ["other_id", "shingle"])
        .groupBy("new_id", "other_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.lit(1_000_000.0) * F.col("shared") / (
        F.col("n_new") + F.col("n_other") - F.col("shared")
    )
    dup_of = (
        shared.join(
            sizes.select(F.col("id").alias("new_id"), F.col("n_sh").alias("n_new")),
            "new_id",
        )
        .join(
            sizes.select(F.col("id").alias("other_id"), F.col("n_sh").alias("n_other")),
            "other_id",
        )
        .filter(jac >= F.lit(float(threshold_ppm)))
        .groupBy("new_id")
        .agg(F.min("other_id").alias("dup_of"))
    )
    return (
        new_df.select(F.col(id_col))
        # dup_of has at most one row per batch doc — broadcast, never sort
        .join(
            F.broadcast(dup_of.withColumnRenamed("new_id", id_col)),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.col("dup_of").isNull().alias("keep"),
            F.col("dup_of").cast("bigint").alias("dup_of"),
        )
    )


def update_band_index(
    index: DataFrame,
    admitted_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Append the newly ADMITTED (kept) docs' band keys to the corpus
    index — the maintenance half of the incremental loop: admit a batch
    (incremental_verified_dedup), filter to keep=true, extend the index,
    repeat. Only survivors enter the index, so later batches dedup
    against the deduped corpus (greedy chained semantics across batches;
    within a batch the min-id rule stays non-chained, matching q39).

    In production the index is a (band, key)-bucketed table and this is
    an append of bands rows per admitted doc; here it is the same plan as
    a DataFrame union.
    """
    return index.unionByName(
        minhash_band_index(admitted_df, text_col, id_col, k, num_hashes, bands)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold_ppm: int = 900_000,
    max_df: int = 1000,
) -> DataFrame:
    """Near-containment detection: asymmetric shingle overlap
    |A ∩ B| / |A| — doc A mostly contained in doc B even when symmetric
    Jaccard is low (a paragraph quoted inside a long page, boilerplate
    wrapped around distinct bodies). Jaccard-threshold dedup structurally
    misses these: J(A,B) <= |A|/|B|, so a 10x longer host page caps
    Jaccard at 0.1 while containment is ~1.0.

    Same scalable shape as ngram_jaccard_pairs — df-capped shingle
    equi-join materializes only co-shingled pairs, never n^2; per-pair
    state is counts, all shuffles partial-aggregated. Emits BOTH
    orientations: (id_in, id_out, containment_ppm) with containment =
    shared / n_in >= threshold, id_in != id_out.

    Denominator semantics: per-doc sizes (n_in) are computed from the
    UNFILTERED shingle relation; the df-cap (stop_shingle_filter) applies
    only to the pair-generating self-join. Capping both would shrink |A|
    for boilerplate-heavy docs and inflate shared/n_in past the threshold
    (the asymmetric ratio, unlike Jaccard, is not robust to dropping hot
    shingles from the denominator). With sizes uncapped, a fired cap can
    only LOWER the reported ratio — conservative, never a false positive.
    """
    sh_full = shingles(df, text_col, id_col, k)
    sh = stop_shingle_filter(sh_full, max_df, detect_rate_4096=32)
    sizes = sh_full.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    # df-capped input -> the group-and-combine pair block applies (its
    # documented precondition holds; same relation, fewer exchanges)
    shared = shared_pair_counts(sh)
    joined = shared.join(
        sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a"
    ).join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
    # Both orientations from the ordered pair relation via ONE narrow
    # explode — the fwd.union(rev) form planned and executed the whole
    # shared-pair subtree (shingle explodes, pair aggregate, both size
    # joins) twice; rows are identical, only the evaluation topology
    # changes (the connected_components / symmetrize pattern).
    both = joined.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("id_in"),
                    F.col("id_b").alias("id_out"),
                    (
                        F.lit(1_000_000.0) * F.col("shared") / F.col("n_a")
                    ).alias("ratio"),
                ),
                F.struct(
                    F.col("id_b").alias("id_in"),
                    F.col("id_a").alias("id_out"),
                    (
                        F.lit(1_000_000.0) * F.col("shared") / F.col("n_b")
                    ).alias("ratio"),
                ),
            )
        ).alias("e")
    ).select("e.id_in", "e.id_out", "e.ratio")
    return (
        both.filter(F.col("ratio") >= F.lit(float(threshold_ppm)))
        .select(
            "id_in",
            "id_out",
            F.floor(F.col("ratio")).cast("bigint").alias("containment_ppm"),
        )
    )


def fuzzy_prefix_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 80,
    max_distance: int = 20,
    max_block: int = 1000,
) -> DataFrame:
    """Edit-distance near-dup candidates via blocked Levenshtein over
    document prefixes — the fuzzy-matching complement to shingle Jaccard
    (catches char-level typo/OCR variants that keep word order; Jaccard
    catches word-level overlap regardless of spelling).

    Scalable entity-resolution shape: block on a cheap deterministic key
    (first token), equi-join within blocks only — never the n^2 cross
    product — and verify with the banded-DP Levenshtein (threshold
    variant: cost O(prefix_len * max_distance) per pair, early-exit -1
    above the band). Blocks larger than ``max_block`` are excluded
    entirely (the skew guard, same philosophy as stop_shingle_filter:
    one boilerplate prefix token can't go quadratic); the exclusion is a
    deterministic function of the data, so a SQL oracle reproduces it
    exactly. Levenshtein is integer-valued and identically defined in
    Spark and DuckDB — no float drift.

    Returns (id_a, id_b, edit_distance) with id_a < id_b and
    edit_distance <= max_distance.
    """
    d = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.substring(F.col(text_col), 1, prefix_len).alias("pre"),
        F.split(F.col(text_col), " ").getItem(0).alias("blk"),
    )
    # Exclude via an anti-join against the HOT block list (tiny by
    # construction — same broadcast-side argument as stop_shingle_filter;
    # broadcasting the allowed list would ship the whole vocabulary).
    hot = (
        d.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_block)
        .select("blk")
    )
    db = d.join(F.broadcast(hot), "blk", "left_anti")
    a, b = db.alias("a"), db.alias("b")
    dist = F.levenshtein(F.col("a.pre"), F.col("b.pre"), max_distance)
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            dist.cast("bigint").alias("edit_distance"),
        )
        .filter((F.col("edit_distance") >= 0) & (F.col("edit_distance") <= max_distance))
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document, UDF-free.

    For each token hash h and bit position j, accumulate +1/-1 on bit j;
    signature bit j = (sum > 0). Implemented as explode(token) ->
    explode(bit) -> signed counts -> bit reassembly. Two shuffles, both
    with map-side combine; at 100 TB prefer sampling long docs first.
    """
    df = ensure_parallelism(df)
    toks = tokens(F.col(text_col))
    tok = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
    h = tok.withColumn("h", F.xxhash64(F.col("tok")))
    bits = h.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
        F.col("h"),
    ).withColumn(
        "sgn",
        F.when(F.expr("(shiftright(h, bit) & 1L) = 1"), 1).otherwise(-1),
    )
    bit_sums = bits.groupBy("id", "bit").agg(F.sum("sgn").alias("s"))
    sig = bit_sums.groupBy("id").agg(
        F.sum(F.expr("IF(s > 0, shiftleft(1L, bit), 0L)")).alias("simhash")
    )
    return sig


def simhash_near_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming via pigeonhole
    banding: split 64 bits into 4 16-bit keys; any pair within distance 3
    must agree on >=1 key, so a 4-way bucket join finds all candidates."""
    sig = simhash_signatures(df, text_col, id_col)
    parts = [
        F.shiftright(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(f"p{i}")
        for i in range(4)
    ]
    banded = sig.select("id", "simhash", F.explode(
        F.array(*[F.struct(F.lit(i).alias("band"), parts[i].alias("key")) for i in range(4)])
    ).alias("bk")).select("id", "simhash", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def connected_components(
    edges: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph by iterative
    min-label propagation: every vertex starts labeled with its own id and
    repeatedly takes the minimum of its own and its neighbors' labels until
    a fixpoint — the label converges to the smallest id in the component,
    i.e. the canonical representative a dedup pipeline keeps.

    This is the standard scalable CC formulation (Pregel-style message
    passing, cf. GraphX/GraphFrames): each round is one shuffle-join + one
    min-aggregate, converging in O(component diameter) rounds — tiny for
    dedup clusters. `localCheckpoint` truncates the growing lineage each
    round so plans stay flat at any scale; the fixpoint test is a cheap
    count aggregate, not a collect of the labels.

    Returns (vertex BIGINT, component BIGINT). Reference analogue: the
    reference has no graph ops at all; this consumes the pair lists its
    dedup queries produce (SURVEY.md §7 north-star operators).
    """
    # Both edge directions via ONE narrow explode, not a self-union: the
    # union form evaluated the whole upstream `edges` subtree twice
    # before the pin (for q130 that is two full runs of the Arrow-UDF
    # dHash pipeline + band join) — guide §2.4 / §1.2-1. Rows are
    # identical; only the evaluation topology changes.
    und = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(id_a).cast("long").alias("u"),
                    F.col(id_b).cast("long").alias("v"),
                ),
                F.struct(
                    F.col(id_b).cast("long").alias("u"),
                    F.col(id_a).cast("long").alias("v"),
                ),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    # Route the pin through ONE AQE-sized shuffle keyed on the join key:
    # the checkpointed RDD's partition count is then scale-adaptive (a
    # tiny graph coalesces to 1 partition instead of inheriting ~10
    # near-empty upstream tasks re-scheduled every propagation round; a
    # huge graph gets target-size partitions). The headline win of this
    # shape is the single subtree evaluation above
    # (plans/r14/q64_cc_edges_*.txt: HashAggregate 56 -> 28, Exchange
    # tree nodes 30 -> 16 for q64's edge build).
    pinned = und.repartition("v").localCheckpoint(eager=True)
    # Co-partition ONCE and keep it (guide §2.2): localCheckpoint does
    # NOT preserve hash partitioning (the pinned scan reports
    # UnknownPartitioning — verified on 4.1, r14 round-join plans), so
    # in r14 every propagation round re-exchanged BOTH sides — iters x
    # the full edge list, the dominant per-round cost at graph scale. A
    # persisted repartition(n, v) DOES advertise HashPartitioning(v, n)
    # from the InMemoryTableScan, so each round's join now exchanges
    # only the label side (|V| rows), never the 2|E| edge rows
    # (executed plans in plans/r15/q64_cc_round_join_*.txt). n is the
    # AQE-sized pin's own partition count — scale-adaptive, 1 for a
    # tiny graph, target-size partitions for a huge one. The cache is
    # function-scoped (unpersisted in the finally), and the checkpoint
    # below it keeps round plans flat.
    n_part = max(1, pinned.rdd.getNumPartitions())
    # A single-partition pin (tiny graph) gains nothing from the cache
    # layer — EnsureRequirements re-exchanges a 1-partition child to the
    # session parallelism anyway, and the rows are trivially few; keep
    # r14's exact shape there.
    und = (
        pinned.repartition(n_part, F.col("v")).persist()
        if n_part > 1
        else pinned
    )
    try:
        labels = und.select("u").distinct().withColumn("lbl", F.col("u"))
        changed = 0
        for _ in range(max_iter):
            nbr_min = (
                und.join(labels.withColumnRenamed("u", "w"), F.col("v") == F.col("w"))
                .groupBy("u")
                .agg(F.min("lbl").alias("nbr_lbl"))
            )
            # (A pointer-jumping variant — additionally following the hopped
            # label through the previous round's map — was measured and
            # rejected: it cut rounds only 10 -> 8 on the sf0.1 graph while
            # adding a join per round; min-propagation over BOTH edge
            # directions already spreads labels fast.)
            new_labels = (
                labels.join(nbr_min, "u", "left")
                .select(
                    "u",
                    F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias(
                        "new_lbl"
                    ),
                    "lbl",
                )
            ).localCheckpoint(eager=True)
            changed = new_labels.filter(F.col("new_lbl") != F.col("lbl")).count()
            labels = new_labels.select("u", F.col("new_lbl").alias("lbl"))
            if changed == 0:
                break
    finally:
        und.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"({changed} labels still changing); component diameter exceeds "
            "max_iter — raise max_iter (rounds needed = O(diameter))."
        )
    return labels.select(F.col("u").alias("vertex"), F.col("lbl").alias("component"))


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing any word-k-gram
    with an evaluation set (the GPT-3-style n-gram overlap check run before
    LLM training).

    Returns (id, n_hit_shingles) for contaminated documents only. The
    benchmark's distinct shingle set is tiny next to the corpus (eval
    suites are MBs, corpora are TBs), so it broadcasts and the corpus side
    never shuffles — the check runs at scan bandwidth. If a benchmark ever
    outgrows broadcast range, drop the hint and the same plan becomes a
    shuffle semi-join keyed by shingle.
    """
    bench_sh = (
        shingles(benchmark, text_col, id_col, k)
        .select("shingle")
        .distinct()
    )
    corpus_sh = shingles(corpus, text_col, id_col, k)
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hit_shingles"))
    )

def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Cross-document duplicated-span report: every word-k-gram that occurs
    in at least `min_df` distinct documents, with its document frequency
    and the minimum containing doc id as the canonical example.

    This is the span-granularity view of exact-substring training-data
    dedup (Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): instead of pairing documents (ngram_jaccard_pairs) it
    surfaces the repeated substrings themselves, which is what a removal
    pass actually operates on. Suffix-array tooling finds maximal repeats;
    the fixed-k shingle formulation here is the shuffle-friendly
    approximation — any duplicated substring of length >= k words is
    covered by at least one duplicated k-gram.

    Plan shape: shingle explode (narrow, fan-out guarded), then ONE
    hash-shuffle on the shingle value with map-side partial aggregation.
    Unlike the pair-join family there is no self-join, so a hot span costs
    O(df) aggregate rows, never O(df^2) — this operator is itself the
    linear-cost tool for finding the hot spans that would blow up a join.
    """
    sh = shingles(df, text_col, id_col, k)  # distinct (id, shingle)
    return (
        sh.groupBy("shingle")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.min("id").alias("example_id"),
        )
        .filter(F.col("df") >= min_df)
    )


def doc_blocks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Partition each document's token stream into consecutive
    NON-overlapping k-token blocks: (id, blk, btext), blk 0-based.

    Unlike `shingles` (sliding, for similarity) blocks tile the document,
    so the per-doc fan-out is n_tokens/k rows, not n_tokens — this is the
    unit a removal pass rewrites, and the tiling keeps the explode k times
    cheaper than the sliding form. The trailing partial block (< k tokens)
    is kept as its own block so reassembly is lossless.
    """
    df = ensure_parallelism(df)
    toks = tokens(F.col(text_col))
    blocks = F.transform(
        F.sequence(
            F.lit(0),
            F.floor((F.size(toks) + F.lit(k - 1)) / F.lit(k)).cast("int") - 1,
        ),
        lambda i: F.array_join(F.slice(toks, (i * k + 1).cast("int"), k), " "),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(blocks).alias("blk", "btext"),
    )


def remove_duplicated_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """C4-style cross-document segment removal (Raffel et al. 2020 §2.2
    removed any three-sentence span occurring more than once in the
    corpus; here the unit is a k-token block): every block of k
    consecutive tokens that appears verbatim in >= min_df distinct
    documents is cut from ALL of them, and each document is reassembled
    from its surviving blocks in order.

    Returns (id_col, clean_text, removed_blocks) — one row per input
    document, clean_text == '' when everything was duplicated.

    This is the rewrite counterpart of `duplicated_spans` (the report).
    Reference analog: the redaction/size filters rewrite single events
    (stream_cdc/filters at filters/__init__.py parity); this operator is
    the corpus-level rewrite the reference has no counterpart for.

    Plan shape, scale notes (100 TB):
      1. block tiling is narrow (doc_blocks), fan-out n_tok/k;
      2. block document-frequency = distinct(btext, id) -> groupBy(btext)
         with map-side partial aggregation — ONE content shuffle;
      3. flagging joins blocks to the duplicated-block set on btext. Each
         block row matches at most one flag row, so there is NO fan-out;
         a viral segment shared by millions of docs is a skewed-key join
         handled by AQE skew split (exercised in test_skew_guards.py);
      4. reassembly groups by doc id — collect_list of (blk, btext)
         structs, array_sort, array_join. Per-doc state is the document
         itself, so memory is bounded by max doc size, not corpus size.
    No sort, no window over the corpus, no Python in the hot path.
    """
    b = doc_blocks(df, text_col, id_col, k)
    dup = (
        b.select("btext", "id")
        .distinct()
        .groupBy("btext")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("btext", F.lit(True).alias("dup"))
    )
    flagged = b.join(dup, "btext", "left")
    kept = F.array_sort(
        F.collect_list(
            F.when(F.col("dup").isNull(), F.struct("blk", "btext"))
        )
    )
    return (
        flagged.groupBy(F.col("id").alias(id_col))
        .agg(
            F.array_join(
                F.transform(kept, lambda s: s.getField("btext")), " "
            ).alias("clean_text"),
            F.sum(F.when(F.col("dup").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("removed_blocks"),
        )
    )


def survivorship(
    docs: DataFrame,
    edges: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Canonical-record selection over near-dup clusters (entity-resolution
    survivorship): cluster docs by connected components of the pair graph,
    then elect one canonical per cluster — highest ``score_col``, ties to
    the smallest id. Docs in no pair are their own (singleton) canonical.

    The keep-one-per-cluster policy a curation pipeline applies after
    near-dup detection when it wants the BEST copy, not the first-seen
    copy (contrast q39's min-id rule). Plan: the CC label propagation
    (O(diameter) rounds), one broadcast-friendly label join, one per-
    cluster window — no additional pair materialization.

    Returns (id_col, cluster, canonical_id, is_canonical).
    """
    comp = connected_components(edges, id_a, id_b)  # (vertex, component)
    labeled = docs.join(
        comp.select(
            F.col("vertex").alias(id_col), F.col("component").alias("cluster")
        ),
        id_col,
        "left",
    ).withColumn("cluster", F.coalesce(F.col("cluster"), F.col(id_col)))
    # The elected id reaches every cluster row through the SAME ordered
    # window (first() over unboundedPreceding..currentRow always sees the
    # partition's top row), so no canon self-join exists at all — one
    # cluster-keyed shuffle total. The former canon relation was one row
    # per cluster (worst case, all singletons: O(#docs)), so its static
    # broadcast hint was a driver-OOM hazard at 100 TB (round-5 advice);
    # now there is nothing to broadcast.
    w = Window.partitionBy("cluster").orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    return labeled.select(
        id_col,
        F.col("cluster").cast("bigint").alias("cluster"),
        F.first(F.col(id_col)).over(w).cast("bigint").alias("canonical_id"),
    ).withColumn("is_canonical", F.col(id_col) == F.col("canonical_id"))
