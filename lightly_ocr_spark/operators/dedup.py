"""Deduplication operators for web-scale corpora.

All variants are expressed as DataFrame plans (one or two shuffles, no
Python row loops):

* exact     — hash-groupBy on a content fingerprint; one shuffle.
* jaccard   — token-set overlap via explode + self-equi-join on token; the
              join key is the token so Catalyst/AQE handle skew; intended
              for candidate *verification*, not all-pairs at scale.
* minhash   — k independent min-hashes (xxhash64 salted per seed) banded
              into LSH buckets; candidate pairs only ever materialize within
              a bucket, which is the scale path for 10^12 docs.
* simhash   — 64-bit sign-vote fingerprint; near-dups differ in few bits.
"""

from __future__ import annotations

from functools import reduce

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from lightly_ocr_spark.plans.relational import load, spread

MINHASH_K = 32          # signature length
MINHASH_BANDS = 8       # 8 bands x 4 rows
SIM_BITS = 64


def lower_words(text_col="text") -> F.Column:
    """text -> array of non-empty lowercase whitespace tokens."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: F.length(w) > 0
    )


def word_ngrams(words: F.Column, n: int) -> F.Column:
    """Word n-gram shingles (space-joined), EMPTY array when the doc has
    fewer than n words — the single shared shingle expression used by the
    decontamination, components, and repetition operators (and their
    DuckDB oracles), so the slice bounds cannot drift between copies.
    (`_tokens` keeps its separate whole-doc fallback for minhash: a short
    doc must still hash to SOMETHING there.)"""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - n + 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _tokens(df: DataFrame, id_col: str = "doc_id", ngram: int = 1) -> DataFrame:
    """doc -> distinct lowercase shingles (exploded), all JVM-side.

    ngram=1: word tokens; ngram>=2: word n-gram shingles (order-sensitive —
    the right choice for near-dup detection over real text; unigrams
    over-trigger whenever documents share a vocabulary).

    The words array is materialized as its OWN projection before the
    shingle transform: higher-order lambdas are interpreted, and an inlined
    `split()` child is re-evaluated by every per-element `slice()` call —
    O(words^2) per document (measured 9x on the 50k-batch signature build:
    21.3s inline -> 2.4s two-step).  CollapseProject leaves the split
    materialized because the alias is referenced more than once and is
    non-cheap."""
    words = lower_words()
    if ngram <= 1:
        return (
            df.select(
                id_col, F.explode(F.array_distinct(words)).alias("tok")
            )
            .filter(F.length("tok") > 0)
        )
    w = df.select(id_col, words.alias("_words"))
    wc = F.col("_words")
    shingles = F.when(
        F.size(wc) >= ngram,
        F.transform(
            F.sequence(F.lit(1), F.size(wc) - ngram + 1),
            lambda i: F.concat_ws(" ", F.slice(wc, i, ngram)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", wc)))
    return (
        w.select(id_col, F.explode(F.array_distinct(shingles)).alias("tok"))
        .filter(F.length("tok") > 0)
    )


def _md5_grams(df: DataFrame, ngram: int, id_col: str = "doc_id") -> DataFrame:
    """doc -> distinct md5'd lowercase word n-grams (exploded) — the shared
    gram projection for decontamination and dup-components.  Words are
    materialized as their own projection first (see `_tokens`: an inlined
    split is re-evaluated per lambda element, O(words^2) per doc)."""
    w = df.select(id_col, lower_words().alias("_words"))
    return w.select(
        id_col,
        F.explode(F.array_distinct(
            F.transform(word_ngrams(F.col("_words"), ngram), F.md5)
        )).alias("gram"),
    )


def exact_dups(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: groups with >1 identical text; keeper = min doc_id.
    (Input doubled on doc_id<50 so duplicate groups actually exist.)
    NOT `spread` (round 6, measured): one md5 + 16-byte partial-agg key
    per row is too light to amortize the fan-out shuffle of the full
    text — 0.45 s serial vs 0.70 s spread at 50k docs (the map-side
    partial aggregation already shrinks what the existing Exchange
    carries to one row per distinct hash)."""
    d = load(spark, sf, "documents").select("doc_id", "text")
    doubled = d.unionByName(d.filter(F.col("doc_id") < 50))
    return (
        doubled.groupBy(F.md5("text").alias("content_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("n_copies") > 1)
    )


def jaccard_pairs(spark: SparkSession, sf: str, max_id: int = 150,
                  threshold: float = 0.8,
                  df_cap_frac: float = 0.5) -> DataFrame:
    """N-gram (unigram) Jaccard near-dup pairs among doc_id < max_id.

    |A∩B| via token equi-join, |A|,|B| via counts; jaccard kept in exact
    integer form: inter * 100 >= threshold*100 * (|A|+|B|-inter).

    Skew guard: tokens present in more than `df_cap_frac` of the candidate
    docs are dropped BEFORE the self-join (from both the intersection and
    the set sizes — i.e. jaccard over the df-capped token sets).  Without
    this, one ubiquitous token ("the") joins every doc with every other doc
    and the equi-join key carries O(N^2) candidates no matter what AQE does;
    with it the hottest surviving key touches at most df_cap docs, so pair
    candidates are bounded by N * df_cap.  Deterministic, so the DuckDB
    oracle applies the identical cap."""
    d = load(spark, sf, "documents").filter(F.col("doc_id") < max_id)
    return jaccard_pairs_df(d, threshold=threshold,
                            df_cap=int(max_id * df_cap_frac))


def jaccard_pairs_df(d: DataFrame, threshold: float = 0.8,
                     df_cap: int = 75) -> DataFrame:
    """Core of `jaccard_pairs` over an arbitrary (doc_id, text) frame."""
    raw = _tokens(d)
    # tokens with document frequency <= df_cap (the distinct token list is
    # dwarfed by the doc-token pairs even at 10^12 docs)
    rare = (
        raw.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("tok")
    )
    toks = raw.join(rare, "tok")
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    thr = int(round(threshold * 100))
    return (
        inter.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
        .filter(
            F.col("inter") * 100
            >= thr * (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        )
        .select("id_a", "id_b", "inter", "sz_a", "sz_b")
    )


def minhash_signatures(
    df: DataFrame, k: int = MINHASH_K, ngram: int = 1
) -> DataFrame:
    """doc_id -> k-column minhash signature (one shuffle: groupBy doc_id)."""
    toks = _tokens(df, ngram=ngram)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("tok"))).alias(f"mh{i}")
        for i in range(k)
    ]
    return toks.groupBy("doc_id").agg(*aggs)


def band_buckets(
    sig: DataFrame, k: int = MINHASH_K, bands: int = MINHASH_BANDS
) -> DataFrame:
    """Signature frame (doc_id, mh0..mh{k-1}) -> stacked LSH bucket rows
    (doc_id, band, bh): rows-per-band split, per-band xxhash64, one
    explode.  The single shared banding projection — candidate-pair
    generation, the curation pipeline, and the persisted near-dup index
    all derive buckets from here so the bucket layout cannot drift."""
    if k % bands:
        raise ValueError(
            f"k={k} not divisible by bands={bands}: the trailing "
            f"{k % bands} signature columns would silently never hash "
            "into any bucket, weakening recall"
        )
    rows_per_band = k // bands
    band_cols = [
        F.xxhash64(
            F.lit(b),
            *[F.col(f"mh{b * rows_per_band + j}") for j in range(rows_per_band)],
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    return banded.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bh"))
                for b in range(bands)
            ])
        ).alias("e"),
    ).select("doc_id", "e.band", "e.bh")


def cap_buckets(stacked: DataFrame, max_bucket: int | None) -> DataFrame:
    """Drop LSH buckets holding more than `max_bucket` members before any
    pair/candidate join.  A mega-bucket means a DEGENERATE band hash
    (boilerplate shingle shared corpus-wide) and contributes pairs
    quadratic in its size while carrying near-zero signal — the classic
    LSH hot-bucket scale-killer at 10^12 docs.  Skipping it degrades
    recall gracefully: a true near-dup pair still collides in any of the
    other bands (8 bands here), and byte-identical / boilerplate content
    is what exact, line, and passage dedup already catch.  `None`
    disables the cap (exact legacy behavior).

    Bucket size counts DISTINCT ids, not rows: the near-dup index's
    append crash window legally leaves duplicate bucket rows (absorbed
    by the candidate `distinct`), and a row count would double-count
    them into spuriously capping a legitimate bucket."""
    if max_bucket is None:
        return stacked
    if max_bucket < 1:
        raise ValueError(
            f"max_bucket must be >= 1, got {max_bucket}: a non-positive "
            "cap drops every bucket, silently disabling near-dedup while "
            "still paying the full signature cost (pass None to disable "
            "the cap)"
        )
    others = [c for c in stacked.columns if c not in ("band", "bh")]
    if len(others) != 1:
        raise ValueError(
            f"cap_buckets expects exactly one id column besides "
            f"(band, bh), got {stacked.columns}: project extras (e.g. a "
            "bh_prefix partition column) away first, or the distinct "
            "count silently runs over the wrong column"
        )
    id_col = others[0]
    keep = (
        stacked.groupBy("band", "bh")
        .agg(F.count_distinct(F.col(id_col)).alias("_n"))
        .filter(F.col("_n") <= max_bucket)
        .select("band", "bh")
    )
    return stacked.join(keep, ["band", "bh"])


def _pairs_from_stacked(stacked: DataFrame) -> DataFrame:
    """Stacked bucket rows (doc_id, band, bh) -> distinct candidate pairs
    (id_a < id_b) sharing at least one bucket — the single join tail
    used by both the xxhash64 fast path and the portable md5 query, so
    the pair semantics cannot drift between them."""
    x = stacked.alias("x")
    y = stacked.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b")
        )
        .distinct()
    )


def band_candidate_pairs(
    sig: DataFrame, k: int = MINHASH_K, bands: int = MINHASH_BANDS,
    max_bucket: int | None = None,
) -> DataFrame:
    """Signature frame (doc_id, mh0..mh{k-1}) -> distinct candidate pairs
    (id_a < id_b) sharing at least one LSH band hash, via the shared
    `band_buckets` projection and a self-equi-join on (band, hash).
    `max_bucket` skips degenerate hot buckets (see `cap_buckets`)."""
    return _pairs_from_stacked(
        cap_buckets(band_buckets(sig, k, bands), max_bucket)
    )


def minhash_pairs(
    spark: SparkSession, sf: str,
    k: int = MINHASH_K, bands: int = MINHASH_BANDS,
    max_id: int = 500,
) -> DataFrame:
    """MinHash-LSH candidate pairs: band-hash bucket join, pairs within
    buckets only (the 10^12-scale dedup path).  Input doubled on doc_id<50
    so true duplicate pairs exist.

    `max_id` bounds the candidate universe: the synthetic documents share a
    tiny vocabulary, so nearly every pair is a true near-dup and the pair
    count grows quadratically with corpus size — a data property, not an
    LSH failure (bucket join still never materializes cross-bucket pairs)."""
    d = spread(load(spark, sf, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < max_id
    ))
    doubled = d.unionByName(
        d.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    sig = minhash_signatures(doubled, k)
    return band_candidate_pairs(sig, k, bands)


def minhash_pairs_md5(
    spark: SparkSession, sf: str,
    k: int = MINHASH_K, bands: int = MINHASH_BANDS,
    max_id: int = 500,
) -> DataFrame:
    """PORTABLE twin of `minhash_pairs`: the k min-hashes derive from
    md5 (min over tokens of the 60-bit integer value of
    md5(i:token)[:15]), and band hashes are md5 over the comma-joined
    band minima — every step exact integer/string math DuckDB
    reproduces verbatim, so this query is fully oracle-checkable.  The
    xxhash64 operator pipeline stays the engine fast path (one cheap
    hash per (seed, token) vs an md5 here); candidate-pair semantics
    are identical (same banding, same bucket-join shape)."""
    d = spread(load(spark, sf, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < max_id
    ))
    doubled = d.unionByName(
        d.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    toks = _tokens(doubled)
    mh = toks.groupBy("doc_id").agg(*[
        F.min(F.conv(F.substring(
            F.md5(F.concat_ws(":", F.lit(str(i)), F.col("tok"))), 1, 15
        ), 16, 10).cast("long")).alias(f"mh{i}")
        for i in range(k)
    ])
    rows_per_band = k // bands
    stacked = mh.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *[
                    F.col(f"mh{b * rows_per_band + j}").cast("string")
                    for j in range(rows_per_band)
                ])).alias("bh"),
            )
            for b in range(bands)
        ])).alias("e"),
    ).select("doc_id", "e.band", "e.bh")
    return _pairs_from_stacked(stacked)


def simhash(df: DataFrame) -> DataFrame:
    """doc_id -> 64-bit SimHash: per-bit sign votes over token hashes."""
    toks = _tokens(df).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            (F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v{i}")
        for i in range(SIM_BITS)
    ]
    per_doc = toks.groupBy("doc_id").agg(*votes)
    bit_terms = [
        F.when(F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i))
        .otherwise(F.lit(0).cast("long"))
        for i in range(SIM_BITS)
    ]
    return per_doc.select(
        "doc_id", reduce(lambda a, b: a.bitwiseOR(b), bit_terms).alias("simhash")
    )


def simhash_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    return simhash(spread(load(spark, sf, "documents")
                          .select("doc_id", "text")))


def simhash_md5(df: DataFrame) -> DataFrame:
    """64-bit SimHash with PORTABLE bit votes: per-token md5, one vote per
    hex digit bit — (doc_id, simhash_hex) where simhash_hex[j] encodes the
    sign votes of md5-digit j's four bits (bit b of digit j = vote of
    token md5 digit j bit b; >0 -> 1, else 0).

    Same locality semantics as `simhash` (xxhash64 bits are uniform and so
    are md5 bits) but every step — md5, hex-digit extraction, bit shifts,
    vote sums — is exact integer math DuckDB reproduces verbatim, so the
    driver gate gets a full value-hash row instead of rows-only evidence.
    The xxhash64 variant stays the engine fast path (one hash vs sixteen
    digit extractions per token)."""
    toks = _tokens(df).select("doc_id", F.md5("tok").alias("m"))
    digs = toks.select(
        "doc_id",
        *[
            F.conv(F.substring("m", j + 1, 1), 16, 10).cast("int")
            .alias(f"d{j}")
            for j in range(16)
        ],
    )
    votes = [
        F.sum(
            F.shiftright(F.col(f"d{i // 4}"), i % 4).bitwiseAND(F.lit(1))
            * 2 - 1
        ).alias(f"v{i}")
        for i in range(64)
    ]
    per_doc = digs.groupBy("doc_id").agg(*votes)
    hex_digit = [
        F.lower(F.conv(
            sum(
                F.when(F.col(f"v{4 * j + b}") > 0, F.lit(1 << b))
                .otherwise(F.lit(0))
                for b in range(4)
            ).cast("string"),
            10, 16,
        ))
        for j in range(16)
    ]
    return per_doc.select(
        "doc_id", F.concat(*hex_digit).alias("simhash_hex")
    )


def simhash_md5_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Driver query: portable-bit SimHash over the documents table (the
    oracled twin of `simhash_fingerprints`).  Scan `spread` (round 6):
    sixteen digit extractions per token are per-row heavy and the
    single-row-group scan otherwise runs them on one core."""
    return simhash_md5(spread(load(spark, sf, "documents")
                              .select("doc_id", "text")))


def decontaminate(
    spark: SparkSession, sf: str, ngram: int = 13,
    bench_max_id: int = 5, corpus_min_id: int = 100,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any `ngram`-gram
    with a held-out benchmark set (the GPT-3-style 13-gram overlap rule for
    keeping eval sets out of training data).

    Fingerprint = md5 of the space-joined word n-gram — portable, so the
    whole op is DuckDB-oracled end to end (unlike minhash's xxhash64).
    Plan: two n-gram explodes + one equi-join on the fingerprint; the
    benchmark side is tiny by construction (eval suites are small), so
    Catalyst broadcasts it and the corpus never shuffles."""
    d = load(spark, sf, "documents").select("doc_id", "text")

    def grams(df: DataFrame) -> DataFrame:
        return _md5_grams(df, ngram)

    bench = grams(d.filter(F.col("doc_id") < bench_max_id)).select(
        "gram"
    ).distinct()
    # corpus = the id>=corpus_min_id docs PLUS planted copies of the
    # benchmark docs (relabeled +10^6) — random synthetic text never shares
    # a 13-gram by chance, so the planted rows are what the op must catch
    planted = d.filter(F.col("doc_id") < bench_max_id).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = grams(
        d.filter(F.col("doc_id") >= corpus_min_id).unionByName(planted)
    )
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Distributed connected components over near-dup candidate pairs:
    (id_a, id_b) edges -> (id, component) where component = the smallest id
    reachable from `id` (the cluster keeper).

    Near-dup pairs are transitive in practice (A~B, B~C) and per-pair
    "drop the larger" mishandles chains; clustering makes one keeper per
    component.  Algorithm: min-label propagation — each iteration joins
    labels across edges and takes the min of own and neighbor labels,
    converging in O(log diameter) rounds: each round takes the min of own
    and neighbor labels AND pointer-jumps (label := label[label], the
    path-doubling shortcut), so even a 10^6-node path needs ~20 rounds,
    not 10^6.  `max_iter` is a safety bound; convergence is detected via
    an exact count of changed labels and NON-convergence raises.  Each
    round is two shuffles keyed by id; intermediate frames are
    checkpointed so the plan does not grow with iterations (lineage
    blowup is the classic failure of iterative DataFrame algorithms).

    Durability: with `checkpoint_dir` set, rounds use RELIABLE
    `df.checkpoint()` into that directory — on a multi-executor cluster a
    lost executor recomputes from the checkpoint files instead of killing
    the job (localCheckpoint blocks are executor-local and unrecoverable
    once lineage is truncated).  Default (None) keeps the cheaper
    `localCheckpoint`, appropriate for local mode and tests.

    Cost per round is ONE Spark action: the changed-label count rides the
    eager checkpoint via `Observation` instead of a separate count job."""
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _materialize(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        edges.select(
            F.col("id_b").alias("src"), F.col("id_a").alias("dst")
        )
    ).distinct()
    # materialize the edge set ONCE: every iteration joins against it, and
    # an unpersisted upstream plan (e.g. the whole MinHash-LSH candidate
    # pipeline in curate_job) would otherwise recompute per round —
    # measured 400s vs 45s for the curation job on 5k pages
    sym = _materialize(sym)
    if nodes is None:
        nodes = sym.select(F.col("src").alias("id")).distinct()
    else:
        # a missing endpoint would silently sever connectivity through it
        # (its neighbors never learn each other's labels) — fail loudly
        uncovered = (
            sym.select(F.col("src").alias("id"))
            .join(nodes.select("id"), "id", "left_anti")
            .count()
        )
        if uncovered:
            raise ValueError(
                f"{uncovered} edge endpoint(s) missing from `nodes`: "
                "components through them would be silently split — pass a "
                "covering node set or omit `nodes`"
            )
    labels = nodes.select("id", F.col("id").alias("component"))
    labels = _materialize(labels)
    for _ in range(max_iter):
        # neighbor's current label, min'd with own; the previous label is
        # threaded through as old_component so change detection needs no
        # extra self-join
        nbr = (
            sym.join(labels, sym["dst"] == labels["id"])
            .select(F.col("src").alias("id"),
                    F.col("component").alias("nbr_comp"))
            .groupBy("id")
            .agg(F.min("nbr_comp").alias("nbr_comp"))
        )
        stepped = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.col("component").alias("old_component"),
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_comp", F.col("component")),
                ).alias("component"),
            )
        )
        # pointer jump: follow the label one hop (component := its own
        # component's label) — path doubling gives the log-round bound
        targets = stepped.select(
            F.col("id").alias("component"),
            F.col("component").alias("jumped"),
        )
        obs = Observation()
        new_labels = _materialize(
            stepped.join(targets, "component", "left")
            .select(
                "id",
                F.coalesce(
                    F.least("component", "jumped"), F.col("component")
                ).alias("component"),
                "old_component",
            )
            # exact changed-label count, collected DURING the checkpoint
            # materialization — one action per round, not two
            .observe(obs, F.count_if(
                F.col("component") != F.col("old_component")
            ).alias("changed"))
        )
        changed = obs.get["changed"]
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    else:
        # silent non-convergence would split a real cluster into bogus
        # components — a wrong answer is worse than an error
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds ({changed} labels still changing); raise "
            "max_iter above the largest component diameter"
        )
    return labels


def dup_components(
    spark: SparkSession, sf: str, ngram: int = 13, max_id: int = 150
) -> DataFrame:
    """Dedup clusters as a driver query: nodes are doc_id < max_id plus two
    generations of planted clones (+10^6, +2*10^6 for doc_id < 20); edges
    connect docs sharing any `ngram`-gram (md5 fingerprints — portable, so
    the WHOLE iterative algorithm is DuckDB-oracled via a recursive CTE).
    Output: (doc_id, component) with component = min doc_id of the
    cluster; singletons map to themselves."""
    d = load(spark, sf, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < max_id
    )
    clones = d.filter(F.col("doc_id") < 20)
    nodes_df = d.unionByName(
        clones.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    ).unionByName(
        clones.select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
    )

    g = _md5_grams(nodes_df, ngram)
    a, b = g.alias("a"), g.alias("b")
    edges = (
        a.join(b, (F.col("a.gram") == F.col("b.gram"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    comp = connected_components(
        edges, nodes=nodes_df.select(F.col("doc_id").alias("id"))
    )
    return comp.select(F.col("id").alias("doc_id"), "component")


def line_dedup_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_docs: int = 5,
) -> DataFrame:
    """Corpus-level boilerplate LINE removal (the RefinedWeb/CCNet move the
    reference's per-image pipeline has no analog for): any exact line that
    appears in >= `min_docs` DISTINCT documents is navigation/cookie/footer
    chrome, not content — strip it from every document and reassemble the
    survivors in original order.  Documents whose every line was chrome
    drop out entirely.

    Plan (2 shuffles, both on near-uniform keys): posexplode lines ->
    count-distinct docs per line FINGERPRINT (md5 — the aggregation and
    the anti-join shuffle 16-byte keys, never the line text itself;
    128-bit collisions are negligible even at 10^12 lines, where a 64-bit
    key would already collide tens of thousands of times) -> left_anti
    join the hot set back onto the exploded lines (AQE broadcasts it when
    the chrome vocabulary is small, which it always is relative to the
    corpus) -> groupBy doc, array_sort by position, join with newline."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("lh", F.md5("line"))
    hot = (
        lines.groupBy("lh")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("lh")
    )
    kept = lines.join(hot, "lh", "left_anti")
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias(text_col)
        )
    )


def line_dedup(spark: SparkSession, sf: str, min_docs: int = 5) -> DataFrame:
    """Driver query for line-level dedup: the flat documents table gains
    deterministic 'lines' (8-word chunks) plus planted chrome — a cookie
    banner on EVERY doc and a newsletter footer on every third — then
    line_dedup_docs strips exactly the chrome (the 8-word body chunks of
    the tiny-vocab corpus stay under min_docs).  Fully DuckDB-oracled:
    the oracle rebuilds the same lines and filters them with a list
    comprehension instead of the join (same result, different plan).

    Corpus-shape assumption (query construction only, not the operator):
    the oracle filters the constructed CHUNK list, while the engine
    operator re-splits the joined text on newline — equivalent iff the
    source text contains no embedded newlines (true of the driver
    fixture; the randomized fuzz covers this query with a newline-free
    corpus, and `line_dedup_docs` itself is input-agnostic).

    Round 6: the scan is `spread` (single-row-group parquet scans as ONE
    task — guide §2.5), and the final orderBy is gone (guide §2.4: an
    Exchange + sort purely for output cosmetics; the driver gate and the
    oracle compare order-insensitively, and the oracle SQL has no ORDER
    BY either)."""
    d = spread(load(spark, sf, "documents").select("doc_id", "text"))
    w = F.split(F.col("text"), " ")
    nchunks = F.ceil(F.size(w) / F.lit(8)).cast("int")
    body = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.concat_ws(" ", F.slice(w, i * 8 + 1, 8)),
    )
    lined = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("cookie notice accept all terms"),
            F.array_join(body, "\n"),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit("subscribe to the newsletter today")),
        ).alias("text"),
    )
    return line_dedup_docs(lined, min_docs=min_docs)


def write_fingerprint_index(
    docs: DataFrame, path: str, id_col: str = "doc_id",
    text_col: str = "text", mode: str = "overwrite",
) -> None:
    """Materialize the corpus content-fingerprint index: one row per doc,
    (fp = sha256(text), id), partitioned by the fingerprint's first hex
    byte (256 near-uniform partitions).  The continuous-crawl primitive:
    dedup of batch N+1 never rescans the corpus — it joins this index.
    `mode='append'` is how a batch commits its own novel fingerprints.

    The frame is hash-repartitioned on fp_prefix before the write so each
    append lands ONE file per partition dir — without this, every writing
    task touches all 256 dirs (~48 tasks x 256 dirs = ~12k tiny files per
    batch) and the next batch's anti-join scan pays a growing
    many-thousand-file listing (measured: per-batch crawl wall drifted
    12.8 -> 18.4s over four appends; flat after).

    Append mode first recovers any interrupted compaction swap (mirrors
    `write_minhash_index`): a standalone append landing between the two
    swap renames would otherwise recreate `<path>` and permanently
    strand the `.replaced` backup, silently shrinking the fingerprint
    corpus.  (In the crawl flow `incremental_exact_dedup` recovers first
    in the same batch, which only masked the hazard.)"""
    if mode == "append":
        from lightly_ocr_spark.jobs.compact_job import (
            recover_interrupted_swap,
        )

        recover_interrupted_swap(path)
    docs.select(
        F.sha2(F.col(text_col), 256).alias("fp"),
        F.col(id_col).alias("first_id"),
    ).withColumn("fp_prefix", F.substring("fp", 1, 2)).repartition(
        "fp_prefix"
    ).write.mode(mode).partitionBy("fp_prefix").parquet(path)


def incremental_exact_dedup(
    spark: SparkSession, new_batch: DataFrame, index_path: str,
    id_col: str = "doc_id", text_col: str = "text",
    commit: bool = True,
) -> DataFrame:
    """Dedup a NEW crawl batch against the persisted corpus index, then
    (commit=True) append the survivors' fingerprints so the next batch
    sees them.

    Three steps, none touching corpus text: (1) intra-batch exact dedup
    (keeper = min id per fingerprint); (2) anti-join the batch's
    fingerprints against the index (shuffle carries 32-byte hashes, and
    the index side is scanned, never rewritten); (3) append novel
    fingerprints.  Returns the surviving rows with ALL input columns plus
    `fp` (pass-through, so job pipelines keep their metadata).  At 10^12
    docs the index is itself big — but it is hash-partitioned, compact
    (one 64-hex row per doc), and this plan reads it once per batch
    instead of re-fingerprinting the corpus."""
    batch = new_batch.withColumn("fp", F.sha2(F.col(text_col), 256))
    w = Window.partitionBy("fp").orderBy(id_col)
    intra = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # a compaction of the index (crawl_job's documented cadence) that
    # crashed between its two swap renames leaves the whole corpus
    # fingerprint set at <path>.replaced and nothing at <path> — restore
    # it, or the PATH_NOT_FOUND fallback below would silently re-admit
    # every cross-batch duplicate AND strand the old index forever (the
    # append below recreates <path>, making later recovery a no-op)
    from lightly_ocr_spark.jobs.compact_job import recover_interrupted_swap

    recover_interrupted_swap(index_path)
    try:
        index = spark.read.parquet(index_path).select("fp")
        fresh = intra.join(index, "fp", "left_anti")
    except AnalysisException as e:
        # first batch: no index at the path yet — everything is novel.
        # Only PATH_NOT_FOUND-class failures mean "first batch"; a corrupt
        # footer / permission / IO error must propagate, or cross-batch
        # dedup silently degrades to intra-batch and (commit=True) appends
        # duplicate fingerprints that break the index's one-row-per-content
        # invariant.
        cond = e.getCondition() or ""
        if "PATH_NOT_FOUND" not in cond and "PATH_NOT_FOUND" not in str(e):
            raise
        fresh = intra
    if commit:
        # break lineage BEFORE appending: Spark recaches (recomputes) any
        # cached plan that reads a path being written, so a mere persist
        # would silently re-run the anti-join against the UPDATED index
        # and return an empty frame; a checkpoint's materialized rows have
        # no reference to the path
        fresh = fresh.localCheckpoint(eager=True)
        write_fingerprint_index(
            fresh, index_path, id_col=id_col, text_col=text_col,
            mode="append",
        )
    return fresh


def write_minhash_index(
    sigs: DataFrame, path: str, mode: str = "overwrite",
    k: int = MINHASH_K, bands: int = MINHASH_BANDS,
) -> None:
    """Materialize the corpus NEAR-dup index from a signature frame
    (doc_id, mh0..mh{k-1}): two datasets under `path` —

      sigs/     one row per doc (the verification surface; joined only
                for candidates, by doc_id)
      buckets/  (doc_id, band, bh), partitioned by (band, bh_prefix):
                the candidate surface — batch N+1's buckets equi-join
                here, so candidate generation touches bucket rows, never
                signatures, and partition pruning can narrow a probe to
                one band/prefix shard

    The bucket frame is hash-repartitioned on the partition columns
    before the write, so each append lands exactly ONE file per touched
    (band, bh_prefix) dir instead of one per shuffle partition — without
    this, a 50k-doc batch wrote 128 dirs x 32 files = 4096 tiny files,
    and the next batch's candidate scan paid a 4096-task stage (measured:
    bucket join 5.1s -> ~1s, append 14s -> ~4s at 50k docs).

    `mode='append'` is how a batch commits its survivors' signatures —
    IDEMPOTENT BY CONSTRUCTION: already-indexed doc_ids are anti-joined
    out against the existing sigs/ dataset before anything is written,
    so a crash-replay that recomputes the same survivor set appends
    nothing.  (Self-match through the candidate join used to provide
    replay-idempotence, but a bucket cap can legally suppress a capped
    doc's self-match; the anti-join holds under ANY candidate-generation
    settings.)  A doc_id already present keeps its ORIGINAL signature —
    a re-crawled url whose content changed is not re-indexed, matching
    the exact index's one-fingerprint-per-admission semantics.

    Append ORDER is buckets first, sigs second, making sigs/ the commit
    point the anti-join reads: a crash between the two appends leaves
    orphan bucket rows whose doc_id is absent from sigs/ — inert
    (verification inner-joins sigs) — and the replay, whose anti-join
    still sees the doc_id as new, re-appends both datasets; the
    duplicate bucket rows are absorbed by the candidate `distinct` and
    by `cap_buckets`' distinct-id counting.  Appending sigs first would
    instead make the replay skip the doc with its buckets missing —
    permanently unmatchable.

    `mode='overwrite'` (an index REBUILD) is atomic: both datasets are
    fully written under `<path>.inprogress` and swapped in with the
    compact_job rename pair, so no crash window leaves new sigs next to
    stale buckets (where candidate hits would inner-join to missing
    signatures and near-dup matches silently vanish).  A crash between
    the two renames leaves the old index at `<path>.replaced`; readers
    and the next write restore it via `recover_interrupted_swap`."""
    import os
    import shutil

    from lightly_ocr_spark.jobs.compact_job import recover_interrupted_swap

    if mode not in ("overwrite", "append"):
        raise ValueError(
            f"write_minhash_index supports mode='overwrite' (atomic "
            f"rebuild) or 'append' (idempotent commit), got {mode!r}"
        )

    def _buckets(frame: DataFrame) -> DataFrame:
        return (
            band_buckets(frame, k, bands)
            .withColumn("bh_prefix", F.pmod("bh", F.lit(16)).cast("int"))
            .repartition("band", "bh_prefix")
        )

    if mode == "overwrite":
        tmp = path.rstrip("/") + ".inprogress"
        shutil.rmtree(tmp, ignore_errors=True)
        sigs.write.mode("overwrite").parquet(f"{tmp}/sigs")
        _buckets(sigs).write.mode("overwrite").partitionBy(
            "band", "bh_prefix"
        ).parquet(f"{tmp}/buckets")
        recover_interrupted_swap(path)
        if os.path.exists(path):
            backup = path.rstrip("/") + ".replaced"
            shutil.rmtree(backup, ignore_errors=True)
            os.rename(path, backup)
            os.rename(tmp, path)
            shutil.rmtree(backup, ignore_errors=True)
        else:
            os.rename(tmp, path)
        return
    # append: restore any interrupted sub-dataset compaction, filter to
    # genuinely-new doc_ids, then BUCKETS first, SIGS second (docstring)
    recover_interrupted_swap(f"{path}/sigs")
    recover_interrupted_swap(f"{path}/buckets")
    new_sigs = sigs
    try:
        existing = sigs.sparkSession.read.parquet(f"{path}/sigs").select(
            "doc_id"
        )
        # the anti-join plan reads path/sigs, which the write below
        # updates — break lineage first or the write recaches the plan
        # and re-evaluates it against the post-append state
        new_sigs = sigs.join(existing, "doc_id", "left_anti") \
            .localCheckpoint(eager=True)
    except AnalysisException as e:
        cond = e.getCondition() or ""
        if "PATH_NOT_FOUND" not in cond and "PATH_NOT_FOUND" not in str(e):
            raise
        # first append: the path does not exist yet
    _buckets(new_sigs).write.mode("append").partitionBy(
        "band", "bh_prefix"
    ).parquet(f"{path}/buckets")
    new_sigs.write.mode("append").parquet(f"{path}/sigs")


def incremental_near_dedup(
    spark: SparkSession, new_batch: DataFrame, index_path: str,
    id_col: str = "doc_id", text_col: str = "text",
    k: int = MINHASH_K, bands: int = MINHASH_BANDS, ngram: int = 3,
    min_agreement: float = 0.5, commit: bool = True,
    checkpoint_dir: str | None = None,
    with_sigs: bool = False,
    max_bucket: int | None = None,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Near-dedup a NEW crawl batch against the persisted minhash index,
    then (commit=True) append the survivors' signatures so the next batch
    sees them — the MinHash-LSH twin of `incremental_exact_dedup`, and
    the missing piece of a continuous-crawl loop (exact dedup alone lets
    trivially-mutated boilerplate re-enter the corpus every batch).

    Plan, none of it rescanning corpus text:
      1. batch signatures (one groupBy) — persisted: they feed candidate
         generation, BOTH verification sides, and the commit append;
      2. CROSS candidates: batch buckets equi-join the index's bucket
         dataset on (band, bh) — uniform hash keys, candidates bounded by
         bucket collisions, never all-pairs;
      3. verify candidates by full-signature agreement (>= min_agreement
         of k minhashes) joining batch sigs with ONLY the candidate
         corpus sigs; any verified match drops the batch doc (the corpus
         copy is the cluster keeper);
      4. INTRA-batch near-dedup among the remainder: the shared
         band_candidate_pairs -> agreement verify -> connected components
         -> keep each cluster's min id (transitive chains collapse to one
         survivor, same semantics as the curation pipeline);
      5. append survivors' sigs+buckets (idempotent on replay: the
         append itself anti-joins already-indexed doc_ids — see
         `write_minhash_index`; self-match in step 3 cannot be relied on
         because a bucket cap legally suppresses it for capped docs).

    Returns surviving rows with all input columns (already materialized —
    safe to act on after any later index write); `with_sigs=True` also
    returns the survivors' signature frame, so callers that gate the
    append themselves (crawl_job) never recompute the signature
    aggregation.  Dropped near-dups' signatures are NOT indexed — each
    cluster is represented by its keeper, exactly like the batch curation
    pipeline."""
    from pyspark import StorageLevel

    batch = new_batch.withColumnRenamed(id_col, "doc_id") \
        if id_col != "doc_id" else new_batch
    sig_b = minhash_signatures(
        batch.select("doc_id", F.col(text_col).alias("text")),
        k=k, ngram=ngram,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return _near_dedup_core(
            spark, batch, sig_b, index_path, id_col, k, bands, need=int(
                min_agreement * k),
            commit=commit, checkpoint_dir=checkpoint_dir,
            with_sigs=with_sigs, max_bucket=max_bucket,
        )
    finally:
        # release the signature cache even on failure (a raised corrupt-
        # index read must not leak a persisted corpus-scale frame)
        sig_b.unpersist()


def _near_dedup_core(
    spark, batch, sig_b, index_path, id_col, k, bands, need,
    commit, checkpoint_dir, with_sigs, max_bucket=None,
):
    """Body of `incremental_near_dedup` (split out so the signature
    cache's persist/unpersist pairs in a try/finally)."""
    from pyspark import StorageLevel
    agree = sum(
        (F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}")).cast("int")
        for i in range(k)
    )

    # a rebuild (overwrite) crash between the swap renames leaves the old
    # index at <path>.replaced and nothing at <path> — restore it, or the
    # PATH_NOT_FOUND fallback below would silently treat a populated
    # corpus as "first batch".  The SUB-datasets get the same treatment:
    # the documented compaction cadence swaps sigs/ and buckets/
    # individually, and a crashed buckets/ compaction would otherwise
    # make every indexed doc unmatchable (candidates need bucket rows)
    # while the next commit recreates buckets/ and strands the backup
    # forever.  A sub-dataset missing WITHOUT a .replaced backup is the
    # append-crash window, which stays replay-safe by redundancy (see
    # write_minhash_index).
    from lightly_ocr_spark.jobs.compact_job import recover_interrupted_swap

    recover_interrupted_swap(index_path)
    recover_interrupted_swap(f"{index_path}/sigs")
    recover_interrupted_swap(f"{index_path}/buckets")
    cross_drops = None
    try:
        idx_sigs = spark.read.parquet(f"{index_path}/sigs").select(
            F.col("doc_id").alias("corpus_id"),
            *[F.col(f"mh{i}") for i in range(k)],
        )
        idx_buckets = spark.read.parquet(f"{index_path}/buckets").select(
            F.col("doc_id").alias("corpus_id"), "band", "bh"
        )
        # the cap applies to BOTH sides: a degenerate band hash grows a
        # mega-bucket on the index side too, and the cross equi-join on
        # it would be |batch-bucket| x |index-bucket|.  The index-side
        # size test runs over ONLY the buckets the batch touches (the
        # restricting join keeps each touched bucket's full membership,
        # so the test is exact) — capping the whole index would add a
        # full-index aggregate per batch that grows with the corpus.
        bb = cap_buckets(band_buckets(sig_b, k, bands), max_bucket)
        if max_bucket is None:
            idx_side = idx_buckets
        else:
            idx_side = cap_buckets(
                idx_buckets.join(
                    bb.select("band", "bh").distinct(), ["band", "bh"]
                ),
                max_bucket,
            )
        cand = (
            bb.join(idx_side, ["band", "bh"])
            .select("doc_id", "corpus_id")
            .distinct()
        )
        cross_drops = (
            cand.join(sig_b.alias("sa"), "doc_id")
            .join(idx_sigs.alias("sb"), "corpus_id")
            .filter(agree >= need)
            .select("doc_id")
            .distinct()
        )
    except AnalysisException as e:
        cond = e.getCondition() or ""
        if "PATH_NOT_FOUND" not in cond and "PATH_NOT_FOUND" not in str(e):
            raise
        # first batch: no index yet

    # cross_drops embeds the bucket + verification joins against the
    # GROWING index, and it feeds THREE consumers (the survivor
    # anti-join, and sig_rem's every evaluation) — eagerly checkpoint the
    # (tiny: verified drop ids only) frame, or each consumer re-runs the
    # index joins and per-batch wall grows with corpus size (measured:
    # near leg 12 -> 19.5s over four 50k batches; flat ~10s after)
    if cross_drops is not None:
        cross_drops = cross_drops.localCheckpoint(eager=True)
    sig_rem = (
        sig_b.join(cross_drops, "doc_id", "left_anti")
        if cross_drops is not None else sig_b
    )
    # sig_rem feeds five consumers (pair self-join x2, verify join x2,
    # survivor sigs) — persist for the duration of this call
    sig_rem = sig_rem.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # intra-batch: candidate pairs -> verified pairs -> components
        pairs = band_candidate_pairs(sig_rem, k, bands,
                                     max_bucket=max_bucket)
        verified = (
            pairs.join(
                sig_rem.alias("sa"), F.col("id_a") == F.col("sa.doc_id")
            )
            .join(sig_rem.alias("sb"), F.col("id_b") == F.col("sb.doc_id"))
            .filter(agree >= need)
            .select("id_a", "id_b")
            .distinct()
        )
        comp = connected_components(verified, checkpoint_dir=checkpoint_dir)
        intra_drops = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        )
        # anti-joins, not a semi-join against sig_rem: a doc with no tokens
        # has no signature at all — it cannot near-dup anything and must
        # SURVIVE, not silently vanish with the dropped set
        survivors = batch
        if cross_drops is not None:
            survivors = survivors.join(cross_drops, "doc_id", "left_anti")
        survivors = survivors.join(intra_drops, "doc_id", "left_anti")

        # materialize BEFORE any append and before releasing the signature
        # cache: (a) the survivor plan reads index_path, and Spark recaches
        # plans whose source path is written (a commit would silently
        # re-evaluate the returned frame against the post-append index where
        # every survivor self-matches — the round-3 incremental_exact_dedup
        # lesson); (b) the caller's first action would otherwise re-run the
        # whole signature aggregation after sig_b is unpersisted below.
        survivors = survivors.localCheckpoint(eager=True)
        survivor_sigs = (
            sig_rem.join(intra_drops, "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
    finally:
        sig_rem.unpersist()
    if commit:
        write_minhash_index(survivor_sigs, index_path, mode="append",
                            k=k, bands=bands)
    if id_col != "doc_id":
        survivors = survivors.withColumnRenamed("doc_id", id_col)
    if with_sigs:
        return survivors, survivor_sigs
    return survivors


def passage_dedup_docs(
    d: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 8, min_docs: int = 2,
) -> DataFrame:
    """Duplicate-PASSAGE removal (the positional generalization of
    line-level dedup, after Lee et al., "Deduplicating Training Data
    Makes Language Models Better"): any n-token span whose n-gram occurs
    in >= `min_docs` DISTINCT documents is cut from every document, and
    the surviving tokens are reassembled in order.  Line dedup only
    catches chrome that happens to be line-aligned; this catches shared
    boilerplate sentences and license blocks at ANY position.

    Plan, all JVM (one explode per token-gram, two shuffles on uniform
    16-byte md5 keys — never passage text):
      1. (doc, pos, md5(n-gram)) via transform+slice, one posexplode;
      2. gram document frequency -> the common set (HAVING df >= min_docs);
      3. equi-join occurrences with the common set; each hit covers
         positions [pos, pos+n) — one sequence explode, distinct;
      4. per-doc covered-position set -> index-aware `filter` rebuild
         (lambda (tok, i)) and a single concat_ws.

    Tokens are case-SENSITIVE (passages must match byte-wise, matching
    the exact-dedup philosophy); docs with NO removed passage keep their
    original text byte-for-byte (including newlines/tabs/multi-space —
    only docs a passage was actually cut from are reassembled
    single-spaced); a fully-covered doc yields an empty string (caller
    gates).  Output: (id, cleaned, n_removed_tokens).

    Round-6 plan shape (guide §2.4/§2.3; before: 5 Exchanges, the gram
    build evaluated TWICE in two scan branches, and an 8x position
    explode feeding collect_set — 17.7 s single-task at 50k docs):
      * `spread` fans the unsplittable single-row-group scan out to the
        core budget, and the round-robin Exchange is REUSED by the gram
        branch and the rebuild join (one scan, one text shuffle);
      * the exploded grams are hash-repartitioned on gh ONCE — the
        document-frequency aggregate (clustered by gh, so the distinct
        count needs no further Exchange) and the common-gram hit join
        both read that same reused Exchange, so the gram/md5 build now
        runs exactly once;
      * hits aggregate as collect_set(pos) — one row per hit instead of
        n exploded cover rows — and each doc's covered-position set is
        expanded JVM-side (flatten of n-long sequences + array_distinct,
        identical set to the old exploded collect_set)."""
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: F.length(w) > 0
    )
    base = spread(d.select(F.col(id_col), F.col(text_col)))
    w = base.select(
        F.col(id_col), F.col(text_col).alias("text"), words.alias("w")
    )
    # the short-doc gate lives INSIDE the gram expression (empty array ->
    # posexplode drops the row) instead of a .filter(): a row filter
    # would be pushed below the spread Exchange, re-serializing the
    # split/size work on the unsplit scan and forking the scan into
    # non-reusable per-branch variants
    gram = F.when(
        F.size("w") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - n),
            lambda p: F.md5(
                F.concat_ws(" ", F.slice(F.col("w"), p + 1, n))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = (
        w.select(id_col, F.posexplode(gram).alias("pos", "gh"))
        .repartition(F.col("gh"))
    )
    common = (
        g.groupBy("gh")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("gh")
    )
    cov = (
        g.join(common, "gh")
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("ps"))
    )
    # distinct covered positions, expanded from the per-hit start set —
    # materialized as its OWN projection (the `_tokens` lesson: an alias
    # referenced twice below must not be re-inlined per reference)
    cps = F.array_distinct(F.flatten(F.transform(
        "ps", lambda p: F.sequence(p, p + (n - 1))
    )))
    covd = w.join(cov, id_col, "left").select(
        id_col, "text", "w", cps.alias("cps")
    )
    keep = F.filter(
        F.col("w"),
        lambda x, i: ~F.array_contains("cps", i),
    )
    return (
        covd.select(
            id_col,
            # untouched docs keep their ORIGINAL text byte-for-byte —
            # rebuilding them through split+concat_ws would silently
            # collapse newlines/tabs/multi-spaces corpus-wide
            F.when(F.col("cps").isNotNull(), F.concat_ws(" ", keep))
            .otherwise(F.col("text")).alias("cleaned"),
            F.coalesce(F.size("cps"), F.lit(0)).cast("long")
            .alias("n_removed_tokens"),
        )
    )


def passage_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Driver query: remove cross-document duplicate 8-gram passages over
    the documents table.  The synthetic corpus shares templated sentences
    across documents, so real passages are removed.  Fully DuckDB-oracled
    (md5 grams are portable; positional math is exact integers)."""
    d = load(spark, sf, "documents").select("doc_id", "text")
    return passage_dedup_docs(d)
