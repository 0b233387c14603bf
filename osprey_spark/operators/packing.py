"""Sequence packing and dataset mixing — the two steps between a
curated corpus (``operators.curation``) and a training run.

Training-data pipeline operators the reference engine does not have
(its domain is abuse rules); designed Spark-first like the rest of the
family and DuckDB-replayable (oracle SQL in entrypoint.py):

- ``sequence_packing``: concat-and-chunk assignment of documents into
  fixed token-budget training sequences ("packs"). Documents are laid
  end-to-end in deterministic (id) order within independent packing
  streams; each doc gets the pack id / offset where its first token
  lands plus how many packs it spans. Plan shape: ONE shuffle (the
  window partition on (stream_by, stream)) and a linear cumulative-sum
  scan per stream — no self-join, no driver state. ``n_streams``
  bounds window-partition size: at 100 TB you raise it so each stream
  holds ~1 executor-partition of documents; streams pack independently
  (packing order across streams is arbitrary by construction, so this
  loses nothing).
- ``dataset_mixing``: deterministic per-stratum up/down-sampling to
  target mixture weights (the "data mixing" step: e.g. en×0.5,
  code×2.25). weight = expected copies per document; the fractional
  part is resolved by the same replayable 16-bit-md5 bucket the
  per-action sampling operator uses (compiler/compile.py md5 bucket;
  DuckDB-identical). Pure projection + bounded explode — zero
  shuffles, scales linearly.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens


def sequence_packing(
    docs: DataFrame,
    token_budget: int = 512,
    n_streams: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_by: str = "source",
) -> DataFrame:
    """Assign every document a (pack_id, pack_offset) in a
    concat-and-chunk packing of ``token_budget``-token sequences.

    Within each packing stream — ``(stream_by, id % n_streams)`` —
    documents are concatenated in ``id_col`` order; ``pack_id`` is the
    sequence index where the document's first token lands,
    ``pack_offset`` its position inside that sequence, and
    ``n_packs_spanned`` how many sequences it crosses (1 = fits, ≥2 =
    split across a boundary, 0 = empty document).

    Columns: (id, stream_by, stream, n_tokens, pack_id, pack_offset,
    n_packs_spanned).
    """
    if token_budget < 1:
        raise ValueError("token_budget must be >= 1")
    n_tok = F.size(tokens(F.col(text_col))).cast("long")
    base = docs.select(
        F.col(id_col),
        F.col(stream_by),
        (F.col(id_col) % n_streams).cast("long").alias("stream"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy(stream_by, "stream")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    b = F.lit(token_budget).cast("long")
    out = base.withColumn("_cum", cum).select(
        id_col,
        stream_by,
        "stream",
        "n_tokens",
        F.floor((F.col("_cum") - F.col("n_tokens")) / b).cast("long").alias("pack_id"),
        ((F.col("_cum") - F.col("n_tokens")) % b).cast("long").alias("pack_offset"),
        F.when(F.col("n_tokens") == 0, F.lit(0))
        .otherwise(
            F.floor((F.col("_cum") - 1) / b)
            - F.floor((F.col("_cum") - F.col("n_tokens")) / b)
            + 1
        )
        .cast("long")
        .alias("n_packs_spanned"),
    )
    return out


def _mix_bucket(id_col: Column) -> Column:
    """Replayable 16-bit md5 bucket in [0, 100) — the same recipe the
    per-action-name sampling gate uses (oracle:
    CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 4)) AS INT) % 100).
    Known slight bias: 65536 % 100 != 0 (documented at the sampling
    operator)."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string").cast("binary")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )


def dataset_mixing(
    docs: DataFrame,
    weights: Mapping[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
    keep_cols: tuple = (),
) -> DataFrame:
    """Deterministic dataset mixing: replicate/drop documents so each
    stratum contributes ~``weights[stratum]`` copies per document.

    weight w => every doc yields floor(w) copies plus one more for the
    deterministic ``frac(w)`` fraction of ids (16-bit md5 bucket — no
    RNG, identical on re-runs and in the DuckDB oracle). w = 0 drops
    the stratum; w = 1 passes it through; w = 2.25 emits 2 copies for
    75% of ids and 3 for 25%.

    Output: one row per (doc, copy) — (id, stratum, copy) with
    copy ∈ [1, copies]; ``keep_cols`` are carried through.
    """
    strata = sorted(weights)
    for s, wv in weights.items():
        if wv < 0:
            raise ValueError(f"negative mixing weight for {s!r}: {wv}")
    bucket = _mix_bucket(F.col(id_col))

    def copies_for(w: float) -> Column:
        whole = int(w)
        frac_pct = round((w - whole) * 100)
        c = F.lit(whole)
        if frac_pct:
            c = c + (bucket < F.lit(frac_pct)).cast("int")
        return c

    copies: Column = copies_for(default_weight)
    for s in strata:
        copies = F.when(F.col(stratum_col) == s, copies_for(weights[s])).otherwise(
            copies
        )
    base = docs.select(
        F.col(id_col),
        F.col(stratum_col),
        *[F.col(c) for c in keep_cols],
        copies.cast("long").alias("_copies"),
    ).filter(F.col("_copies") >= 1)
    # sequence() is ascending only when start <= stop (Spark descends
    # otherwise) — the >= 1 filter above guarantees that
    return base.select(
        id_col,
        stratum_col,
        *keep_cols,
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("_copies"))).alias("copy"),
    )


def temperature_weights(
    docs: DataFrame,
    alpha: float = 0.3,
    stratum_col: str = "lang",
    size_col: Column | None = None,
) -> DataFrame:
    """Temperature-scaled language sampling (the mT5/XLM-R standard,
    Xue et al. 2021 / Conneau et al. 2020): sampling probability
    p_l ∝ c_l^alpha where c_l is the language's token count. alpha=1
    is proportional (big languages dominate), alpha→0 is uniform;
    alpha≈0.3 is the published sweet spot that upweights low-resource
    languages without drowning the head. Complements ``unimax``
    (hard epoch caps) with the soft-exponent family.

    Output per stratum: n_tokens, p_temp (round-6 probability),
    boost (round-4 p_temp / natural-share ratio — >1 means the
    stratum is upweighted vs proportional sampling).

    Plan shape: corpus-scale token counting is ONE hash aggregate
    with map-side partials; the pow/normalize runs as window sums
    over the dimension-class language frame (#languages rows — the
    same bounded single-partition exchange as the UniMax allocator
    and the IVF codebook). Float pow enters only the rounded outputs.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    if size_col is None:
        # the \W+ tokenizer (functions.text), matching the UniMax
        # allocator's token counting — NOT dedup's whitespace tokens
        from ..functions.text import tokenize_col

        size_col = F.size(tokenize_col(F.col("text")))
    size = size_col
    per = docs.groupBy(stratum_col).agg(
        F.sum(size.cast("long")).alias("n_tokens")
    )
    w_all = Window.orderBy(stratum_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wpow = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    staged = per.select(
        stratum_col,
        "n_tokens",
        (wpow / F.sum(wpow).over(w_all)).alias("_p"),
        (
            F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w_all)
        ).alias("_share"),
    )
    return staged.select(
        stratum_col,
        "n_tokens",
        F.round("_p", 6).alias("p_temp"),
        F.round(F.col("_p") / F.col("_share"), 4).alias("boost"),
    )


def global_shuffle_order(
    docs: DataFrame,
    id_col: str = "doc_id",
    seed: str = "shuf",
    prefix_len: int = 1,
) -> DataFrame:
    """Deterministic global training-order shuffle: ``position`` =
    global rank of ``md5(seed || ':' || id)`` — a seeded,
    engine-replayable stand-in for the random permutation a training
    pipeline draws before epoch 0.

    Scale shape (why NOT ``row_number() OVER (ORDER BY key)``): a
    global window collapses the whole table into ONE task. Instead the
    md5 key space is split into 16^prefix_len uniform groups; per-group
    counts (a vocabulary-sized aggregate) become broadcast offsets, and
    position = group offset + rank within group — every group ranks in
    its own task. Only (key, id) pairs ever shuffle, never documents;
    consumers join back on ``id_col``. At 10^11 rows raise prefix_len
    so each group fits an executor task (16^3 = 4096 groups).
    """
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    keyed = docs.select(F.col(id_col), key.alias("shuffle_key")).withColumn(
        "_pfx", F.substring("shuffle_key", 1, prefix_len)
    )
    counts = keyed.groupBy("_pfx").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_pfx").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).cast("long")
    ).select("_pfx", "_off")
    w_local = Window.partitionBy("_pfx").orderBy("shuffle_key")
    return (
        keyed.join(F.broadcast(offsets), "_pfx")
        .withColumn(
            "position", (F.col("_off") + F.row_number().over(w_local)).cast("long")
        )
        .select(id_col, "shuffle_key", "position")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split every document into OVERLAPPING token-window chunks —
    the context-window preparation step of retrieval/embedding
    pipelines (chunk size c, stride s < c gives c−s tokens of overlap
    so no boundary sentence is lost to either side).

    Chunk i starts at token 1 + i·s; the chunk count is the standard
    closed form — one chunk when n ≤ c, else ceil((n−c)/s) + 1, so
    the final chunk always reaches the last token and is never
    shorter than c−s+1 (no degenerate slivers); empty docs yield no
    chunks. The count computes in exact INTEGER arithmetic
    ((n−c+s−1) DIV s + 1). Everything is per-row array HOFs over the
    tokenized column — zero joins, zero shuffles, output cardinality
    ≈ n_tokens/stride per doc.

    Columns: (id, chunk_idx, chunk_start, chunk_len, chunk_text).
    """
    if chunk_tokens < 1 or stride < 1 or stride > chunk_tokens:
        raise ValueError("need 1 <= stride <= chunk_tokens")
    c, s = int(chunk_tokens), int(stride)
    base = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    ).withColumn("_n", F.size("_t"))
    n_chunks = (
        F.when(F.col("_n") <= 0, F.lit(0))
        .when(F.col("_n") <= c, F.lit(1))
        .otherwise(F.expr(f"CAST((_n - {c} + {s} - 1) DIV {s} AS INT) + 1"))
    )
    starts = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1), lambda i: (F.lit(1) + i * s).cast("int")
        ),
    ).otherwise(F.array().cast("array<int>"))
    exploded = base.select(
        id_col,
        "_t",
        "_n",
        F.posexplode(starts).alias("chunk_idx", "_start"),
    )
    chunk_len = F.least(F.lit(c), F.col("_n") - F.col("_start") + 1)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("_start").cast("long").alias("chunk_start"),
        chunk_len.cast("long").alias("chunk_len"),
        F.concat_ws(" ", F.slice(F.col("_t"), F.col("_start"), chunk_len)).alias(
            "chunk_text"
        ),
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: str = "ws1",
    keep: tuple = (),
    by: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES, the standard for distributed weighted
    reservoir sampling): every row draws a seeded uniform
    u = (md5_60(seed:id) + 1) / 2^60 in (0, 1] and gets sort key
    -ln(u) / w — the exponential race. Taking the k SMALLEST keys is
    exactly weighted sampling without replacement: the first pick
    lands on row i with probability w_i / sum(w), the second on j with
    w_j / (sum(w) - w_i), and so on. Seeded md5 instead of an RNG
    makes the draw replayable in any engine (same u, same key, same
    sample — DuckDB oracle is hash-exact modulo the documented float
    caveat below).

    ``by=None``: global top-k — ``orderBy(key).limit(k)`` compiles to
    TakeOrderedAndProject: each partition keeps its own k, the driver
    merges p*k scored ids (never documents). The right shape for small
    k at any corpus size; for huge k, rank with the prefix-group
    pattern of ``global_shuffle_order`` instead. ``by=<col>``:
    stratified variant — k per group via row_number over a
    (group)-partitioned window, ONE shuffle on the group key; group
    skew is irrelevant because only (id, key) pairs shuffle.

    Weights clamp to >= 1 (rows with NULL/zero weight still have a
    defined draw). Float caveat: ln() may differ by 1 ulp between
    JVM Math.log and DuckDB libm — membership at the k-th boundary
    would flip only if two keys collide within ~1e-16 relative, which
    the (key, id) tie-break makes measure-zero in practice; the
    emitted ``sample_key`` is rounded to 6 decimals like every float
    output in this repo.
    """
    w = F.greatest(F.col(weight_col).cast("long"), F.lit(1))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    key = -F.log(u) / w.cast("double")
    cols = [id_col, *keep] + ([by] if by and by not in keep else [])
    scored = docs.select(*cols, w.alias("weight"), key.alias("_skey"))
    if by is None:
        picked = scored.orderBy("_skey", id_col).limit(int(k))
    else:
        w_grp = Window.partitionBy(by).orderBy("_skey", id_col)
        picked = scored.withColumn("_rn", F.row_number().over(w_grp)).filter(
            F.col("_rn") <= int(k)
        )
    return picked.select(
        id_col, *keep, *([by] if by and by not in keep else []),
        "weight", F.round("_skey", 6).alias("sample_key"),
    )
