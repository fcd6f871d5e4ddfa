"""Model-based quality filtering — the fastText-style hashed linear
classifier every modern pretraining pipeline runs after the heuristic
filters (CCNet, DCLM, FineWeb-Edu all gate on one): train a logistic
model over hashed bag-of-ngram features on a LABELED sample, then score
the whole corpus and keep/down-weight by predicted quality.

No reference analog (the reference has no corpus-level text statistics);
this completes the quality triad next to the heuristic score
(textops.quality_score) and the bigram-LM perplexity (operators/lm.py).

Spark shape — train small, score big:

- TRAINING runs on a bounded labeled sample (thousands to millions of
  docs, never the corpus): features are assembled per-doc into MLlib
  sparse vectors and fit with LogisticRegression (distributed L-BFGS).
  The model is driver-sized (n_buckets coefficients).
- The fitted model is EXPORTED to a plain (bucket, w_micro) DataFrame —
  inference has no MLlib dependency and no Python in the hot path.
- SCORING the 100 TB corpus is: one map-side gram explode, an equi-join
  against the weight table (broadcast — it is at most n_buckets rows,
  ~1 MB), one per-doc integer sum. No shuffle other than the per-doc
  groupBy; nothing driver-side.

Reproducibility (CLAUDE.md): coefficients are quantized to integer
micro-logits (floor(w*1e6+0.5)) at EXPORT, so the cross-row per-doc
sums are exact BIGINTs on any partition layout; the derived probability
is computed from the integer logit only at the consumer edge.

Feature hashing is the portable md5-based hash32 (functions/hashing.py),
so the whole scoring path has an exact DuckDB twin —
``score_with_hash_weights`` runs it with deterministic hash-derived
pseudo-weights as the oracle-checked leg (text_profile's
n_feats/clf_micro columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sum_spark.functions.hashing import duck_hash32, duck_hash60, hash32, hash60
from sum_spark.functions.text import tokens

N_BUCKETS = 1 << 16  # 65536 hashed feature buckets (fastText default order)

# Hash-derived pseudo-weight range: +-1e6 micro-logits = +-1.0 logit.
_PSEUDO_MOD = 2000001
_PSEUDO_OFF = 1000000


def _grams_from(arr_col: str) -> F.Column:
    """Unigram + bigram bag from a STAGED token-array column (stage the
    split once — Catalyst re-inlines expensive expressions into
    multi-reference subtrees, CLAUDE.md). Single-word docs emit just the
    unigram (sequence(1, 0) DESCENDS in Spark — the CASE guard is
    load-bearing, see operators/lm.py); NULL text -> NULL array, which
    explodes to no rows."""
    return F.expr(
        f"CASE WHEN size({arr_col}) >= 2 THEN concat({arr_col}, "
        f"transform(sequence(1, size({arr_col}) - 1), "
        f"i -> {arr_col}[i-1] || ' ' || {arr_col}[i])) "
        f"ELSE {arr_col} END"
    )


def duck_grams(w_expr: str) -> str:
    """DuckDB twin of _grams over a token-list expression (1-based lists;
    range(1, len) is empty for single-word docs — no guard needed)."""
    return (
        f"{w_expr} || list_transform(range(1, len({w_expr})), "
        f"i -> {w_expr}[i] || ' ' || {w_expr}[i + 1])"
    )


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(doc_id, bucket, tf) — term frequencies of md5-hash-bucketed
    unigrams + bigrams. Map-side explode + one (doc, bucket) groupBy;
    docs with NULL text contribute no rows."""
    w = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__w"))
    g = w.select("doc_id", F.explode(_grams_from("__w")).alias("__g"))
    return (
        g.select("doc_id", (hash32(F.col("__g")) % F.lit(n_buckets)).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("tf"))
    )


def train_text_classifier(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    max_iter: int = 50,
    reg_param: float = 1e-4,
) -> tuple[DataFrame, int]:
    """Fit the quality classifier on a labeled sample; returns
    (weights, intercept_micro) where weights is a plain
    (bucket BIGINT, w_micro BIGINT) DataFrame of the NONZERO quantized
    coefficients and intercept_micro is the quantized intercept.

    ``df`` is the labeled TRAINING SAMPLE (label_col in {0, 1}), not the
    corpus — callers sample/curate upstream. The per-doc sparse-vector
    assembly is an ARROW-OPTIMIZED Python UDF: batches cross the
    JVM/Python boundary as Arrow columns instead of pickled rows, and
    the stage is bounded by the sample, never the corpus hot path. (A
    fully vectorized pandas_udf/mapInPandas cannot emit VectorUDT on
    this Spark — the Arrow writers reject the UDT; MLlib genuinely
    requires a Vector column and ships no builtin sparse assembler, so
    the Arrow-batched UDF is the fastest expressible form.) The fit
    itself is MLlib's distributed L-BFGS. standardization=False keeps
    coefficients in raw tf units so the exported table scores
    unstandardized features.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors, VectorUDT
    from pyspark.sql.types import Row

    feats = hashed_ngram_features(df, text_col, id_col, n_buckets)
    pairs = feats.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("bucket", "tf"))).alias("__p")
    )

    def _assemble(p):
        return Vectors.sparse(
            n_buckets, [int(x["bucket"]) for x in p], [float(x["tf"]) for x in p]
        )

    assemble = F.udf(_assemble, VectorUDT(), useArrow=True)
    labeled = df.select(
        F.col(id_col).alias("doc_id"), F.col(label_col).cast("double").alias("__y")
    )
    train = pairs.join(labeled, "doc_id").select(
        assemble(F.col("__p")).alias("features"), F.col("__y").alias("label")
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    model = lr.fit(train)
    coefs = model.coefficients.toArray()
    rows = [
        Row(bucket=int(i), w_micro=int(_micro(float(c))))
        for i, c in enumerate(coefs)
        if c != 0.0
    ]
    spark = SparkSession.getActiveSession() or df.sparkSession
    weights = spark.createDataFrame(rows, schema="bucket long, w_micro long")
    return weights, _micro(float(model.intercept))


def _micro(x: float) -> int:
    """Quantize a logit weight to integer micro-logits (round-half-up)."""
    import math

    return int(math.floor(x * 1_000_000 + 0.5))


def score_text_classifier(
    df: DataFrame,
    weights: DataFrame,
    intercept_micro: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Score every document: (doc_id, n_feats, logit_micro, prob).

    logit_micro = intercept_micro + sum(tf * w_micro) — an exact BIGINT,
    identical on any partition layout; prob = sigmoid(logit_micro/1e6)
    is the consumer-facing derived double. Docs with NULL text score the
    bare intercept. The weight table is broadcast (<= n_buckets rows);
    the corpus side shuffles once, by doc_id, at token granularity.
    """
    feats = hashed_ngram_features(df, text_col, id_col, n_buckets)
    joined = feats.join(F.broadcast(weights), "bucket", "left")
    per = joined.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_feats"),
        F.sum(F.col("tf") * F.coalesce(F.col("w_micro"), F.lit(0)))
        .cast("long")
        .alias("__s"),
    )
    ids = df.select(F.col(id_col).alias("doc_id")).distinct()
    out = ids.join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        (F.coalesce(F.col("__s"), F.lit(0)) + F.lit(int(intercept_micro)))
        .cast("long")
        .alias("logit_micro"),
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit_micro").cast("double") / 1e6))
    return out.withColumn("prob", prob).orderBy("doc_id")


def score_with_hash_weights(
    df: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    salt: str = "clfw",
    tokenized: DataFrame | None = None,
) -> DataFrame:
    """The scoring machinery with deterministic hash-derived weights —
    w_micro(bucket) = hash60(salt:bucket) % 2000001 - 1000000 — instead
    of a trained table. Exercises the full featurize->bucket->weight->
    per-doc-integer-sum path with an exact DuckDB twin; this is the
    oracle-checked leg (text_profile n_feats/clf_micro). No join at all:
    the weight is an expression on the feature row, so the only shuffle
    is the per-doc sum. Pass ``tokenized`` — a (doc_id, __w) frame — to
    reuse a shared tokenization instead of re-scanning ``df``."""
    if tokenized is not None:
        w = tokenized.select("doc_id", "__w")
    else:
        w = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__w"))
    g = w.select("doc_id", F.explode(_grams_from("__w")).alias("__g"))
    bkt = hash32(F.col("__g")) % F.lit(n_buckets)
    wm = (
        hash60(F.concat(F.lit(salt + ":"), bkt.cast("string"))) % F.lit(_PSEUDO_MOD)
        - F.lit(_PSEUDO_OFF)
    )
    return (
        g.select("doc_id", wm.alias("__wm"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("__wm").cast("long").alias("clf_micro"),
        )
    )


def duck_hash_weight_score(w_expr: str, n_buckets: int = N_BUCKETS, salt: str = "clfw") -> str:
    """DuckDB CTE body reproducing score_with_hash_weights from a
    token-list expression: SELECT doc_id, n_feats, clf_micro."""
    bkt = f"{duck_hash32('g')} % {n_buckets}"
    wm_hash = duck_hash60(f"'{salt}:' || CAST(bkt AS VARCHAR)")
    wm = f"{wm_hash} % {_PSEUDO_MOD} - {_PSEUDO_OFF}"
    return (
        f"SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats, "
        f"CAST(SUM(wm) AS BIGINT) AS clf_micro FROM ("
        f"SELECT doc_id, {wm} AS wm FROM ("
        f"SELECT doc_id, {bkt} AS bkt FROM ("
        f"SELECT doc_id, unnest({duck_grams(w_expr)}) AS g FROM t))) GROUP BY doc_id"
    )
