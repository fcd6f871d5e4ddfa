"""MLlib interop bridge — the glue for users arriving with
`pyspark.ml.linalg` vectors or wanting Spark's built-in LSH estimators
(SURVEY §1.2/§2.F names `VectorUDT`, `MinHashLSH` /
`BucketedRandomProjectionLSH` + `approxSimilarityJoin` as the stock
MLlib route for these workloads).

The engine's own kernels operate on plain `array<float>` columns (and
stay DuckDB-oracle-checkable value-for-value, which MLlib's hash
families are not); this module converts both ways and exposes the MLlib
LSH dedup forms so the two ecosystems compose:

- `to_mllib_vectors` / `from_mllib_vectors`: array<numeric> ⇄ VectorUDT
  (JVM-side `array_to_vector`/`vector_to_array`, no Python in the path);
- `dedup_minhash_mllib`: MinHashLSH.approxSimilarityJoin over word
  shingles — the estimator-based twin of operators.dedup.dedup_minhash_lsh;
- `neardup_cosine_mllib`: BucketedRandomProjectionLSH over L2-normalized
  embeddings (cosine ≥ t ⟺ euclidean ≤ sqrt(2-2t) on unit vectors) —
  the estimator-based twin of operators.dedup.dedup_embedding_cosine.

Scale posture matches the custom operators: candidate generation is a
bucket equi-join inside the estimator; no cross join.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_mllib_vectors(
    df: DataFrame, vec_col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """array<float|double> column -> MLlib DenseVector (VectorUDT) column.

    In place when out_col is None (same name). JVM-side conversion.
    """
    from pyspark.ml.functions import array_to_vector

    out = out_col or vec_col
    return df.withColumn(out, array_to_vector(F.col(vec_col).cast("array<double>")))


def from_mllib_vectors(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str | None = None,
    dtype: str = "float32",
) -> DataFrame:
    """MLlib Vector column -> array<float> (dtype float32|float64)."""
    from pyspark.ml.functions import vector_to_array

    out = out_col or vec_col
    return df.withColumn(out, vector_to_array(F.col(vec_col), dtype=dtype))


def dedup_minhash_mllib(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hash_tables: int = 16,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Near-dup pairs via MLlib's MinHashLSH estimator over word-shingle
    sets: HashingTF(binary) -> MinHashLSH -> approxSimilarityJoin at
    Jaccard distance <= 1 - threshold.

    Differences from operators.dedup.dedup_minhash_lsh (the custom,
    oracle-checked form): MLlib's hash family is not portable to DuckDB,
    the reported distance is computed on the HashingTF feature space
    (collisions at num_features merge shingles), and recall is
    probabilistic in the estimator (no exact-verify pass). Use this when
    composing with an existing MLlib pipeline; use the custom operator
    when results must be exact/checkable.
    Output: (doc_a, doc_b, jaccard) ordered, like the custom operator.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from sum_spark.operators.dedup import shingle_sets

    sets = shingle_sets(df, text_col, id_col)
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=num_features, binary=True
    )
    feat = tf.transform(sets)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    model = mh.fit(feat)
    pairs = model.approxSimilarityJoin(
        feat, feat, 1.0 - float(threshold), distCol="dist"
    )
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("dist"), 4).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


def neardup_cosine_mllib(
    df: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs via BucketedRandomProjectionLSH.

    Cosine similarity maps to euclidean distance on L2-normalized
    vectors: cos(a,b) >= t  ⟺  ||â - b̂|| <= sqrt(2 - 2t). Zero vectors
    are dropped (cosine-to-anything is 0.0 by the engine's rule, so they
    can never cross a positive threshold).
    Output: (id_a, id_b, sim) ordered — comparable to
    operators.dedup.dedup_embedding_cosine (approximate recall).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer

    to_vec = to_mllib_vectors(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__arr")),
        "__arr",
        out_col="__vec",
    )
    unit = Normalizer(inputCol="__vec", outputCol="__unit", p=2.0).transform(
        to_vec.where(
            F.aggregate(
                F.col("__arr").cast("array<double>"),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            )
            > 0.0
        )
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="__unit",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = brp.fit(unit)
    max_dist = math.sqrt(max(0.0, 2.0 - 2.0 * float(threshold)))
    pairs = model.approxSimilarityJoin(unit, unit, max_dist, distCol="dist")
    sim = 1.0 - F.col("dist") * F.col("dist") / 2.0  # invert the mapping
    return (
        pairs.where(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.round(sim, 4).alias("sim"),
        )
        .orderBy("id_a", "id_b")
    )
