from sum_spark.plans.scale import bucketize_table, salted_join

__all__ = ["bucketize_table", "salted_join"]
