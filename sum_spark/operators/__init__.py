from sum_spark.operators.similarity import find_similar, knn_bruteforce, knn_ivf

__all__ = ["find_similar", "knn_bruteforce", "knn_ivf"]
