from cola_spark.functions.urls import canonicalize_url, host_of, path_of, url_hash_col

__all__ = ["canonicalize_url", "host_of", "path_of", "url_hash_col"]
